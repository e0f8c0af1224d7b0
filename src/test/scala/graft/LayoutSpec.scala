package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

/** X35 — Z-order layout: the interleave must be a bijection (decode
  * recovers both keys), and the induced physical layout must actually
  * deliver the skipping property — bounded per-partition rectangles on
  * BOTH keys — which a 1-D sort cannot.
  */
class LayoutSpec extends SparkSpec {

  test("X35: the Morton interleave is a bijection on the key domain") {
    import spark.implicits._
    val keys = for (a <- 0 to 300 by 7; b <- 0 to 300 by 11) yield (a.toLong, b.toLong)
    val rows = keys.toDF("a", "b")
      .select($"a", $"b", Layout.zvalue($"a", $"b").as("z")).collect()
    rows.foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // driver-side decode: gather even bits -> a, odd bits -> b
      var (da, db) = (0L, 0L)
      (0 until Layout.BitsPerKey).foreach { i =>
        da |= ((z >> (2 * i)) & 1L) << i
        db |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(da == a && db == b, s"z=$z decoded to ($da,$db), want ($a,$b)")
    }
    assert(rows.map(_.getLong(2)).distinct.length == keys.length, "collision")
  }

  test("X35: z-ordered partitions have bounded rectangles on both keys") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir).select($"l_partkey", $"l_suppkey")
    val parts = Layout.zorderWrite(li, "l_partkey", "l_suppkey", 8)
      .select($"l_partkey", $"l_suppkey", spark_partition_id().as("pid"))
      .groupBy($"pid")
      .agg((max($"l_partkey") - min($"l_partkey")).as("part_span"),
        (max($"l_suppkey") - min($"l_suppkey")).as("supp_span"),
        count(lit(1)).as("n"))
      .collect()
    assert(parts.length > 1)
    val global = li.agg(
      (max($"l_partkey") - min($"l_partkey")).cast("double"),
      (max($"l_suppkey") - min($"l_suppkey")).cast("double")).collect()(0)
    val (gp, gs) = (global.getDouble(0), global.getDouble(1))
    // mean normalized rectangle area across partitions: a random layout
    // scores ~1.0, a 1-D sort ~1/P on one key but ~1 on the other; the
    // z-order must shrink BOTH dimensions jointly
    val area = parts.map(r =>
      (r.getAs[Long]("part_span") / gp) * (r.getAs[Long]("supp_span") / gs))
    assert(area.sum / area.length < 0.5,
      s"z-layout rectangles too large: ${area.mkString(", ")}")
  }

  test("X35: profile plan is one narrow shuffle plus the final sort") {
    val plan = Layout.zorderLayoutProfile(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 2, s"expected bucket agg + ORDER BY, got $exchanges:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"bucket agg must have a map-side partial phase:\n$plan")
  }
}
