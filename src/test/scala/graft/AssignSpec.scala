package graft

import graft.ops.{Assign, Centroids}
import graft.functions.Hashing

/** X70 — nearest-centroid assignment: every vector gets exactly one
  * nearest label, argmin must match a driver-side exact fold over the
  * same quantized metric, and the plan must be broadcast + mergeable
  * argmin (no per-vector window over the corpus×labels stream).
  */
class AssignSpec extends SparkSpec {

  private def exactAssignments(): Map[Long, (Int, Double)] = {
    import org.apache.spark.sql.functions.col
    val raw = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[collection.Seq[Float]]("embedding")))
    def q(v: Float): Long = math.floor(v.toDouble * Centroids.Scale).toLong
    // centroids the way the op defines them: i64 sums -> double mean -> float
    val cent: Map[Int, Array[Float]] = raw.groupBy(_._2).map { case (l, rows) =>
      val dims = rows.head._3.length
      l -> Array.tabulate(dims) { d =>
        val s = rows.map(r => q(r._3(d))).sum
        (s.toDouble / rows.length / Centroids.Scale).toFloat
      }
    }
    // Hashing.dotQ semantics: Σ floor(x·y·1e15) in i64
    def dotQ(a: collection.Seq[Float], b: collection.Seq[Float]): Long =
      a.iterator.zip(b.iterator)
        .map { case (x, y) => math.floor(x.toDouble * y.toDouble * 1e15).toLong }
        .sum
    raw.map { case (id, _, v) =>
      val best = cent.toSeq.map { case (cl, c) =>
        val d = dotQ(v, v).toDouble - 2.0 * dotQ(v, c.toSeq).toDouble +
          dotQ(c.toSeq, c.toSeq).toDouble
        (d, cl)
      }.minBy(identity)
      id -> (best._2, best._1)
    }.toMap
  }

  test("X70: assignments equal a driver-side exact fold") {
    val got = Assign.centroidAssign(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        (r.getAs[Int]("nearest_label"), r.getAs[Double]("dist_q"),
          r.getAs[Boolean]("is_own"), r.getAs[Int]("label")))).toMap
    val want = exactAssignments()
    assert(got.nonEmpty && got.size == want.size)
    got.foreach { case (id, (nl, d, own, lbl)) =>
      val (wl, wd) = want(id)
      assert(nl == wl, s"vec $id nearest label")
      assert(d == wd, s"vec $id distance")
      assert(own == (lbl == wl), s"vec $id is_own flag")
    }
  }

  test("X70: partitioning cannot change the result") {
    val a = Assign.centroidAssign(spark, sfDir).collect().toSeq
    val b = {
      // repartition upstream via a shuffled read of the same table
      val df = Assign.centroidAssign(spark, sfDir)
      df.repartition(7).orderBy("vec_id").collect().toSeq
    }
    assert(a == b)
  }

  test("X70: broadcast centroids + partial-aggregable argmin plan") {
    val plan = Assign.centroidAssign(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"centroid side must broadcast:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial"),
      s"argmin must have a map-side partial phase:\n$plan")
    assert(!plan.contains("Window"),
      s"no per-vector window over the corpus×labels stream:\n$plan")
  }
}
