package graft

import graft.ops.Centroids

/** X36 — per-group embedding centroids: quantized sums must equal a
  * driver-side exact fold regardless of partitioning, and the plan must
  * be the mergeable partial-agg shape (never a collect_list of group
  * members).
  */
class CentroidsSpec extends SparkSpec {

  test("X36: centroids equal a driver-side exact fold") {
    import org.apache.spark.sql.functions.col
    val vecs = Tables.embeddings(spark, sfDir)
    val got = Centroids.centroidsOf(vecs, "label").collect()
      .map(r => ((r.getAs[Int]("label"), r.getAs[Long]("dim")),
        (r.getAs[Long]("n_vectors"), r.getAs[Long]("sum_q"),
          r.getAs[Double]("mean_q")))).toMap
    val raw = vecs.select(col("label"), col("embedding")).collect()
      .map(r => (r.getAs[Int]("label"),
        r.getAs[collection.Seq[Float]]("embedding")))
    assert(raw.nonEmpty && got.nonEmpty)
    raw.groupBy(_._1).foreach { case (label, rows) =>
      val dims = rows.head._2.length
      (0 until dims).foreach { d =>
        val qs = rows.map(r => math.floor(r._2(d).toDouble * Centroids.Scale).toLong)
        val (n, s, m) = got((label, d.toLong))
        assert(n == rows.length.toLong, s"label $label dim $d count")
        assert(s == qs.sum, s"label $label dim $d sum")
        assert(m == qs.sum.toDouble / rows.length, s"label $label dim $d mean")
      }
    }
  }

  test("X36: partitioning cannot change the result (i64 sums commute)") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sfDir)
    val a = Centroids.centroidsOf(vecs, "label").collect().toSeq
    val b = Centroids.centroidsOf(vecs.repartition(7), "label").collect().toSeq
    assert(a == b)
  }

  test("X36: mergeable partial-agg plan, no group-member materialization") {
    val plan = Centroids.labelCentroids(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum") || plan.contains("partial"),
      s"centroid agg must have a map-side partial phase:\n$plan")
    assert(!plan.contains("collect_list"),
      s"centroids must never materialize group members:\n$plan")
  }
}
