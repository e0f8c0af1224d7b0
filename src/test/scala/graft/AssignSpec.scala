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

  test("X71: Lloyd step equals a driver-side fold of E-step + M-step") {
    import org.apache.spark.sql.functions.col
    val raw = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[collection.Seq[Float]]("embedding")))
    def q(v: Float): Long = math.floor(v.toDouble * Centroids.Scale).toLong
    def dotQ(a: collection.Seq[Float], b: collection.Seq[Float]): Long =
      a.iterator.zip(b.iterator)
        .map { case (x, y) => math.floor(x.toDouble * y.toDouble * 1e15).toLong }
        .sum
    def qsums(rows: Seq[collection.Seq[Float]]): Array[(Long, Long)] = {
      val dims = rows.head.length
      Array.tabulate(dims)(d => (rows.length.toLong, rows.map(v => q(v(d))).sum))
    }
    val oldSums = raw.toSeq.groupBy(_._2).map { case (l, rs) => l -> qsums(rs.map(_._3)) }
    val cent = oldSums.map { case (l, ns) =>
      l -> ns.map { case (n, s) => (s.toDouble / n / Centroids.Scale).toFloat }
    }
    val assigned = raw.map { case (id, lbl, v) =>
      val (_, best) = cent.toSeq.map { case (cl, c) =>
        (dotQ(v, v).toDouble - 2.0 * dotQ(v, c.toSeq).toDouble +
          dotQ(c.toSeq, c.toSeq).toDouble, cl)
      }.minBy(identity)
      (id, lbl, best, v)
    }
    def fp(n: Long, s: Long): Long = math.floor(s.toDouble / n).toLong
    val newSums = assigned.toSeq.groupBy(_._3)
      .map { case (l, rs) => l -> qsums(rs.map(_._4)) }
    val got = Assign.kmeansStep(spark, sfDir).collect()
      .map(r => r.getAs[Int]("c_label") ->
        (r.getAs[Long]("n_before"), r.getAs[Long]("n_assigned"),
          r.getAs[Long]("n_gained"),
          if (r.isNullAt(r.fieldIndex("shift_l1q"))) None
          else Some(r.getAs[Long]("shift_l1q")))).toMap
    assert(got.keySet == oldSums.keySet)
    oldSums.foreach { case (l, os) =>
      val members = assigned.filter(_._3 == l)
      val (nb, na, ng, sh) = got(l)
      assert(nb == raw.count(_._2 == l).toLong, s"label $l n_before")
      assert(na == members.length.toLong, s"label $l n_assigned")
      assert(ng == members.count(_._2 != l).toLong, s"label $l n_gained")
      val want = newSums.get(l).map { ns =>
        os.indices.map(d =>
          math.abs(fp(ns(d)._1, ns(d)._2) - fp(os(d)._1, os(d)._2))).sum
      }
      assert(sh == want, s"label $l shift")
    }
  }

  test("X71: conservation — assignments repartition the corpus") {
    import org.apache.spark.sql.functions.sum
    val step = Assign.kmeansStep(spark, sfDir)
    val r = step.agg(sum("n_before"), sum("n_assigned")).collect()(0)
    assert(r.getLong(0) == r.getLong(1),
      "every vector must land in exactly one cluster")
  }

  test("X71: broadcast E-step, no Window, mergeable M-step plan") {
    val plan = Assign.kmeansStep(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"centroid side must broadcast:\n$plan")
    assert(!plan.contains("Window"),
      s"argmin must be the struct-min aggregate, not a window:\n$plan")
  }
}
