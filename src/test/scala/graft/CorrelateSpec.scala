package graft

import graft.ops.Correlate

/** X76 — pairwise activity correlation: must equal a driver-side exact
  * i64 moment replay over the DENSE zero-filled hour grid, every pair
  * must see the same full grid, and the plan must collapse the fact
  * stream before the pair join.
  */
class CorrelateSpec extends SparkSpec {

  private def replay(): (Long, Map[(String, String), Option[Double]]) = {
    import org.apache.spark.sql.functions.{col, expr}
    val raw = Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts) div 3600000000").as("hr"),
        col("event_type")).collect()
      .map(r => (r.getAs[Long]("hr"), r.getAs[String]("event_type")))
    val h0 = raw.map(_._1).min
    val h1 = raw.map(_._1).max
    val grid = (h0 to h1).toSeq
    val types = raw.map(_._2).distinct.sorted
    val counts = raw.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val series = types.map(t =>
      t -> grid.map(h => counts.getOrElse((h, t), 0L))).toMap
    val rs = (for {
      a <- types; b <- types if a < b
    } yield {
      val (xs, ys) = (series(a), series(b))
      val n = grid.length.toLong
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val sxx = xs.map(x => x * x).sum
      val syy = ys.map(y => y * y).sum
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      val r = if (vx == 0L || vy == 0L) None
        else Some((n * sxy - sx * sy).toDouble
          / (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble)))
      (a, b) -> r
    }).toMap
    (grid.length.toLong, rs)
  }

  test("X76: r equals an exact i64 moment replay on the dense grid") {
    val (nHours, want) = replay()
    val got = Correlate.typeCorrelation(spark, sfDir).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        (r.getAs[Long]("n_hours"),
          if (r.isNullAt(r.fieldIndex("r"))) None
          else Some(r.getAs[Double]("r")))).toMap
    assert(got.nonEmpty && got.keySet == want.keySet)
    want.foreach { case (pair, r) =>
      val (n, gr) = got(pair)
      assert(n == nHours, s"$pair must see the full dense grid")
      // exact i64 moments + correctly-rounded sqrt → bit-equality
      assert(gr == r, s"$pair correlation")
    }
  }

  test("X76: correlations are bounded and symmetric-complete") {
    val rows = Correlate.typeCorrelation(spark, sfDir).collect()
    val types = rows.flatMap(r => Seq(r.getAs[String]("type_a"),
      r.getAs[String]("type_b"))).distinct
    assert(rows.length == types.length * (types.length - 1) / 2,
      "one row per unordered type pair")
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("r"))) {
        val v = r.getAs[Double]("r")
        assert(v >= -1.0 && v <= 1.0, s"r out of range: $v")
      }
    }
  }

  test("X76: fact stream collapses before the pair join; no window") {
    val plan = Correlate.typeCorrelation(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"hourly counts must partial-aggregate map-side:\n$plan")
  }
}
