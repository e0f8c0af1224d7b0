package graft

import graft.ops.Concentration

/** X112 — behavioral concentration: hand-computed census fixtures
  * (scripted, uniform, mixed) and an exact driver-side replay on the
  * real events.
  */
class ConcentrationSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("user_id") ->
      ((r.getAs[Long]("n_events"), r.getAs[Long]("n_types"),
        r.getAs[Long]("max_cnt"), r.getAs[Long]("coll_num"),
        r.getAs[Long]("coll_den"), r.getAs[Double]("coll_q"),
        r.getAs[Double]("maxp_q")))).toMap

  test("X112: scripted, uniform, and mixed users census exactly") {
    val events =
      (Seq.fill(4)((1L, "view")) ++                 // scripted: 1 type
        Seq((2L, "view"), (2L, "click"),
          (2L, "buy"), (2L, "share")) ++            // uniform over 4
        Seq.fill(3)((3L, "view")) :+ ((3L, "click"))) // 3+1 mix
        .toDF("user_id", "event_type")
    val out = rowsOf(Concentration.concentrationOf(events))
    // user 1: n=4, Sc2=16 → coll 16/16 = 1; maxp 1
    assert(out(1L) == ((4L, 1L, 4L, 16L, 16L, 1.0, 1.0)))
    // user 2: n=4, Sc2=4 → coll 4/16 = 0.25 (= 1/k); maxp 0.25
    assert(out(2L) == ((4L, 4L, 1L, 4L, 16L, 0.25, 0.25)))
    // user 3: n=4, Sc2=9+1=10 → 10/16; maxp 3/4
    assert(out(3L) == ((4L, 2L, 3L, 10L, 16L, 0.625, 0.75)))
  }

  test("X112: real events equal the exact integer replay") {
    val rows = Tables.events(spark, sfDir)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = rows.groupBy(_._1).view.mapValues { es =>
      val cs = es.groupBy(_._2).view.mapValues(_.size.toLong).values.toSeq
      val n = cs.sum
      val num = cs.map(c => c * c).sum
      (n, cs.size.toLong, cs.max, num, n * n,
        num.toDouble / (n * n).toDouble, cs.max.toDouble / n.toDouble)
    }.toMap
    assert(rowsOf(Concentration.typeConcentration(spark, sfDir)) == expected)
  }
}
