package graft

import graft.ops.Entropy

/** X164 — user entropy: a single-type user is exactly 0, k uniform
  * types read ln(k), skew reads strictly below uniform, corpus values
  * respect the [0, ln(n_types)] bounds, and the profile is
  * partition-invariant.
  */
class EntropySpec extends SparkSpec {

  import spark.implicits._

  private def frame(rows: Seq[(Long, String)]) =
    rows.toDF("user_id", "event_type")

  test("X164: a single-type user is exactly zero") {
    val r = Entropy.entropyOf(
      frame(Seq.fill(40)((1L, "click")))).collect()(0)
    assert(r.getAs[Long]("n_types") == 1L)
    assert(r.getAs[Double]("entropy_nats") == 0.0)
  }

  test("X164: k uniform types read ln(k); skew reads strictly less") {
    val uniform = (0 until 400).map(i => (1L, s"t${i % 8}"))
    val skewed = (0 until 350).map(_ => (2L, "t0")) ++
      (0 until 50).map(i => (2L, s"t${1 + i % 7}"))
    val out = Entropy.entropyOf(frame(uniform ++ skewed)).collect()
      .map(r => r.getLong(0) -> r).toMap
    val hU = out(1L).getAs[Double]("entropy_nats")
    assert(math.abs(hU - math.log(8.0)) < 1e-6,
      s"8 uniform types must read ln 8, got $hU")
    val hS = out(2L).getAs[Double]("entropy_nats")
    assert(hS < hU - 0.5,
      s"heavy skew ($hS) must sit well below uniform ($hU)")
    assert(out(2L).getAs[Long]("n_types") == 8L)
  }

  test("X164: corpus entropies respect the [0, ln(n_types)] bounds") {
    val out = Entropy.userEntropy(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val h = r.getAs[Double]("entropy_nats")
      val k = r.getAs[Long]("n_types")
      assert(h >= 0.0)
      assert(h <= math.log(k.toDouble) + 1e-6,
        s"user ${r.get(0)}: H=$h over ln($k)")
    }
  }

  test("X164: partition-count invariance") {
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type")
    val one = Entropy.entropyOf(ev).collect().map(_.toString).toSeq
    val many = Entropy.entropyOf(ev.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
