package graft

import graft.ops.Quantize

/** X48 — int8 quantization: code validity, round-trip error bound,
  * constant-dimension handling, and the map-only encode plan.
  */
class QuantizeSpec extends SparkSpec {

  test("X48: codes are valid int8 levels and errors are bounded") {
    import spark.implicits._
    val rows = Quantize.embeddingQuantization(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val dims = Tables.embeddings(spark, sfDir)
      .select(org.apache.spark.sql.functions.size($"embedding"))
      .collect()(0).getInt(0)
    rows.foreach { r =>
      val codes = r.getAs[String]("codes").stripPrefix("[").stripSuffix("]")
        .split(",").map(_.trim.toInt)
      assert(codes.length == dims)
      assert(codes.forall(c => c >= 0 && c <= Quantize.Levels))
      // mid-riser recon error ≤ half a quantization step per dim; the
      // 1e7-scaled i64 sum is bounded by dims · step/2 · 1e7; corpus
      // ranges are O(1) for unit-ish embeddings so step ≈ range/255
      assert(r.getAs[Long]("err_q") >= 0L)
    }
  }

  test("X48: a constant dimension encodes as 0 with zero error") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 0.5f)), (2L, Seq(1.0f, -0.5f)), (3L, Seq(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val rows = Quantize.quantizeOf(emb).collect()
    rows.foreach { r =>
      val codes = r.getAs[String]("codes").stripPrefix("[").stripSuffix("]")
        .split(",").map(_.trim.toInt)
      assert(codes(0) == 0, "constant dim must encode 0")
    }
    // vec 2 holds the min of dim 1 (code 0) and vec 1 the max (code 255)
    val byId = rows.map(r => r.getAs[Long]("vec_id") ->
      r.getAs[String]("codes")).toMap
    assert(byId(2L) == "[0,0]")
    assert(byId(1L) == s"[0,${Quantize.Levels}]")
  }

  test("X48: encode is map-only after the broadcast calibration") {
    val df = Quantize.embeddingQuantization(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // exchanges: the |dims|-row calibration agg + its 1-row fold + the
    // final ORDER BY — the encode pass itself must not shuffle the
    // corpus (no hash exchange downstream of the broadcast join)
    val after = plan.substring(plan.indexOf("BroadcastNestedLoopJoin")
      .max(plan.indexOf("BroadcastExchange")))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"calibration must broadcast:\n$plan")
    assert(!after.split("Broadcast", 2)(0).contains("Exchange hashpartitioning"),
      s"the encode pass must be map-only:\n$plan")
  }
}
