package graft

import org.apache.spark.sql.functions._

import graft.functions.OracleSafe._

/** Null/empty semantics of the determinism helpers — they must match the
  * built-in aggregates they replace (sum/avg/stddev_samp), or oracle
  * parity would silently diverge on sparse groups.
  */
class OracleSafeSpec extends SparkSpec {

  test("dsum/davg/dstddev null semantics match the builtins") {
    import spark.implicits._
    val df = Seq(
      ("empty_after_filter", Option.empty[Double]),
      ("all_null", None), ("all_null", None),
      ("one_value", Some(3.5)),
      ("two_values", Some(1.0)), ("two_values", Some(2.0)),
      ("with_nulls", Some(4.0)), ("with_nulls", None), ("with_nulls", Some(6.0))
    ).toDF("k", "v")
    val got = df.groupBy($"k").agg(
      dsum($"v").as("s"), davg($"v").as("a"), dstddev($"v").as("d"),
      sum($"v").as("bs"), avg($"v").as("ba"), stddev_samp($"v").as("bd"))
      .collect().map(r => r.getString(0) -> r).toMap

    for ((k, r) <- got) {
      assert(r.isNullAt(1) == r.isNullAt(4), s"$k: dsum vs sum null mismatch")
      assert(r.isNullAt(2) == r.isNullAt(5), s"$k: davg vs avg null mismatch")
      assert(r.isNullAt(3) == r.isNullAt(6), s"$k: dstddev vs stddev null mismatch")
    }
    val two = got("two_values")
    assert(two.getDouble(1) == 3.0 && two.getDouble(2) == 1.5)
    assert(math.abs(two.getDouble(3) - two.getDouble(6)) < 1e-12,
      "dstddev must agree numerically with stddev_samp")
    val wn = got("with_nulls")
    assert(wn.getDouble(2) == 5.0, "davg must ignore nulls like avg")
  }
}
