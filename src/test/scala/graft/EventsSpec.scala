package graft

import org.apache.spark.sql.functions._

import graft.ops.Events

/** Events-table operator semantics the oracle can't see: the
  * pivot↔unpivot round trip and session/window shape checks.
  */
class EventsSpec extends SparkSpec {

  test("B27: unpivot(pivot(x)) recovers the long-form counts") {
    import spark.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wide = Events.pivotEventCounts(spark, sfDir)
    val long = wide.unpivot(
      Array($"user_id"), types.map(col).toArray, "event_type", "n")
      .filter($"n" > 0) // zero-fill rows have no long-form counterpart
    val expected = Tables.events(spark, sfDir)
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
    assert(long.select("user_id", "event_type", "n")
      .exceptAll(expected).isEmpty)
    assert(expected.exceptAll(
      long.select("user_id", "event_type", "n")).isEmpty)
  }

  test("X9 and B22 agree on session boundaries (gap form vs session_window)") {
    val x9 = Events.sessionize(spark, sfDir)
      .select("user_id", "session_start", "n_events")
    val b22 = Events.sessionWindow(spark, sfDir)
      .select("user_id", "session_start", "n_events")
    assert(x9.exceptAll(b22).isEmpty && b22.exceptAll(x9).isEmpty,
      "lag+cumsum islands and session_window must produce identical sessions")
  }

  test("B19: countPos/l1Q native expressions are bit-equal to the lambda forms on the corpus") {
    import spark.implicits._
    import graft.functions.Hashing._
    val mismatches = Tables.embeddings(spark, sfDir)
      .select(
        countPos($"embedding").as("np_native"),
        countPosHof($"embedding").as("np_lambda"),
        l1Q($"embedding").as("l1_native"),
        l1QHof($"embedding").as("l1_lambda"))
      .filter($"np_native" =!= $"np_lambda" || $"l1_native" =!= $"l1_lambda")
    assert(mismatches.isEmpty,
      "native array folds must match the HOF lambda reference forms bit-for-bit")
  }

  test("B19: countPos/l1Q edge cases — null element, NaN, empty array, null array") {
    import spark.implicits._
    import graft.functions.Hashing._
    def row(arr: org.apache.spark.sql.Column) =
      spark.range(1).select(arr.as("a"))
        .select(
          countPos($"a").as("np"), countPosHof($"a").as("nph"),
          l1Q($"a").as("l1"), l1QHof($"a").as("l1h"))
        .head()

    // null element: both forms skip it (filter drops non-true; l1QHof coalesces)
    val withNull = row(array(lit(1.5f), lit(null).cast("float"), lit(-2.5f)))
    assert(withNull.getInt(0) === 1 && withNull.getInt(1) === 1)
    assert(withNull.getLong(2) === 40000000L && withNull.getLong(3) === 40000000L)
    // ...while the PLAIN aggregate fold nulls the whole total (documented divergence)
    val plain = spark.range(1)
      .select(aggregate(array(lit(1.5f), lit(null).cast("float")), lit(0L),
        (acc, x) => acc + floor(abs(x.cast("double")) * lit(1e7)).cast("long")).as("v"))
      .head()
    assert(plain.isNullAt(0), "plain aggregate fold must propagate a null element")

    // NaN: Spark SQL float ordering puts NaN above 0 — counted as positive
    val withNaN = row(array(lit(Float.NaN), lit(-1.0f), lit(2.0f)))
    assert(withNaN.getInt(0) === 2 && withNaN.getInt(1) === 2,
      "NaN must count as positive in BOTH the native and lambda forms")
    assert(withNaN.getLong(2) === withNaN.getLong(3))

    // empty array → 0; null array → null
    val empty = row(array().cast("array<float>"))
    assert(empty.getInt(0) === 0 && empty.getLong(2) === 0L)
    val nullArr = row(lit(null).cast("array<float>"))
    assert(nullArr.isNullAt(0) && nullArr.isNullAt(2))
  }

  test("X8: get_json_object path extraction equals the parsed-map lookup") {
    import spark.implicits._
    import org.apache.spark.sql.types.{IntegerType, MapType, StringType}
    val diff = Tables.events(spark, sfDir)
      .withColumn("pm", from_json($"props", MapType(StringType, IntegerType)))
      .select(
        get_json_object($"props", "$.k").cast("int").as("via_path"),
        element_at($"pm", "k").as("via_map"))
      .filter(!($"via_path" <=> $"via_map"))
    assert(diff.isEmpty,
      "path extraction and the single-parse map lookup must agree on every row")
  }

  test("X8 precondition: every props value is strictly map<string,int>-shaped") {
    import spark.implicits._
    import org.apache.spark.sql.types.{IntegerType, MapType, StringType}
    // propsDecode's single-parse plan diverges from the per-path oracle
    // only if a props object fails the strict map<string,int> parse
    // (PERMISSIVE nulls the whole map) — pin that no corpus row does
    val broken = Tables.events(spark, sfDir)
      .withColumn("pm", from_json($"props", MapType(StringType, IntegerType)))
      .filter($"props".isNotNull && $"pm".isNull)
    assert(broken.isEmpty,
      "a props value failed the strict map<string,int> parse — the " +
        "single-parse plan would null n_keys/keys_csv where the oracle would not")
  }

  test("B20: single-parse form equals the three-parse original " +
    "(get_json_object / json_tuple parity on the corpus)") {
    import spark.implicits._
    import org.apache.spark.sql.types.{MapType, StringType}
    // round-18 optimization replaced get_json_object + json_tuple with
    // element_at on the one parsed map (one Jackson parse per row, no
    // Generate node); pin bit-equality against the original three-parse
    // plan on the full events fixture
    val original = Tables.events(spark, sfDir)
      .withColumn("pm", from_json($"props", MapType(StringType, StringType)))
      .select(
        $"event_id",
        get_json_object($"props", "$.k").as("k_get"),
        json_tuple($"props", "k"),
        array_join(map_values($"pm"), ",").as("values_csv"),
        element_at(map_values($"pm"), 1).as("first_value"),
        map_contains_key($"pm", "k").as("has_k"))
      .withColumnRenamed("c0", "k_tuple")
    val got = Events.mapJsonFunctions(spark, sfDir)
    assert(got.schema.map(f => (f.name, f.dataType)) ==
      original.schema.map(f => (f.name, f.dataType)))
    assert(got.exceptAll(original).isEmpty &&
      original.exceptAll(got).isEmpty)
  }
}
