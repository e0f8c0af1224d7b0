package graft

import org.apache.spark.sql.functions._

/** Canary over the driver-generated testdata itself: absolute facts the
  * ORACLE-PARITY machinery silently depends on, pinned so a driver-side
  * regeneration that changes them fails HERE, by name, instead of as an
  * opaque hash-red three gates downstream.
  *
  * Motivated by the round-9 incident: a regen flipped `events.ts` from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS, NTZ) and the only local
  * symptom was two Resample fixture assertions — every other suite
  * recomputed from the same misread frame and stayed green. Each pin
  * below names the operators that break if it moves.
  */
class TestdataCanarySpec extends SparkSpec {

  import spark.implicits._

  test("events.ts reads as January 2024 wall-clock time (all ts ops)") {
    // a unit misread (ns vs µs) lands decades away — this is the pin
    // that would have caught the round-9 regen on day one
    val r = Tables.events(spark, sfDir)
      .agg(min($"ts").cast("date").as("lo"), max($"ts").cast("date").as("hi"))
      .collect()(0)
    assert(r.getAs[java.sql.Date]("lo").toString.startsWith("2024-01"),
      s"events.ts min ${r.get(0)} left January 2024 — timestamp " +
        "annotation/unit drift; check Tables.events against the parquet")
    assert(r.getAs[java.sql.Date]("hi").toString.startsWith("2024-01"),
      s"events.ts max ${r.get(1)} left January 2024")
  }

  test("events.value is exactly 2-decimal (x86/x90 cents, OracleSafe sums)") {
    val bad = Tables.events(spark, sfDir)
      .filter(abs($"value" * 100 - round($"value" * 100)) > lit(1e-9))
      .count()
    assert(bad == 0L,
      "events.value gained sub-cent precision — the exact-cents ops " +
        "(x86, x90) and DECIMAL(27,6) sums lose their precondition")
  }

  test("events.props values are integer-shaped JSON (b20/x08 parity)") {
    // b20 parses props as map<string,string>; the fixture invariant is
    // that every value renders as an integer in both engines
    val nonInt = Tables.events(spark, sfDir)
      .select(explode(from_json($"props",
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))))
      .filter(!$"value".rlike("^-?[0-9]+$"))
      .count()
    assert(nonInt == 0L,
      "events.props gained non-integer values — b20/x08 value " +
        "rendering diverges between Spark map parse and DuckDB json_extract")
  }

  test("documents keep the fixed 20-source space (x89 ranks, x28/x29 strata)") {
    val srcs = Tables.documents(spark, sfDir)
      .select($"source").distinct().count()
    assert(srcs == 20L,
      s"documents.source cardinality moved to $srcs — stratum-shaped " +
        "ops (x28/x29/x46/x73/x74/x89) assume the fixed source space")
  }

  test("embeddings are 64-dim with a bounded label space (vector family)") {
    val r = Tables.embeddings(spark, sfDir)
      .agg(min(size($"embedding")).as("lo"), max(size($"embedding")).as("hi"),
        countDistinct($"label").as("nl"))
      .collect()(0)
    assert(r.getAs[Int]("lo") == 64 && r.getAs[Int]("hi") == 64,
      "embedding dimensionality moved off 64 — PQ subspaces (M=8) and " +
        "every dot-product oracle fragment assume it")
    assert(r.getAs[Long]("nl") <= 32L,
      "label space exploded — x04/x87 per-label blocks assume bounded blocks")
  }

  test("key tables are non-empty at every SF the gates use") {
    // derive the SF dirs from the suite's (env-overridable) sfDir
    // instead of absolute literals: a machine with a different testdata
    // root checks whatever siblings it has rather than failing on a
    // hardcoded path (ADVICE r9)
    val root = new java.io.File(sfDir).getParentFile
    val dirs = (sfDir +: Seq("sf0.01")
        .map(n => new java.io.File(root, n).getPath))
      .distinct.filter(d => new java.io.File(d).isDirectory)
    assert(dirs.nonEmpty, s"no testdata dirs found at or beside $sfDir")
    dirs.foreach { dir =>
      assert(Tables.documents(spark, dir).limit(1).count() == 1L, s"$dir docs")
      assert(Tables.events(spark, dir).limit(1).count() == 1L, s"$dir events")
      assert(Tables.lineitem(spark, dir).limit(1).count() == 1L, s"$dir lineitem")
    }
  }
}
