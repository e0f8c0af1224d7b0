package graft

import org.apache.spark.sql.functions._

import graft.ops.Weather
import graft.stream.{FakeWeatherApiClient, WeatherApiSource}

/** R4 — the HTTP acquisition seam: deterministic fake client, the
  * baseline-refresh polling loop, and the envelope hand-off into the
  * engine's parse/flatten path.
  */
class WeatherApiSpec extends SparkSpec {

  test("R4: acquisition is deterministic — two runs produce identical ticks") {
    val a = WeatherApiSource.acquire(spark, new FakeWeatherApiClient(), 150).collect()
    val b = WeatherApiSource.acquire(spark, new FakeWeatherApiClient(), 150).collect()
    assert(a.toSeq == b.toSeq, "replaying the fake client must be bit-identical")
    assert(a.length == 150)
  }

  test("R4: the polling loop refreshes baselines only when the API time advances") {
    import spark.implicits._
    // refresh every 60 fetch ticks; the loop checks every 60 emit ticks →
    // over 200 ticks the API timestamp must advance at least once and
    // stay constant within a refresh window
    val ticks = WeatherApiSource.acquire(spark, new FakeWeatherApiClient(2), 200)
    val times = ticks.select($"apiTime").distinct().collect().map(_.getLong(0)).sorted
    assert(times.length > 1, "API time never advanced — baselines never refreshed")
    // within one apiTime window, iterations are contiguous (state machine
    // holds the baseline until the next accepted fetch)
    val spans = ticks.groupBy($"apiTime")
      .agg(min($"iteration").as("lo"), max($"iteration").as("hi"),
        count(lit(1)).as("n"))
      .collect()
    spans.foreach { r =>
      assert(r.getAs[Long]("hi") - r.getAs[Long]("lo") + 1 == r.getAs[Long]("n"),
        s"non-contiguous iterations for one baseline window: $r")
    }
  }

  test("R4: acquired envelopes parse through the engine's flatten path with clamps intact") {
    import spark.implicits._
    val wire = WeatherApiSource.toWire(
      WeatherApiSource.acquire(spark, new FakeWeatherApiClient(), 120))
    val flat = Weather.flatten(wire, $"value").cache()
    assert(flat.count() == 120)
    // PERMISSIVE parse must not have nulled anything: every envelope is valid
    assert(flat.filter($"event_time".isNull || $"temperature_c".isNull).isEmpty,
      "acquired envelope failed to parse through the declared schema")
    // reference clamps survive the round trip
    assert(flat.filter($"humidity_pct" < 0 || $"humidity_pct" > 100).isEmpty)
    assert(flat.filter($"wind_speed_kmph" < 0).isEmpty)
    // iteration is the tick index (the declared schema types it double,
    // as the reference's from_json schema does)
    val iters = flat.select($"iteration").collect().map(_.getDouble(0).toInt).sorted
    assert(iters.toSeq == (0 until 120))
  }

  test("R4: envelopes report the acquired coordinates, not a hardcoded site") {
    import spark.implicits._
    val wire = WeatherApiSource.toWire(
      WeatherApiSource.acquire(spark, new FakeWeatherApiClient(), 5,
        latitude = -33.8688, longitude = 151.2093),
      timezone = "Australia/Sydney", timezoneAbbreviation = "AEST")
    val loc = wire.select(
      get_json_object($"value", "$.location.latitude").cast("double").as("lat"),
      get_json_object($"value", "$.location.longitude").cast("double").as("lon"),
      get_json_object($"value", "$.location.timezone").as("tz")).head()
    assert(loc.getDouble(0) == -33.8688 && loc.getDouble(1) == 151.2093)
    assert(loc.getString(2) == "Australia/Sydney")
  }
}
