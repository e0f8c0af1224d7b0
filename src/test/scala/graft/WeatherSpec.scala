package graft

import org.apache.spark.sql.functions._

import graft.ops.Weather

/** Weather-envelope decode edge cases (FIXTURES.md §A; SURVEY.md §5.2/5.4):
  * PERMISSIVE corrupt-JSON handling, missing-subtree nulls, round-trip
  * identity, and clamp bounds — the behaviors the reference relies on
  * implicitly but never tests.
  */
class WeatherSpec extends SparkSpec {

  private val goodEnvelope =
    """{"timestamp": "2026-08-12T10:15:30.123456",
      | "location": {"latitude": 44.4274689, "longitude": 26.1028208,
      |              "timezone": "Europe/Bucharest", "timezone_abbreviation": "EET"},
      | "current_conditions": {
      |   "temperature": {"value": 27.43, "unit": "celsius", "apparent": 29.1},
      |   "humidity": {"value": 48.2, "unit": "percent"},
      |   "wind": {"speed": 11.5, "direction": 270.0, "gusts": 19.84, "unit": "km/h"},
      |   "precipitation": {"total": 0.0, "rain": 0.0, "showers": 0.0, "snowfall": 0.0, "unit": "mm"},
      |   "atmosphere": {"cloud_cover": 25.0, "pressure_msl": 1013.2,
      |                  "surface_pressure": 1002.8, "unit_pressure": "hPa"},
      |   "weather_code": 1, "is_day": true},
      | "metadata": {"iteration": 42, "last_api_update": "2026-08-12T10:15:00",
      |              "simulation_mode": "oscillating"}}""".stripMargin.replace("\n", "")

  test("flatten decodes the reference wire envelope") {
    import spark.implicits._
    val flat = Weather.flatten(Seq(goodEnvelope).toDF("value"), $"value").collect()(0)
    assert(flat.getAs[java.sql.Timestamp]("event_time").toString == "2026-08-12 10:15:30.123456")
    assert(flat.getAs[Double]("temperature_c") == 27.43)
    assert(flat.getAs[Double]("humidity_pct") == 48.2)
    assert(flat.getAs[Double]("wind_gust_kmph") == 19.84)
    assert(flat.getAs[Double]("weather_code") == 1.0) // int on wire, double declared
    assert(flat.getAs[Boolean]("is_day"))
    assert(flat.getAs[Double]("iteration") == 42.0)
  }

  test("corrupt JSON yields an all-null row (PERMISSIVE), not a failure") {
    import spark.implicits._
    val rows = Weather.flatten(
      Seq("{not json", "", "[1,2,3]").toDF("value"), $"value").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert((0 until r.length).forall(r.isNullAt), s"expected all-null, got $r")
    }
  }

  test("missing subtree decodes to null leaves, siblings keep values") {
    import spark.implicits._
    val noWind =
      """{"timestamp": "2026-08-12T10:15:30", "current_conditions":
        | {"temperature": {"value": 20.5}}}""".stripMargin.replace("\n", "")
    val r = Weather.flatten(Seq(noWind).toDF("value"), $"value").collect()(0)
    assert(r.getAs[Double]("temperature_c") == 20.5)
    assert(r.isNullAt(r.fieldIndex("wind_speed_kmph")))
    assert(r.isNullAt(r.fieldIndex("lat")))
  }

  test("roundtrip: flatten(parse(toJson(x))) preserves every leaf (R7-R17)") {
    // the registered query at sf0.001: values must survive the JSON hop,
    // so spot-check the derivations against independently computed values
    val rows = Weather.roundTrip(spark, sfDir).collect()
    val events = Tables.events(spark, sfDir)
      .select("event_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.length == events.size)
    rows.foreach { r =>
      val id = r.getAs[Double]("iteration").toLong
      val v = events(id)
      assert(r.getAs[Double]("humidity_pct") == math.min(100.0, math.max(0.0, v - 100.0)))
      assert(r.getAs[Double]("pressure_hpa") == 1000.0 + v * 0.0625)
      assert(r.getAs[Double]("wind_direction_deg") == (id % 360).toDouble)
      assert(r.getAs[Boolean]("is_day") == (id % 2 == 0))
    }
  }

  test("generator: deterministic 1 Hz wire stream that parses back cleanly") {
    import spark.implicits._
    val wire = Weather.generateWire(spark, 100)
    val flat = Weather.flatten(wire, $"value").collect()
    assert(flat.length == 100)
    // 1 Hz cadence from the fixed epoch
    val times = flat.map(_.getAs[java.sql.Timestamp]("event_time").getTime).sorted
    assert(times.head == java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime)
    assert(times.zip(times.tail).forall { case (a, b) => b - a == 1000L })
    // no RNG, no wall clock → bit-identical across runs
    val again = Weather.flatten(Weather.generateWire(spark, 100), $"value").collect()
    assert(flat.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("clamp bounds hold over adversarial inputs (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(2000)(rnd.nextDouble() * 400 - 100) ++
      Seq(Double.MinValue, Double.MaxValue, -0.0, 0.0, 100.0, 100.0000001)
    val out = xs.toDF("v")
      .select(least(lit(100.0), greatest(lit(0.0), $"v")).as("c"))
      .collect().map(_.getDouble(0))
    assert(out.forall(c => c >= 0.0 && c <= 100.0))
  }

  test("single-record window: stddev is null and the sink must survive it") {
    import spark.implicits._
    val one = Weather.flatten(Seq(goodEnvelope).toDF("value"), $"value")
      .groupBy(window($"event_time", "5 minutes"))
      .agg(stddev_samp($"temperature_c").as("temperature_stddev"))
      .collect()(0)
    assert(one.isNullAt(one.fieldIndex("temperature_stddev")),
      "n=1 sample stddev must be null (reference crashes on this — we must not)")
  }
}
