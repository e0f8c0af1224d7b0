package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.schema.Schemas

/** The weather-envelope replica — the reference's literal core capability
  * (SURVEY.md §2.2, ops R7-R17): producer-side envelope construction
  * (`/root/reference/Acquisition&Messaging/weather-producer.py:109-221` —
  * simulate, clamp, round, casts, JSON-encode, timestamp format) and
  * consumer-side decode (`Processing&Storing/spark_processor.py:123-144` —
  * cast binary→string, from_json with the declared schema, flatten 12 leaf
  * fields, to_timestamp).
  *
  * The registered query drives the full round trip over the `events` table:
  * build the wire envelope deterministically from event rows → to_json →
  * binary → string → from_json(weatherSchema) → flatten. Because
  * to_json/from_json round-trips doubles exactly (shortest-roundtrip
  * rendering), the DuckDB oracle can compute the flattened values directly
  * from the same arithmetic — every derivation below uses only exact binary
  * float ops (+, −, ×2^k, least/greatest) or a round(…,6) guard on the one
  * transcendental (sin), so both engines produce identical bits.
  *
  * Scale: entirely row-local projection work — no shuffle, no state; at
  * 100 TB this is a pure map stage fused into whole-stage codegen.
  */
object Weather {

  /** Producer replica (R12-R17): the wire envelope as one struct column.
    * Mirrors the envelope shape at `weather-producer.py:176-221`; the
    * simulated oscillation `baseline + sin(i*0.1)*osc` is
    * `weather-producer.py:109-113` with the noise term dropped for
    * determinism (SURVEY §2.2 R15 "fixed seed / drop noise").
    */
  private def envelopeJson(spark: SparkSession): Column = {
    import spark.implicits._
    // R15 — deterministic simulation; round(…,6) absorbs libm sin ULP
    // skew. The phase is BOUNDED (event_id mod 6283 ⇒ argument < 629,
    // ~100 full cycles) before the transcendental: at unbounded ids the
    // argument-reduction error of sin grows with |x| (at the 10×
    // replica's ~9·10⁸ ids it reached ~5e-9 — past the 6-decimal round
    // guard, observed as cross-engine flips in round 17), while below
    // ~10³ both engines are within 1 ulp and the guard has ~1e-15 of
    // slack. Same oscillation character, scale-safe by construction.
    val sim = round(lit(20.0) + sin(($"event_id" % 6283) * 0.1) * 5.0, 6)
    // R12 — clamp: humidity to [0,100], wind to ≥0 (weather-producer.py:168,171)
    val humidity = least(lit(100.0), greatest(lit(0.0), $"value" - 100.0))
    val windSpeed = greatest(lit(0.0), ($"value" - 150.0) * 0.5)
    val tsStr = date_format($"ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS") // R17
    val envelope = struct(
      tsStr.as("timestamp"),
      struct(
        lit(44.4274689).as("latitude"),
        lit(26.1028208).as("longitude"),
        lit("Europe/Bucharest").as("timezone"),
        lit("EET").as("timezone_abbreviation")).as("location"),
      struct(
        struct(sim.as("value"), lit("celsius").as("unit"),
          (sim + 2.5).as("apparent")).as("temperature"),
        struct(humidity.as("value"), lit("percent").as("unit")).as("humidity"),
        struct(windSpeed.as("speed"),
          ($"event_id" % 360).cast("double").as("direction"),
          (windSpeed * 1.5).as("gusts"),
          lit("km/h").as("unit")).as("wind"),
        struct(greatest(lit(0.0), $"value" * 0.25 - 20.0).as("total"),
          (greatest(lit(0.0), $"value" * 0.25 - 20.0) * 0.5).as("rain"),
          lit(0.0).as("showers"), lit(0.0).as("snowfall"),
          lit("mm").as("unit")).as("precipitation"),
        struct(least(lit(100.0), greatest(lit(0.0), $"value" * 0.5)).as("cloud_cover"),
          (lit(1000.0) + $"value" * 0.0625).as("pressure_msl"),
          (lit(1000.0) + $"value" * 0.0625 - 10.5).as("surface_pressure"),
          lit("hPa").as("unit_pressure")).as("atmosphere"),
        // R14 — wire sends ints (weather-producer.py:213-214); the declared
        // schema narrows weather_code back to double
        ($"event_id" % 100).cast("int").as("weather_code"),
        ($"event_id" % 2 === 0).as("is_day")).as("current_conditions"),
      struct(
        $"event_id".cast("int").as("iteration"),
        tsStr.as("last_api_update"),
        lit("oscillating").as("simulation_mode")).as("metadata"))
    to_json(envelope) // R16
  }

  /** Consumer replica (R7-R11): binary value → string → from_json with the
    * declared schema → 12-leaf flatten with to_timestamp. This is the exact
    * projection at `spark_processor.py:123-144` and is shared with the
    * streaming pipeline (graft.stream.Pipeline).
    */
  def flatten(df: DataFrame, jsonCol: Column): DataFrame = {
    val parsed = df.select(
      // R7 — the Kafka value arrives as binary; CAST back to string
      jsonCol.cast("binary").cast("string").as("json_str"))
      // R8 — PERMISSIVE by default: corrupt JSON yields a null struct
      .select(from_json(col("json_str"), Schemas.weatherSchema).as("data"))
    parsed.select( // R9/R11 — flatten + rename; R10 — to_timestamp
      to_timestamp(col("data.timestamp")).as("event_time"),
      col("data.location.latitude").as("lat"),
      col("data.location.longitude").as("lon"),
      col("data.current_conditions.temperature.value").as("temperature_c"),
      col("data.current_conditions.temperature.apparent").as("apparent_temperature_c"),
      col("data.current_conditions.humidity.value").as("humidity_pct"),
      col("data.current_conditions.wind.speed").as("wind_speed_kmph"),
      col("data.current_conditions.wind.gusts").as("wind_gust_kmph"),
      col("data.current_conditions.wind.direction").as("wind_direction_deg"),
      col("data.current_conditions.atmosphere.pressure_msl").as("pressure_hpa"),
      col("data.current_conditions.atmosphere.cloud_cover").as("cloud_cover_pct"),
      col("data.current_conditions.precipitation.total").as("precipitation_mm"),
      col("data.current_conditions.weather_code").as("weather_code"),
      col("data.current_conditions.is_day").as("is_day"),
      col("data.metadata.iteration").as("iteration"))
  }

  /** Producer-loop replica (entry point 2,
    * `weather-producer.py:124-235`): n wire-envelope JSON records at the
    * reference's 1 Hz cadence from a fixed epoch — fully deterministic
    * (no wall clock, no RNG; SURVEY §3.3 "deterministic DataGenerator").
    * The HTTP-fetch side of the producer (R4) is out of engine scope by
    * design; this generator stands where its output entered the system.
    * Pure `spark.range` → projection: parallel, no data dependency.
    */
  def generateWire(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n)
      .select(
        $"id".as("event_id"),
        expr("timestampadd(SECOND, id, TIMESTAMP'2026-01-01 00:00:00')").as("ts"),
        round(lit(100.0) + sin($"id" * 0.05) * 80.0, 2).as("value"))
      .select(envelopeJson(spark).as("value"))
  }

  /** R7-R17 round trip as one registered query (see object doc).
    * Repartitioned before the serde chain: the local events file is one
    * parquet split, and JSON encode+decode is the rare CPU-bound map stage
    * worth an explicit fan-out (at cluster scale the scan's natural splits
    * make this a no-op-cost round robin).
    */
  def roundTrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wire = Tables.events(spark, dir)
      // keyed on event_id, not round-robin: a keyless repartition pays
      // a defensive local sort of the single-row-group input first
      // (sortBeforeRepartition, SPARK-23207) and the deterministic key
      // removes the retry hazard that sort guards against (guide §2.5)
      .repartition(spark.sparkContext.defaultParallelism, $"event_id")
      .select(envelopeJson(spark).as("value"))
    flatten(wire, $"value")
      .withColumn("event_time", $"event_time".cast("timestamp_ntz"))
      .orderBy($"iteration")
  }

  private[graft] val roundTripSql: String =
    """WITH e AS (
      |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value,
      |         round(20.0 + sin((event_id % 6283) * 0.1) * 5.0, 6) AS sim
      |  FROM events)
      |SELECT ts AS event_time,
      |       44.4274689 AS lat,
      |       26.1028208 AS lon,
      |       sim AS temperature_c,
      |       sim + 2.5 AS apparent_temperature_c,
      |       least(100.0, greatest(0.0, value - 100.0)) AS humidity_pct,
      |       greatest(0.0, (value - 150.0) * 0.5) AS wind_speed_kmph,
      |       greatest(0.0, (value - 150.0) * 0.5) * 1.5 AS wind_gust_kmph,
      |       CAST(event_id % 360 AS DOUBLE) AS wind_direction_deg,
      |       1000.0 + value * 0.0625 AS pressure_hpa,
      |       least(100.0, greatest(0.0, value * 0.5)) AS cloud_cover_pct,
      |       greatest(0.0, value * 0.25 - 20.0) AS precipitation_mm,
      |       CAST(event_id % 100 AS DOUBLE) AS weather_code,
      |       (event_id % 2 = 0) AS is_day,
      |       CAST(event_id AS DOUBLE) AS iteration
      |FROM e
      |ORDER BY iteration""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r_weather_roundtrip" -> roundTrip _)

  val oracles: Map[String, String] = Map(
    "r_weather_roundtrip" -> roundTripSql)
}
