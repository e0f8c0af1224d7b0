package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** R4 — the HTTP weather-API acquisition source (the one §2.1 row that was
  * declared out of scope until round 4). Mirrors the reference producer's
  * acquisition stage (`/root/reference/Acquisition&Messaging/
  * weather-producer.py:82-107` fetch_new_api_data and the polling loop at
  * `:123-160`): an API client is polled on a fixed check interval, a
  * fresh observation (detected by its API timestamp advancing) refreshes
  * the oscillation baselines and the static fields, and every tick emits
  * one simulated record derived from the current baselines.
  *
  * The seam is [[WeatherApiClient]]: a production build implements it
  * with an HTTP GET against the forecast endpoint (the reference uses
  * open-meteo with a 60 s response cache and retry/backoff); this
  * container has no egress, so [[FakeWeatherApiClient]] — a
  * DETERMINISTIC FAKE — stands in, producing the same 15 "current"
  * variables the reference extracts, as pure functions of (lat, lon,
  * tick). Everything downstream of the seam is real and is what the spec
  * covers: the baseline-refresh state machine, the clamped oscillation,
  * the wire-envelope construction, and the hand-off into the engine's
  * parse/flatten path (graft.ops.Weather.flatten).
  *
  * Scale note: acquisition is inherently an edge/driver concern — the
  * reference polls ONE endpoint at 1 Hz. Distribution starts at the
  * hand-off: [[WeatherApiSource.acquire]] returns a DataFrame, and the
  * envelope/flatten stages run as ordinary parallel projections.
  */
final case class WeatherObservation(
    time: Long, // API observation epoch seconds (advances per refresh)
    temperature2m: Double,
    relativeHumidity2m: Double,
    precipitation: Double,
    weatherCode: Double,
    windSpeed10m: Double,
    windDirection10m: Double,
    windGusts10m: Double,
    apparentTemperature: Double,
    isDay: Double,
    snowfall: Double,
    showers: Double,
    rain: Double,
    cloudCover: Double,
    pressureMsl: Double,
    surfacePressure: Double)

trait WeatherApiClient {
  /** One forecast fetch for a coordinate — the reference's
    * `openmeteo.weather_api(url, params)[0].Current()` unpacked
    * (weather-producer.py:84-107).
    */
  def fetch(latitude: Double, longitude: Double): WeatherObservation
}

/** Deterministic stand-in for the HTTP client: every field is a fixed
  * function of (lat, lon, fetch count), and the observation timestamp
  * advances once every `refreshEveryFetches` calls (the reference's
  * response cache serves the same observation for ~60 s before the API
  * publishes fresh data) — reproducing the "new data iff the API time
  * moved" refresh behavior without network or wall clock.
  */
final class FakeWeatherApiClient(refreshEveryFetches: Int = 2)
    extends WeatherApiClient {
  private var calls = -1L
  private val epoch = 1767225600L // 2026-01-01T00:00:00Z, fixed
  private val refreshSec = 60L

  override def fetch(latitude: Double, longitude: Double): WeatherObservation = {
    calls += 1
    val t = epoch + (calls / math.max(refreshEveryFetches, 1)) * refreshSec
    val phase = (t % 86400L).toDouble / 86400.0 * 2.0 * math.Pi
    val seed = latitude + longitude
    WeatherObservation(
      time = t,
      temperature2m = 15.0 + 10.0 * math.sin(phase) + seed % 3.0,
      relativeHumidity2m = math.max(0.0, math.min(100.0, 60.0 + 20.0 * math.cos(phase))),
      precipitation = math.max(0.0, 2.0 * math.sin(phase * 3.0)),
      weatherCode = (t / refreshSec) % 100.0,
      windSpeed10m = 12.0 + 6.0 * math.sin(phase * 2.0),
      windDirection10m = (t / refreshSec) % 360.0,
      windGusts10m = 18.0 + 8.0 * math.sin(phase * 2.0),
      apparentTemperature = 14.0 + 10.0 * math.sin(phase),
      isDay = if (math.sin(phase) > 0) 1.0 else 0.0,
      snowfall = 0.0,
      showers = math.max(0.0, math.sin(phase * 5.0)),
      rain = math.max(0.0, 1.5 * math.sin(phase * 3.0)),
      cloudCover = math.max(0.0, math.min(100.0, 50.0 + 40.0 * math.cos(phase * 2.0))),
      pressureMsl = 1013.0 + 8.0 * math.sin(phase),
      surfacePressure = 1002.5 + 8.0 * math.sin(phase))
  }
}

object WeatherApiSource {

  /** One emitted tick of the acquisition loop: the simulated record plus
    * the baseline provenance (which API observation it derives from).
    */
  final case class Tick(
      iteration: Long,
      apiTime: Long,
      latitude: Double,
      longitude: Double,
      simulatedTemp: Double,
      simulatedHumidity: Double,
      simulatedWindSpeed: Double,
      observation: WeatherObservation)

  /** The reference's polling loop (weather-producer.py:123-172), replayed
    * deterministically for `n` ticks: fetch on every `checkEvery`-th tick,
    * refresh baselines only when the API timestamp advanced, emit one
    * oscillation-simulated record per tick (noise term dropped — SURVEY
    * §2.2 R15 — so acquisition is replayable). Runs on the driver by
    * nature (a 1 Hz single-endpoint poll); the returned DataFrame is the
    * distribution hand-off.
    */
  def acquire(
      spark: SparkSession,
      client: WeatherApiClient,
      n: Int,
      latitude: Double = 44.4274689,
      longitude: Double = 26.1028208,
      checkEvery: Int = 60): DataFrame = {
    import spark.implicits._
    var baseline = client.fetch(latitude, longitude)
    var baseTemp = baseline.temperature2m
    var baseHumidity = baseline.relativeHumidity2m
    var baseWind = baseline.windSpeed10m
    val ticks = (0 until n).map { i =>
      if (i > 0 && i % checkEvery == 0) {
        val fresh = client.fetch(latitude, longitude)
        if (fresh.time != baseline.time) { // new API data → refresh all
          baseline = fresh
          baseTemp = fresh.temperature2m
          baseHumidity = fresh.relativeHumidity2m
          baseWind = fresh.windSpeed10m
        }
      }
      // simulate_value with the noise term dropped (determinism), then the
      // reference's clamps: humidity to [0,100], wind speed to ≥ 0
      val t = baseTemp + math.sin(i * 0.1) * 0.5
      val h = math.max(0.0, math.min(100.0, baseHumidity + math.sin(i * 0.1) * 2.0))
      val w = math.max(0.0, baseWind + math.sin(i * 0.1) * 1.5)
      Tick(i.toLong, baseline.time, latitude, longitude, t, h, w, baseline)
    }
    ticks.toDF()
  }

  /** The wire envelope built from acquired ticks — the exact payload
    * shape at weather-producer.py:176-221 (same nesting, same field
    * names, same round(…,2)/round(…,0) quantization, ints for
    * weather_code, bool for is_day). Feeds graft.ops.Weather.flatten /
    * the streaming pipeline as-is.
    *
    * Coordinates come from the Tick rows (whatever acquire() was called
    * with), so a non-default acquisition reports its own location; the
    * timezone pair is a parameter (a coordinate→timezone lookup needs a
    * tz database — the reference gets it from the API response itself,
    * weather-producer.py:180-181) defaulting to the reference's site.
    */
  def toWire(
      ticks: DataFrame,
      timezone: String = "Europe/Bucharest",
      timezoneAbbreviation: String = "EET"): DataFrame = {
    val obs = (f: String) => col(s"observation.$f")
    val ts = timestamp_seconds(col("apiTime") + col("iteration"))
    val tsStr = date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    val envelope = struct(
      tsStr.as("timestamp"),
      struct(
        col("latitude"),
        col("longitude"),
        lit(timezone).as("timezone"),
        lit(timezoneAbbreviation).as("timezone_abbreviation")).as("location"),
      struct(
        struct(round(col("simulatedTemp"), 2).as("value"),
          lit("celsius").as("unit"),
          round(obs("apparentTemperature"), 2).as("apparent")).as("temperature"),
        struct(round(col("simulatedHumidity"), 2).as("value"),
          lit("percent").as("unit")).as("humidity"),
        struct(round(col("simulatedWindSpeed"), 2).as("speed"),
          round(obs("windDirection10m"), 0).as("direction"),
          round(obs("windGusts10m"), 2).as("gusts"),
          lit("km/h").as("unit")).as("wind"),
        struct(round(obs("precipitation"), 2).as("total"),
          round(obs("rain"), 2).as("rain"),
          round(obs("showers"), 2).as("showers"),
          round(obs("snowfall"), 2).as("snowfall"),
          lit("mm").as("unit")).as("precipitation"),
        struct(round(obs("cloudCover"), 0).as("cloud_cover"),
          round(obs("pressureMsl"), 2).as("pressure_msl"),
          round(obs("surfacePressure"), 2).as("surface_pressure"),
          lit("hPa").as("unit_pressure")).as("atmosphere"),
        obs("weatherCode").cast("int").as("weather_code"),
        (obs("isDay") === 1.0).as("is_day")).as("current_conditions"),
      struct(
        col("iteration").cast("int").as("iteration"),
        date_format(timestamp_seconds(col("apiTime")),
          "yyyy-MM-dd'T'HH:mm:ss").as("last_api_update"),
        lit("oscillating").as("simulation_mode")).as("metadata"))
    ticks.select(to_json(envelope).as("value"))
  }
}
