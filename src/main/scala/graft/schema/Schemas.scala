package graft.schema

import org.apache.spark.sql.types._

/** Declared schemas for the engine (SURVEY.md §1).
  *
  * `weatherSchema` mirrors the reference's consumer-side StructType
  * (`/root/reference/Processing&Storing/spark_processor.py:71-119`) exactly:
  * every field nullable, `timestamp` a *string* on the wire (converted
  * downstream via to_timestamp, `spark_processor.py:126`), and the two
  * deliberate type narrowings preserved — `weather_code` and
  * `metadata.iteration` are declared DoubleType although produced as ints
  * (`weather-producer.py:213,217`): JSON numbers decode fine either way.
  */
object Schemas {

  val weatherSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType, nullable = true),
    StructField("location", StructType(Seq(
      StructField("latitude", DoubleType, nullable = true),
      StructField("longitude", DoubleType, nullable = true),
      StructField("timezone", StringType, nullable = true),
      StructField("timezone_abbreviation", StringType, nullable = true)
    )), nullable = true),
    StructField("current_conditions", StructType(Seq(
      StructField("temperature", StructType(Seq(
        StructField("value", DoubleType, nullable = true),
        StructField("unit", StringType, nullable = true),
        StructField("apparent", DoubleType, nullable = true)
      )), nullable = true),
      StructField("humidity", StructType(Seq(
        StructField("value", DoubleType, nullable = true),
        StructField("unit", StringType, nullable = true)
      )), nullable = true),
      StructField("wind", StructType(Seq(
        StructField("speed", DoubleType, nullable = true),
        StructField("direction", DoubleType, nullable = true),
        StructField("gusts", DoubleType, nullable = true),
        StructField("unit", StringType, nullable = true)
      )), nullable = true),
      StructField("precipitation", StructType(Seq(
        StructField("total", DoubleType, nullable = true),
        StructField("rain", DoubleType, nullable = true),
        StructField("showers", DoubleType, nullable = true),
        StructField("snowfall", DoubleType, nullable = true),
        StructField("unit", StringType, nullable = true)
      )), nullable = true),
      StructField("atmosphere", StructType(Seq(
        StructField("cloud_cover", DoubleType, nullable = true),
        StructField("pressure_msl", DoubleType, nullable = true),
        StructField("surface_pressure", DoubleType, nullable = true),
        StructField("unit_pressure", StringType, nullable = true)
      )), nullable = true),
      StructField("weather_code", DoubleType, nullable = true),
      StructField("is_day", BooleanType, nullable = true)
    )), nullable = true),
    StructField("metadata", StructType(Seq(
      StructField("iteration", DoubleType, nullable = true),
      StructField("last_api_update", StringType, nullable = true),
      StructField("simulation_mode", StringType, nullable = true)
    )), nullable = true)
  ))
}
