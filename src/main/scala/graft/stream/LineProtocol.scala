package graft.stream

/** InfluxDB line-protocol encoder — the reference's sink record format
  * (`/root/reference/Processing&Storing/spark_processor.py:174-190` builds
  * the same shape via the influxdb client: measurement `weather_metrics_5m`,
  * tags location/window, float fields, nanosecond timestamp).
  *
  * Pure functions (no IO) so the encoding is unit-testable and the actual
  * write happens wherever the caller wants — in this engine, from
  * executors via foreachPartition (see Pipeline.lineProtocolSink), never
  * on the driver.
  *
  * Null handling: null fields are *dropped* rather than encoded — the
  * reference crashes on them (`float(row.temperature_stddev)` raises on a
  * single-record window's null stddev, `spark_processor.py:183`; SURVEY
  * §2.3 flags it as a bug not to replicate). A record whose fields are all
  * null encodes to None.
  */
object LineProtocol {

  /** measurement: escape ',' and ' '. */
  private def escMeasurement(s: String): String =
    s.replace(",", "\\,").replace(" ", "\\ ")

  /** tag keys, tag values, field keys: escape ',', '=', ' '. */
  private def escKey(s: String): String =
    s.replace(",", "\\,").replace("=", "\\=").replace(" ", "\\ ")

  /** string field values: escape backslash and double quote, then quote. */
  private def escFieldString(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def fieldValue(v: Any): Option[String] = v match {
    case null => None
    case None => None
    case Some(x) => fieldValue(x)
    case d: Double if d.isNaN || d.isInfinite => None
    case d: Double => Some(d.toString)
    case f: Float if f.isNaN || f.isInfinite => None
    case f: Float => Some(f.toString)
    case l: Long => Some(s"${l}i")
    case i: Int => Some(s"${i}i")
    case b: Boolean => Some(b.toString)
    case s: String => Some(escFieldString(s))
    case other => Some(escFieldString(other.toString))
  }

  /** One line-protocol record, or None when no non-null fields remain. */
  def encode(
      measurement: String,
      tags: Seq[(String, String)],
      fields: Seq[(String, Any)],
      timestampNs: Long): Option[String] = {
    val fieldStr = fields.flatMap { case (k, v) =>
      fieldValue(v).map(fv => s"${escKey(k)}=$fv")
    }
    if (fieldStr.isEmpty) None
    else {
      val tagStr = tags.map { case (k, v) => s",${escKey(k)}=${escKey(v)}" }.mkString
      Some(s"${escMeasurement(measurement)}$tagStr ${fieldStr.mkString(",")} $timestampNs")
    }
  }
}
