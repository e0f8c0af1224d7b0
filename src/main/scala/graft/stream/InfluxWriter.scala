package graft.stream

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** Concrete executor-side writer for the R5 external sink: POSTs
  * line-protocol batches to an InfluxDB v2-style write endpoint
  * (`POST <endpoint>/api/v2/write?org=…&bucket=…&precision=ns`) — the
  * HTTP write the reference performs through the influxdb client on the
  * DRIVER for every micro-batch (`/root/reference/Processing&Storing/
  * spark_processor.py:194-197`). Here it is the function plugged into
  * `Pipeline.lineProtocolSink`, so each partition writes its own lines
  * from the executor it lives on: N partitions → N parallel writers, no
  * driver collect, no single-client bottleneck — the shape that holds at
  * 1000 executors.
  *
  * Design constraints, mirrored from production sink clients:
  *  - JDK `HttpURLConnection` only (the engine adds no dependencies);
  *  - the instance is Serializable and holds no live connection — each
  *    batch opens/closes its own (executors cannot share driver state);
  *  - the auth token is read from an environment variable ON THE
  *    EXECUTOR, never serialized through the closure;
  *  - bounded retry with exponential backoff on 5xx/connect errors —
  *    429/5xx are expected under load at scale; 4xx (bad request/auth)
  *    fails fast because a retry cannot fix it;
  *  - lines are batched (`batchSize` per POST) so one giant partition
  *    does not build one giant request body.
  */
final class InfluxLineWriter(
    endpoint: String,
    org: String,
    bucket: String,
    tokenEnv: String = "INFLUX_TOKEN",
    batchSize: Int = 5000,
    maxRetries: Int = 3,
    initialBackoffMs: Long = 100L)
    extends (Iterator[String] => Unit)
    with Serializable {

  private def writeUrl: String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    s"$endpoint/api/v2/write?org=${enc(org)}&bucket=${enc(bucket)}&precision=ns"
  }

  override def apply(lines: Iterator[String]): Unit =
    lines.grouped(batchSize).foreach(batch => postWithRetry(batch.mkString("\n")))

  private def postWithRetry(body: String): Unit = {
    var attempt = 0
    var backoff = initialBackoffMs
    while (true) {
      attempt += 1
      postOnce(body) match {
        case None => return // 2xx
        case Some(err) =>
          val retryable = err.retryable && attempt <= maxRetries
          if (!retryable)
            throw new IOException(
              s"influx write failed after $attempt attempt(s): ${err.detail}")
          Thread.sleep(backoff)
          backoff *= 2
      }
    }
  }

  private case class WriteError(retryable: Boolean, detail: String)

  /** One POST; None on 2xx. 5xx/429/connect errors are retryable, other
    * 4xx are not (malformed lines or bad auth never heal on retry).
    */
  private def postOnce(body: String): Option[WriteError] = {
    var conn: HttpURLConnection = null
    try {
      conn = URI.create(writeUrl).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "text/plain; charset=utf-8")
      sys.env.get(tokenEnv).filter(_.nonEmpty)
        .foreach(t => conn.setRequestProperty("Authorization", s"Token $t"))
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      conn.setFixedLengthStreamingMode(bytes.length)
      val out = conn.getOutputStream
      try out.write(bytes) finally out.close()
      val code = conn.getResponseCode
      if (code / 100 == 2) None
      else Some(WriteError(
        retryable = code == 429 || code / 100 == 5,
        detail = s"HTTP $code"))
    } catch {
      case e: IOException =>
        Some(WriteError(retryable = true, detail = e.toString))
    } finally {
      if (conn != null) conn.disconnect()
    }
  }
}
