package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.InfluxLineWriter

/** The concrete R5 external-sink writer against a real local HTTP server
  * (JDK HttpServer — no network egress, no extra deps): batching, the
  * v2 write path/params, retry-on-5xx, and fail-fast-on-4xx.
  */
class InfluxWriterSpec extends AnyFunSuite {

  /** Run `f` against a one-endpoint server whose handler returns the next
    * status from `statuses` (last one repeats); records request bodies.
    */
  private def withServer(statuses: Seq[Int])(
      f: (String, CopyOnWriteArrayList[String], CopyOnWriteArrayList[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val bodies = new CopyOnWriteArrayList[String]()
    val paths = new CopyOnWriteArrayList[String]()
    val n = new AtomicInteger(0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      bodies.add(body)
      paths.add(ex.getRequestURI.toString)
      val idx = math.min(n.getAndIncrement(), statuses.size - 1)
      ex.sendResponseHeaders(statuses(idx), -1)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", bodies, paths)
    finally server.stop(0)
  }

  test("R5: batches, write path and params reach the endpoint") {
    withServer(Seq(204)) { (url, bodies, paths) =>
      val writer = new InfluxLineWriter(url, "graft org", "metrics", batchSize = 5)
      writer((1 to 12).iterator.map(i => s"m,city=b v=$i $i"))
      assert(bodies.size == 3, s"12 lines / batchSize 5 must be 3 POSTs: $bodies")
      assert(bodies.asScala.map(_.linesIterator.size).toSeq == Seq(5, 5, 2))
      assert(bodies.asScala.head.startsWith("m,city=b v=1 1"))
      paths.asScala.foreach { p =>
        assert(p.startsWith("/api/v2/write?"), p)
        assert(p.contains("org=graft+org") && p.contains("bucket=metrics")
          && p.contains("precision=ns"), p)
      }
    }
  }

  test("R5: 5xx retries with backoff until success") {
    withServer(Seq(500, 503, 204)) { (url, bodies, _) =>
      val writer = new InfluxLineWriter(url, "o", "b",
        maxRetries = 3, initialBackoffMs = 1L)
      writer(Iterator("m v=1 1")) // must not throw
      assert(bodies.size == 3, "two failures then the successful attempt")
      assert(bodies.asScala.toSet.size == 1, "same body on every retry")
    }
  }

  test("R5: retry budget exhausted surfaces the failure (no silent data loss)") {
    withServer(Seq(500)) { (url, bodies, _) =>
      val writer = new InfluxLineWriter(url, "o", "b",
        maxRetries = 2, initialBackoffMs = 1L)
      val e = intercept[java.io.IOException] { writer(Iterator("m v=1 1")) }
      assert(e.getMessage.contains("HTTP 500"))
      assert(bodies.size == 3, "initial attempt + 2 retries")
    }
  }

  test("R5: 4xx fails fast — a malformed line or bad auth never heals on retry") {
    withServer(Seq(400)) { (url, bodies, _) =>
      val writer = new InfluxLineWriter(url, "o", "b",
        maxRetries = 5, initialBackoffMs = 1L)
      intercept[java.io.IOException] { writer(Iterator("garbage")) }
      assert(bodies.size == 1, "4xx must not be retried")
    }
  }

  test("R5: the writer drives the partition-parallel sink seam end to end") {
    withServer(Seq(204)) { (url, bodies, _) =>
      // the exact hand-off Pipeline.lineProtocolSink performs per
      // partition: encoded lines → writer on the executor side
      val lines = Seq(
        graft.stream.LineProtocol.encode("weather_metrics_5m",
          Seq("location" -> "Bucharest", "window" -> "5m"),
          Seq("avg_temperature_c" -> 21.5, "avg_humidity_pct" -> 60.0),
          1700000000000000000L),
        graft.stream.LineProtocol.encode("weather_metrics_5m",
          Seq("location" -> "Bucharest", "window" -> "5m"),
          Seq("avg_temperature_c" -> null), // all-null record drops
          1700000000000000001L)).flatten
      new InfluxLineWriter(url, "o", "b")(lines.iterator)
      assert(bodies.size == 1)
      val sent = bodies.asScala.head.linesIterator.toSeq
      assert(sent.size == 1, "null-only record must have been dropped by the encoder")
      assert(sent.head.startsWith("weather_metrics_5m,location=Bucharest,window=5m "))
    }
  }
}
