package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.stream.LineProtocol

/** Pure-function coverage of the sink encoder: escaping, typed field
  * rendering, and the null-dropping that fixes the reference's
  * float(None) crash (spark_processor.py:183).
  */
class LineProtocolSpec extends AnyFunSuite {

  test("basic record") {
    val line = LineProtocol.encode(
      "weather_metrics_5m",
      Seq("location" -> "Bucharest", "window" -> "5m"),
      Seq("avg_temperature_c" -> 27.43, "n" -> 3L, "ok" -> true),
      1754993730000000000L)
    assert(line.contains(
      "weather_metrics_5m,location=Bucharest,window=5m " +
        "avg_temperature_c=27.43,n=3i,ok=true 1754993730000000000"))
  }

  test("null fields are dropped, not crashed on") {
    val line = LineProtocol.encode(
      "m", Seq("t" -> "v"),
      Seq("stddev" -> null, "avg" -> 1.5, "nan" -> Double.NaN),
      42L)
    assert(line.contains("m,t=v avg=1.5 42"))
  }

  test("all-null fields → no record") {
    assert(LineProtocol.encode("m", Seq("t" -> "v"),
      Seq("a" -> null, "b" -> None), 1L).isEmpty)
  }

  test("escaping: spaces/commas/equals in names and tags; quotes in strings") {
    val line = LineProtocol.encode(
      "my metric,v2",
      Seq("city name" -> "a=b,c"),
      Seq("note field" -> """say "hi" \now"""),
      7L).get
    assert(line == """my\ metric\,v2,city\ name=a\=b\,c note\ field="say \"hi\" \\now" 7""")
  }
}
