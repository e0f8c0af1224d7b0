package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{CountMin, Hashing}

/** X45 — Count-Min sketch estimation: per-user event counts estimated
  * from ONE mergeable 32 KiB sketch of the whole event stream, next to
  * the exact counts — the mergeable-summary pattern (alongside B11's
  * HLL) for when the key space is too large to count exactly per
  * window/segment and sketches are unioned across partitions, days, or
  * clusters by plain addition.
  *
  * Scale shape: the sketch build is a single global aggregate of a
  * projected scan — map-side partial sketches merge element-wise, the
  * final merge touches Depth·W longs per partition, and the one-row
  * result broadcasts to the probe side (in-plan, no driver action).
  * The events scan runs twice (sketch + exact probe counts) — at open
  * scale that is the right trade vs caching a 100 TB stream.
  *
  * Correctness: the sketch is a deterministic function of the input
  * multiset (integer cells, commutative merges), so the DuckDB oracle
  * recomputes every estimate EXACTLY by grouping the same 40-bit key
  * hashes into the same cells — the hash gate proves the Aggregator's
  * cell arithmetic bit-for-bit, not just within tolerance.
  */
object Sketch {

  import CountMin.{A, B, P, W}

  private def cellExpr(i: Int, h: Column): Column =
    ((h * lit(A(i)) + lit(B(i))) % lit(P)) % lit(W)

  def cmsUserCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id",
        Hashing.md5Long40($"user_id".cast("string")).as("h"))
    val cms = udaf(CountMin)
    val sketch = ev.agg(cms($"h").as("sk"))
    val exact = ev.groupBy($"user_id", $"h")
      .agg(count(lit(1)).as("c_exact"))
    val ests = (0 until CountMin.Depth).map(i =>
      element_at($"sk", (lit(i * W) + cellExpr(i, $"h") + 1).cast("int")))
    exact.crossJoin(broadcast(sketch))
      .select($"user_id", $"c_exact", least(ests: _*).as("c_est"))
      .orderBy($"user_id")
  }

  val cmsUserCountsSql: String = {
    val h = Hashing.sqlMd5Long40("CAST(user_id AS VARCHAR)")
    def cell(i: Int, hx: String) = s"((($hx) * ${A(i)} + ${B(i)}) % $P) % $W"
    val cellCtes = (0 until CountMin.Depth).map(i =>
      s"""cell$i AS (
         |  SELECT ${cell(i, "h")} AS cell, CAST(sum(c_exact) AS BIGINT) AS s
         |  FROM uni GROUP BY 1)""".stripMargin).mkString(",\n")
    val joins = (0 until CountMin.Depth).map(i =>
      s"JOIN cell$i c$i ON ${cell(i, "u.h")} = c$i.cell").mkString("\n")
    val leastArgs = (0 until CountMin.Depth).map(i => s"c$i.s").mkString(", ")
    s"""WITH ev AS (
       |  SELECT user_id, $h AS h FROM events),
       |uni AS (
       |  SELECT user_id, h, count(*) AS c_exact FROM ev GROUP BY 1, 2),
       |$cellCtes
       |SELECT u.user_id, u.c_exact, least($leastArgs) AS c_est
       |FROM uni u
       |$joins
       |ORDER BY u.user_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x45_cms_counts" -> cmsUserCounts _)

  val oracles: Map[String, String] = Map(
    "x45_cms_counts" -> cmsUserCountsSql)
}
