package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X132 — packing capacity sweep: for each candidate context length,
  * what the X26 contiguous token layout costs — pack count, tail
  * waste, and above all the number of BOUNDARY-STRADDLING documents
  * (docs split across two packs — the rows that need cross-pack
  * attention masking or truncation downstream). X26 lays out tokens at
  * ONE capacity; the sweep is the capacity-PLANNING op that chooses it
  * (X80 batches whole docs per bucket; X132 prices the contiguous
  * alternative at every plausible context length in one pass).
  *
  * The load-bearing observation: the token offsets are
  * capacity-INDEPENDENT (a cumulative sum over doc order), so the
  * whole sweep is ONE offset layout — the X26 distributed prefix-sum
  * shape, computed once — crossed with a 4-row capacity literal table
  * and evaluated row-locally: doc d straddles capacity c iff
  * start div c ≠ (start + n_tokens − 1) div c (n_tokens ≥ 1), packs =
  * (T + c − 1) div c, tail waste = packs·c − T. Everything exact i64
  * (`div`, never `/`).
  *
  * Scale shape: identical to X26 (per-bucket windows + triangular
  * partial-offset join — no global window), plus a broadcast 4-row
  * cross join and ONE capacity-keyed aggregate with map-side partials.
  * Output is |capacities| rows.
  *
  * Reference scope: no packing in the reference; engine extension
  * (SURVEY §2.5, the X26/X73/X80 training-assembly family).
  */
object PackSweep {

  val Capacities: Seq[Long] = Seq(256L, 512L, 1024L, 2048L)

  def packingSweep(spark: SparkSession, dir: String): DataFrame =
    packingSweepOf(Tables.documents(spark, dir))

  /** Core of X132 over any (doc_id, text) frame; test seam. */
  private[graft] def packingSweepOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val layout = Packing.packingCoreOf(docs, Capacities.head)
      .select($"doc_id", $"n_tokens", $"start_offset")
    val caps = Capacities.toDF("capacity")
    layout.crossJoin(broadcast(caps))
      .select($"capacity", $"n_tokens",
        when($"n_tokens" >= 1,
          (expr("start_offset div capacity") =!=
            expr("(start_offset + n_tokens - 1) div capacity"))
            .cast("long")).otherwise(lit(0L)).as("straddles"))
      .groupBy($"capacity")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("total_tokens"),
        sum($"straddles").as("n_straddlers"))
      .select($"capacity", $"n_docs", $"total_tokens",
        expr("(total_tokens + capacity - 1) div capacity").as("n_packs"),
        (expr("(total_tokens + capacity - 1) div capacity") * $"capacity"
          - $"total_tokens").as("tail_waste"),
        $"n_straddlers")
      .orderBy($"capacity")
  }

  val packingSweepSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         len(string_split_regex(trim(lower(text)), '\\s+'))
       |           AS n_tokens
       |  FROM documents),
       |lay AS (
       |  SELECT doc_id, n_tokens,
       |         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS start_offset
       |  FROM toks),
       |caps AS (SELECT unnest(ARRAY[${Capacities.mkString(", ")}])
       |           AS capacity),
       |s AS (
       |  SELECT capacity, n_tokens,
       |         CASE WHEN n_tokens >= 1 AND
       |                   start_offset // capacity
       |                     <> (start_offset + n_tokens - 1) // capacity
       |              THEN 1 ELSE 0 END AS straddles
       |  FROM lay CROSS JOIN caps)
       |SELECT capacity, count(*) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |       CAST((sum(n_tokens) + capacity - 1) // capacity AS BIGINT)
       |         AS n_packs,
       |       CAST(((sum(n_tokens) + capacity - 1) // capacity) * capacity
       |              - sum(n_tokens) AS BIGINT) AS tail_waste,
       |       CAST(sum(straddles) AS BIGINT) AS n_straddlers
       |FROM s
       |GROUP BY capacity
       |ORDER BY capacity""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x132_packing_sweep" -> packingSweep _)

  val oracles: Map[String, String] = Map(
    "x132_packing_sweep" -> packingSweepSql)
}
