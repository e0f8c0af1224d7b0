package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X165 — functional-dependency audit: for each declared candidate
  * dependency A → B over the documents table, how badly the data
  * violates it — determinant groups observed, groups with more than
  * one dependent value, and the row mass outside each group's majority
  * value (the minimum number of rows an FD-enforcing repair would
  * touch) — classical schema profiling (the Metanome/data-profiling
  * lineage), and the complement of X149's VALUE contracts: X149
  * asserts what one COLUMN must be, X165 what one column says about
  * ANOTHER (a feed where `source` no longer determines `lang` has
  * silently merged crawls — the provenance bug a mixture build must
  * catch before weighting by source).
  *
  * The candidate list is CODE ([[Deps]] — declared contracts, like
  * X149's expectation list), so the audit is a fixed small number of
  * (A, B) aggregates; violating row mass uses the per-group majority
  * via max(count) — exact i64 throughout, one double division for the
  * rate, a boolean verdict per dependency.
  *
  * Scale shape: per dependency, one (A, B) map-side-combined count
  * aggregate (determinant×dependent-bounded), one (A) re-aggregate of
  * those CELLS (never the corpus twice — the X115 discipline), one
  * global fold to |Deps| output rows.
  *
  * Reference scope: the reference validates nothing; engine extension
  * (SURVEY §2.5, the X149/B45/X25 quality family's cross-column axis).
  */
object FdAudit {

  /** Declared candidate dependencies over documents: determinant →
    * dependent. doc_id → source must HOLD (key determines provenance);
    * source → lang is the multilingual-feed check a mixture build
    * reads (expected VIOLATED on this corpus — feeds are mixed). */
  val Deps: Seq[(String, String)] = Seq(
    "doc_id" -> "source",
    "doc_id" -> "lang",
    "source" -> "lang",
    "lang" -> "source")

  def fdAudit(spark: SparkSession, dir: String): DataFrame =
    auditOf(Tables.documents(spark, dir))

  /** Core of X165 over any documents-shaped frame; test seam. */
  private[graft] def auditOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val perDep = Deps.map { case (a, b) =>
      val cells = docs.groupBy(col(a).as("lhs"), col(b).as("rhs"))
        .agg(count(lit(1)).as("c"))
      cells.groupBy($"lhs")
        .agg(sum($"c").as("n"), count(lit(1)).as("k"),
          max($"c").as("maj"))
        .agg(
          count(lit(1)).as("n_groups"),
          sum(when($"k" > 1L, 1L).otherwise(0L)).as("n_violating_groups"),
          sum($"n" - $"maj").as("n_violating_rows"),
          sum($"n").as("n_rows"))
        .select(lit(s"$a->$b").as("dependency"),
          $"n_groups", $"n_violating_groups",
          $"n_violating_rows",
          ($"n_violating_rows".cast("double") /
            $"n_rows".cast("double")).as("violation_rate"),
          ($"n_violating_groups" === 0L).as("holds"))
    }
    perDep.reduce(_ unionByName _).orderBy($"dependency")
  }

  val fdAuditSql: String = {
    val branches = Deps.map { case (a, b) =>
      s"""  SELECT '$a->$b' AS dependency,
         |         CAST(count(*) AS BIGINT) AS n_groups,
         |         CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_violating_groups,
         |         CAST(sum(n - maj) AS BIGINT) AS n_violating_rows,
         |         CAST(sum(n - maj) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
         |           AS violation_rate,
         |         (sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) = 0) AS holds
         |  FROM (SELECT lhs, sum(c) AS n, count(*) AS k, max(c) AS maj
         |        FROM (SELECT $a AS lhs, $b AS rhs, count(*) AS c
         |              FROM documents GROUP BY 1, 2)
         |        GROUP BY lhs)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$branches
       |)
       |ORDER BY dependency""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x165_fd_audit" -> fdAudit _)

  val oracles: Map[String, String] = Map(
    "x165_fd_audit" -> fdAuditSql)
}
