package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** X30 — PII scrubbing: replace email addresses and dotted-quad IPs in
  * document text with typed placeholder tokens and count what was
  * removed — the standard redaction pass a training corpus goes through
  * before packing.
  *
  * Scale shape: row-local regexp work inside the scan projection — no
  * shuffle, no state, embarrassingly parallel; the regexes are
  * lookaround-free so Java (Spark) and RE2-family (oracle) engines agree
  * on every match.
  *
  * Output is (doc_id, n_emails, n_ips, n_chars_scrubbed, scrub_hash):
  * the scrubbed text itself is summarized by the engine-portable
  * `md5Long40` so the oracle compare proves the REPLACEMENT result is
  * byte-identical without shipping text through the dump. The corpus's
  * synthetic text contains no PII (zero counts end-to-end here); the
  * planted-PII behavior — every pattern form scrubbed, clean text
  * untouched — is pinned in ScrubSpec via [[scrubOf]].
  */
object Scrub {

  /** Lookaround-free, anchored-by-charclass patterns: identical
    * semantics in Java regex and RE2 (ASCII \d and \b, no backtracking
    * constructs). Kept as single-escaped literals; [[sqlQuote]] renders
    * them into DuckDB string syntax.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    scrubOf(Tables.documents(spark, dir))
      .select(col("doc_id"), col("n_emails"), col("n_ips"),
        col("n_chars_scrubbed"), col("scrub_hash"))
      .orderBy(col("doc_id"))

  private[graft] def scrubOf(docs: DataFrame): DataFrame = {
    // email first, then IP, in BOTH engines: the email replacement cannot
    // create a dotted quad ('<EMAIL>' has no digits), so the composition
    // is order-stable — but mirroring the order keeps the proof trivial
    val scrubbed =
      regexp_replace(
        regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        IpRe, "<IP>")
    docs
      .withColumn("n_emails", regexp_count(col("text"), lit(EmailRe)))
      .withColumn("n_ips", regexp_count(col("text"), lit(IpRe)))
      .withColumn("scrubbed", scrubbed)
      .withColumn("n_chars_scrubbed", length(col("scrubbed")).cast("long"))
      .withColumn("scrub_hash", Hashing.md5Long40(col("scrubbed")))
  }

  /** Render a (single-escaped) regex as a DuckDB single-quoted string. */
  private def sqlQuote(re: String): String = "'" + re.replace("'", "''") + "'"

  val piiScrubSql: String = {
    val email = sqlQuote(EmailRe)
    val ip = sqlQuote(IpRe)
    s"""WITH s AS (
       |  SELECT doc_id,
       |         CAST(len(regexp_extract_all(text, $email)) AS INT) AS n_emails,
       |         CAST(len(regexp_extract_all(text, $ip)) AS INT) AS n_ips,
       |         regexp_replace(
       |           regexp_replace(text, $email, '<EMAIL>', 'g'),
       |           $ip, '<IP>', 'g') AS scrubbed
       |  FROM documents)
       |SELECT doc_id, n_emails, n_ips,
       |       CAST(length(scrubbed) AS BIGINT) AS n_chars_scrubbed,
       |       ${Hashing.sqlMd5Long40("scrubbed")} AS scrub_hash
       |FROM s
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x30_pii_scrub" -> piiScrub _)

  val oracles: Map[String, String] = Map(
    "x30_pii_scrub" -> piiScrubSql)
}
