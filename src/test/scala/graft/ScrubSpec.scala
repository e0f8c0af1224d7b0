package graft

import graft.ops.Scrub

/** X30 — PII scrubbing: planted emails/IPs are replaced (all occurrences,
  * all supported forms), clean text passes through byte-identical, and
  * the corpus query runs end to end.
  */
class ScrubSpec extends SparkSpec {

  private def scrub(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    Scrub.scrubOf(texts.toDF("doc_id", "text"))
      .selectExpr("doc_id", "n_emails", "n_ips", "scrubbed")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_emails"), r.getAs[Int]("n_ips"), r.getAs[String]("scrubbed"))))
      .toMap
  }

  test("X30: planted PII is scrubbed, clean text is untouched") {
    val m = scrub(Seq(
      1L -> "write to bob.smith+spam@sub.example.co or ops@x.io now",
      2L -> "server 10.0.0.1 and 192.168.255.254 are up",
      3L -> "mixed alice@example.com at 127.0.0.1 done",
      4L -> "no pii here just words and 1234 numbers",
      5L -> "not-an-ip 1.2.3 and half@way incomplete"))

    assert(m(1L) == ((2, 0, "write to <EMAIL> or <EMAIL> now")))
    assert(m(2L) == ((0, 2, "server <IP> and <IP> are up")))
    assert(m(3L) == ((1, 1, "mixed <EMAIL> at <IP> done")))
    assert(m(4L) == ((0, 0, "no pii here just words and 1234 numbers")))
    // 1.2.3 is not a dotted quad; half@way has no dotted TLD — neither
    // pattern may fire on near-misses
    assert(m(5L) == ((0, 0, "not-an-ip 1.2.3 and half@way incomplete")))
  }

  test("X30: the corpus query reports zero PII and identity hashes") {
    import org.apache.spark.sql.functions._
    // the synthetic corpus contains no PII, so scrubbing must be the
    // identity: counts zero and scrub_hash == md5Long40(text)
    val joined = Scrub.piiScrub(spark, sfDir)
      .join(Tables.documents(spark, sfDir).select(
        col("doc_id"), graft.functions.Hashing.md5Long40(col("text")).as("raw_hash"),
        length(col("text")).cast("long").as("raw_len")), "doc_id")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Int]("n_emails") == 0 && r.getAs[Int]("n_ips") == 0)
      assert(r.getAs[Long]("scrub_hash") == r.getAs[Long]("raw_hash"))
      assert(r.getAs[Long]("n_chars_scrubbed") == r.getAs[Long]("raw_len"))
    }
  }
}
