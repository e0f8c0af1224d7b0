package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{QuantileNorm, Text}

/** X89 — source-relative quantile normalization: the hierarchical
  * bucket-offset rank must equal the direct per-source sort window
  * in-engine, and a driver-side replay; endpoint/tie semantics pinned
  * on a crafted fixture.
  */
class QuantileNormSpec extends SparkSpec {

  import spark.implicits._

  test("X89: crafted — endpoints hit 0 and 1, ties break on doc_id") {
    // one source, scores engineered so two docs tie exactly: the
    // lower doc_id must take the lower rank
    val docs = Seq(
      (1L, "s", "short"),                      // low score
      (2L, "s", Seq.fill(120)("word").mkString(" ")), // high, no stopwords
      (3L, "s", "short"),                      // exact tie with doc 1
      (4L, "s", ("the " * 60).trim))           // mid
      .toDF("doc_id", "source", "text")
    val got = QuantileNorm.sourceQuantileNormOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("src_rank"), r.getAs[Double]("pctl_q"))))
      .toMap
    assert(got(1L)._1 < got(3L)._1, "tie must break on doc_id")
    assert(got.values.map(_._1).toSet == Set(1L, 2L, 3L, 4L))
    assert(got.values.map(_._2).min == 0.0)
    assert(got.values.map(_._2).max == 1.0)
  }

  test("X89: hierarchical rank equals the direct window form in-engine") {
    val docs = Tables.documents(spark, sfDir)
    val direct = Text.qualityOf(docs)
      .select($"source", $"doc_id", $"quality_score")
      .withColumn("src_rank", row_number().over(
        Window.partitionBy($"source")
          .orderBy($"quality_score".asc, $"doc_id".asc)).cast("long"))
      .withColumn("n_src",
        count(lit(1)).over(Window.partitionBy($"source")))
      .select($"source", $"doc_id", $"quality_score", $"src_rank",
        when($"n_src" > 1, ($"src_rank" - 1).cast("double")
          / ($"n_src" - 1).cast("double")).as("pctl_q"))
      .orderBy($"source", $"doc_id")
    val a = QuantileNorm.sourceQuantileNormOf(docs).collect().toSeq
    val b = direct.collect().toSeq
    assert(a.length == b.length && a.nonEmpty)
    assert(a == b, "bucket-offset rank diverged from the direct window")
  }

  test("X89: per-source ranks are a permutation of 1..n") {
    val rows = QuantileNorm.sourceQuantileNorm(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("src_rank")))
    rows.groupBy(_._1).foreach { case (src, g) =>
      val ranks = g.map(_._2).sorted.toSeq
      assert(ranks == (1L to g.length.toLong),
        s"ranks at $src are not a permutation")
    }
  }
}
