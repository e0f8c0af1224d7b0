package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Text}

/** The operators composed as a real training-data curation pipeline:
  * quality-filter → exact dedup → near-dup clustering → keep canonical
  * survivors — then prove the pipeline's postcondition: re-running
  * near-dup detection over the survivors finds nothing. This is the
  * "complete library" check: the pieces snap together and their
  * composition has the semantics a data-curation user needs.
  */
class PipelineCompositionSpec extends SparkSpec {

  test("curation pipeline: survivors are unique, high-quality, and near-dup-free") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()

    // stage 1: quality floor (drop the shortest tail)
    val quality = Text.textQuality(spark, sfDir)
      .filter($"quality_score" >= 0.5).select("doc_id")
    // stage 2: exact dedup survivors
    val exact = Text.exactDedup(spark, sfDir).select("doc_id")
    // stage 3: near-dup clusters → canonical representative only
    val canonical = Dedup.dupClusters(spark, sfDir)
      .filter($"is_canonical").select("doc_id")
    val survivors = quality
      .join(exact, "doc_id")
      .join(canonical, "doc_id")
      .join(docs, "doc_id")
      .select($"doc_id", $"text", $"lang", $"source")
      .cache()

    val nSurvivors = survivors.count()
    assert(nSurvivors > 0 && nSurvivors < nDocs,
      s"pipeline must filter something: $nSurvivors of $nDocs")

    // postcondition: the survivor set contains no near-duplicate pairs
    val residualPairs = Dedup.minhashPairs(Dedup.shinglesOf(survivors))
    assert(residualPairs.isEmpty,
      s"survivors still contain near-dups: ${residualPairs.collect().toSeq}")

    // and no exact duplicates either
    assert(survivors.groupBy(sha2(lower(trim($"text")), 256))
      .count().filter($"count" > 1).isEmpty)
  }
}
