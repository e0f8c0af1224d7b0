package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.OracleSafe._

/** LLM-data-pipeline text operators over the `documents` table (SURVEY.md
  * §2.5: X1 exact dedup, X5 tokenize+TF, X6 tf-idf, X7 profiling, plus the
  * north-star text-analysis set: token counting, quality scoring, language
  * heuristic). The reference has no text processing at all — these are the
  * training-data-pipeline extensions mandated by BASELINE.json.
  *
  * Scale discipline:
  *  - dedup keys on a 256-bit content hash, so the shuffle key is 32 bytes
  *    regardless of document size and survivor choice is a deterministic
  *    `row_number() = 1` under an explicit order (not `dropDuplicates`,
  *    whose survivor is partition-order-dependent);
  *  - tokenization is `split`+`explode` (codegen'd generators, no UDFs);
  *  - tf-idf gets the corpus size via a broadcast 1-row aggregate — never a
  *    driver-side `.count()` stitched back into the plan;
  *  - per-document stats use array HOFs evaluated row-local (no shuffle).
  */
object Text {

  /** X1 — exact deduplication by normalized content hash: first doc_id per
    * sha256(lower(trim(text))) survives. At 100 TB this is one shuffle on
    * the 32-byte hash; the window per hash-group is tiny (dup cluster size).
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    exactDedupDocs(Tables.documents(spark, dir))

  /** Core of X1 over any (doc_id, lang, source, text) frame (test seam). */
  private[graft] def exactDedupDocs(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("text_hash")).orderBy(col("doc_id").asc)
    docs
      .withColumn("text_hash", sha2(lower(trim(col("text"))), 256))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("source"), col("text_hash"))
      .orderBy(col("doc_id"))
  }

  val exactDedupSql: String =
    """SELECT doc_id, lang, source, text_hash
      |FROM (SELECT doc_id, lang, source,
      |             sha256(lower(trim(text))) AS text_hash,
      |             row_number() OVER (PARTITION BY sha256(lower(trim(text)))
      |                                ORDER BY doc_id ASC) AS rn
      |      FROM documents)
      |WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  /** X5 — tokenize + corpus term frequencies: split/explode into words,
    * count total occurrences and document frequency per word. Map-side
    * partial aggregation keyed on the word keeps the shuffle tiny (vocab
    * rows, not token rows).
    */
  def tokenTf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", explode(split(lower($"text"), "\\s+")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word")
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct($"doc_id").as("n_docs"))
      .orderBy($"word")
  }

  val tokenTfSql: String =
    """SELECT word, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
      |FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS word
      |      FROM documents)
      |WHERE word <> ''
      |GROUP BY word
      |ORDER BY word""".stripMargin

  /** X6 — tf-idf per (document, term): tf × ln(N/df). The corpus size N
    * joins in as a broadcast 1-row aggregate, and the document-frequency
    * table joins in as a broadcast vocabulary aggregate — NOT a window
    * partitioned by word, which at corpus scale funnels each term's rows
    * through one task (terms are few and hot: the worst possible window
    * key). The doc_id repartition parallelizes the explode off the local
    * single-split scan, as in Dedup.shingles.
    */
  def tfIdf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // tf feeds three consumers (the final join, the df aggregate, the
    // corpus count) — materialize it so the tokenize+explode+agg subplan
    // runs once, not once per consumer. At cluster scale this is a
    // persisted intermediate; locally localCheckpoint is the same
    // statement of intent WITHOUT a session-lifetime InMemoryRelation
    // (checkpoint blocks are reclaimed when the frame is unreachable)
    val tf = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, $"doc_id")
      .select($"doc_id", explode(split(lower($"text"), "\\s+")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"doc_id", $"word")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfT = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    // corpus size N counts DOCUMENTS, not tokenized docs: a doc that
    // tokenizes to zero words still belongs to the corpus, and deriving N
    // from tf would silently inflate idf on such input. The scan is
    // pruned to one column and aggregates to a single row — cheap at any
    // scale, and it matches the oracle's `FROM documents` count exactly.
    val n = Tables.documents(spark, dir)
      .agg(countDistinct($"doc_id").as("n_docs_total"))
    tf
      .join(broadcast(dfT), Seq("word"))
      .crossJoin(broadcast(n))
      // ln is not guaranteed identically rounded across libm builds;
      // round(…,6) absorbs last-ULP differences (same guard as b18c)
      .withColumn("tfidf",
        round($"tf" * log($"n_docs_total".cast("double") / $"df"), 6))
      .select($"doc_id", $"word", $"tf", $"df", $"tfidf")
      .orderBy($"doc_id", $"word")
  }

  val tfIdfSql: String =
    """WITH tf AS (
      |  SELECT doc_id, word, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS word
      |        FROM documents)
      |  WHERE word <> ''
      |  GROUP BY doc_id, word),
      |n AS (SELECT count(DISTINCT doc_id) AS n_docs_total FROM documents)
      |SELECT doc_id, word, tf,
      |       count(*) OVER (PARTITION BY word) AS df,
      |       round(tf * ln(CAST(n_docs_total AS DOUBLE)
      |                     / count(*) OVER (PARTITION BY word)), 6) AS tfidf
      |FROM tf, n
      |ORDER BY doc_id, word""".stripMargin

  /** X7 — language/source profiling: doc counts and char-length stats per
    * (lang, source). `percentile` is Spark's exact interpolated percentile
    * (DuckDB: quantile_cont); the approx variant (`percentile_approx`) is
    * exercised in TextSpec where no bit-exact oracle is possible.
    */
  def langProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"lang", $"source")
      .agg(
        count(lit(1)).as("n_docs"),
        // integer sums are exact in any order; plain avg is deterministic
        avg($"n_chars").as("avg_chars"),
        min($"n_chars").as("min_chars"),
        max($"n_chars").as("max_chars"),
        expr("percentile(n_chars, 0.5)").as("median_chars"))
      .orderBy($"lang", $"source")
  }

  val langProfileSql: String =
    """SELECT lang, source, count(*) AS n_docs,
      |       avg(n_chars) AS avg_chars,
      |       min(n_chars) AS min_chars,
      |       max(n_chars) AS max_chars,
      |       quantile_cont(n_chars, 0.5) AS median_chars
      |FROM documents
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  /** X-text — per-document token counting + quality scoring + language-ID
    * heuristic, all row-local array HOFs (no shuffle; embarrassingly
    * parallel at any scale). The quality score blends length, stopword
    * ratio and mean word length; the language guess is a stopword-ratio
    * heuristic (a real n-gram profile model slots into the same shape).
    */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    qualityOf(Tables.documents(spark, dir))
      .select($"doc_id", $"n_tokens", $"n_stop", $"avg_word_len",
        $"stop_ratio", $"lang_guess", $"quality_score")
      .orderBy($"doc_id")
  }

  /** Core of X10 over any (doc_id, text) frame: the input columns plus
    * the token/quality metrics, unsorted — x22's curation pass filters on
    * `quality_score` and still needs `text` for its dedup stages.
    */
  private[graft] def qualityOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // trim-then-split yields no empty tokens (so no filter lambda), the
    // per-doc char total is a regexp_replace length, and the stopword
    // counter is the native CountInSet expression — the whole scorer
    // stays inside whole-stage codegen (the filter-lambda reference form
    // is pinned bit-equal in TextVectorSpec)
    import graft.functions.Hashing.countInSet
    val words = split(trim(lower($"text")), "\\s+")
    docs
      .repartition(spark.sparkContext.defaultParallelism, $"doc_id")
      .withColumn("words", words)
      .withColumn("n_tokens", size($"words").cast("long"))
      .withColumn("n_stop", countInSet($"words", Seq("the", "a")).cast("long"))
      .withColumn("sum_word_chars",
        length(regexp_replace(lower($"text"), "\\s+", "")).cast("long"))
      .withColumn("avg_word_len",
        $"sum_word_chars".cast("double") / $"n_tokens".cast("double"))
      .withColumn("stop_ratio",
        $"n_stop".cast("double") / $"n_tokens".cast("double"))
      .withColumn("lang_guess",
        when($"stop_ratio" > 0.12, "en_like").otherwise("other"))
      // no round(): every input is an exact binary op on identical doubles
      // in both engines, so the raw double already hash-matches — rounding
      // would *break* parity at .5 boundaries (engines round differently)
      .withColumn("quality_score",
        least(lit(1.0), $"n_tokens".cast("double") / 100.0) * 0.5
          + (lit(1.0) - $"stop_ratio") * 0.3
          + least(lit(1.0), $"avg_word_len" / 8.0) * 0.2)
      .drop("words")
  }

  /** Quality sufficient-statistics + score CTE chain ending in
    * `q_score(doc_id, n_tokens, n_stop, sum_word_chars,
    * quality_score)`; shared by the x10 and x67 oracles.
    */
  private[graft] val qualityScoreCtes: String =
    """q_t AS (
      |  SELECT doc_id, text,
      |         string_split_regex(trim(lower(text)), '\s+') AS words
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |         CAST(len(words) AS BIGINT) AS n_tokens,
      |         CAST(len(list_filter(words, w -> w = 'the' OR w = 'a')) AS BIGINT) AS n_stop,
      |         CAST(length(regexp_replace(lower(text), '\s+', '', 'g')) AS BIGINT) AS sum_word_chars
      |  FROM q_t),
      |q_score AS (
      |  SELECT doc_id, n_tokens, n_stop, sum_word_chars,
      |         least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.5
      |           + (1.0 - CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.3
      |           + least(1.0, (CAST(sum_word_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 8.0) * 0.2 AS quality_score
      |  FROM m)""".stripMargin

  val textQualitySql: String =
    s"""WITH $qualityScoreCtes
      |SELECT doc_id, n_tokens, n_stop,
      |       CAST(sum_word_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_word_len,
      |       CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
      |       CASE WHEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 0.12
      |            THEN 'en_like' ELSE 'other' END AS lang_guess,
      |       quality_score
      |FROM q_score
      |ORDER BY doc_id""".stripMargin

  /** X-tokenize — BPE-style pre-tokenization: the GPT-2-ish regex splits
    * text into letter runs / digit runs / punctuation runs, each with its
    * leading-space marker kept (` ?`) — the piece inventory a byte-pair
    * tokenizer trains over. Corpus piece frequencies, one explode + one
    * hash-agg (the same scale shape as X5).
    */
  def regexTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, $"doc_id")
      .select($"doc_id",
        explode(regexp_extract_all(lower($"text"),
          lit(" ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+"), lit(0))).as("piece"))
      .groupBy($"piece")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct($"doc_id").as("n_docs"))
      .withColumn("piece_len", length($"piece"))
      .orderBy($"piece")
  }

  val regexTokensSql: String =
    """SELECT piece, count(*) AS n_occurrences,
      |       count(DISTINCT doc_id) AS n_docs,
      |       CAST(length(piece) AS INTEGER) AS piece_len
      |FROM (SELECT doc_id,
      |             unnest(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+')) AS piece
      |      FROM documents)
      |GROUP BY piece
      |ORDER BY piece""".stripMargin

  /** X-langid — n-gram language identification: score every document
    * against a fixed character-n-gram profile per language (occurrence
    * count × integer weight, summed), pick the argmax. The profile join
    * is a broadcast cross of a literal table; occurrence counting is the
    * lambda-free (len - len(replace))/len(gram) identity, so the whole
    * scorer is codegen'd and shuffle-free until the per-doc argmax.
    * Integer weights keep scores exact (order-independent sums) for the
    * oracle. On this synthetic corpus the labels are random, so accuracy
    * is noise — the operator mechanics (profile scoring + argmax) are
    * what's under test; real profiles drop into the same table.
    */
  def langIdNgram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val profiles = Seq(
      ("en", "th", 3L), ("en", "he", 2L), ("en", "ing", 2L),
      ("de", "sch", 3L), ("de", "ei", 2L), ("de", "en ", 2L),
      ("es", "ll", 3L), ("es", "ci", 2L), ("es", "os ", 2L),
      ("fr", "ou", 3L), ("fr", "eau", 2L), ("fr", "le ", 2L),
      ("zh", "zh", 3L), ("zh", "ng", 2L), ("zh", "sh", 2L)
    ).toDF("cand_lang", "gram", "w")
    val scored = Tables.documents(spark, dir)
      .select($"doc_id", lower($"text").as("t"), $"lang")
      .crossJoin(broadcast(profiles))
      .withColumn("occ",
        (length($"t") - length(regexp_replace($"t", $"gram", lit(""))))
          / length($"gram"))
      .groupBy($"doc_id", $"lang", $"cand_lang")
      .agg(sum(($"occ" * $"w").cast("long")).as("score"))
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"score".desc, $"cand_lang".asc)
    scored
      .withColumn("rn", row_number().over(best))
      .filter($"rn" === 1)
      .select($"doc_id", $"cand_lang".as("lang_pred"), $"score",
        $"lang".as("lang_actual"),
        ($"cand_lang" === $"lang").as("is_match"))
      .orderBy($"doc_id")
  }

  val langIdNgramSql: String =
    """WITH profiles(cand_lang, gram, w) AS (
      |  VALUES ('en','th',3), ('en','he',2), ('en','ing',2),
      |         ('de','sch',3), ('de','ei',2), ('de','en ',2),
      |         ('es','ll',3), ('es','ci',2), ('es','os ',2),
      |         ('fr','ou',3), ('fr','eau',2), ('fr','le ',2),
      |         ('zh','zh',3), ('zh','ng',2), ('zh','sh',2)),
      |scored AS (
      |  SELECT doc_id, lang, cand_lang,
      |         CAST(sum(((length(t) - length(replace(t, gram, ''))) / length(gram)) * w) AS BIGINT) AS score
      |  FROM (SELECT doc_id, lower(text) AS t, lang FROM documents)
      |  CROSS JOIN profiles
      |  GROUP BY doc_id, lang, cand_lang),
      |best AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |                               ORDER BY score DESC, cand_lang ASC) AS rn
      |  FROM scored)
      |SELECT doc_id, cand_lang AS lang_pred, score,
      |       lang AS lang_actual, (cand_lang = lang) AS is_match
      |FROM best
      |WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x01_exact_dedup" -> exactDedup _,
    "x05_token_tf" -> tokenTf _,
    "x06_tfidf" -> tfIdf _,
    "x07_lang_profile" -> langProfile _,
    "x10_text_quality" -> textQuality _,
    "x15_regex_tokens" -> regexTokens _,
    "x16_langid_ngram" -> langIdNgram _)

  val oracles: Map[String, String] = Map(
    "x01_exact_dedup" -> exactDedupSql,
    "x05_token_tf" -> tokenTfSql,
    "x06_tfidf" -> tfIdfSql,
    "x07_lang_profile" -> langProfileSql,
    "x10_text_quality" -> textQualitySql,
    "x15_regex_tokens" -> regexTokensSql,
    "x16_langid_ngram" -> langIdNgramSql)
}
