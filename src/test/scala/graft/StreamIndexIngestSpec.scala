package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.LloydIvfPq
import graft.stream.StreamIndexIngest

/** X180 — streaming index ingestion: re-encoding the corpus through the
  * frozen artifact reproduces the trained index's own encoded table
  * bit-equal across a micro-batch boundary with ZERO state rows, and a
  * genuinely new vector lands on its batch-E-step argmin.
  */
class StreamIndexIngestSpec extends SparkSpec {

  import spark.implicits._

  test("X180: streamed encode of the corpus equals the trained index's " +
    "encoded table bit-equal; zero state rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = LloydIvfPq.ivfPqIndex(spark, sfDir)
    val centRow = StreamIndexIngest.centroidRow(idx.centroids).cache()
    val cbRow = StreamIndexIngest.codebookFlatRow(idx.codebooks).cache()
    centRow.count(); cbRow.count()

    val vecs = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val (first, second) = vecs.splitAt(vecs.length / 2)

    val input = MemoryStream[(Long, Seq[Float])]
    val query = StreamIndexIngest.encodeArrivals(
        input.toDF().toDF("vec_id", "embedding")
          .select($"vec_id", $"embedding".cast("array<float>")
            .as("embedding")),
        centRow, cbRow)
      .select($"vec_id", $"cell", $"codes")
      .writeStream.format("memory").queryName("x180_ingest")
      .outputMode("append").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()

      val streamed = spark.table("x180_ingest")
        .collect().map(_.toString).sorted.toSeq
      val stored = idx.encoded.select($"vec_id", $"cell", $"codes")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == stored,
        "the build's final assignment is the argmin fixpoint of its " +
          "final parameter tables — the frozen-artifact encoder must " +
          "reproduce it exactly")

      val stateRows = query.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(stateRows == 0L,
        s"ingestion is stateless by construction, got $stateRows")
    } finally query.stop()
  }

  test("X180: a new vector (absent from training) encodes to the batch " +
    "E-step argmin against the frozen tables") {
    val idx = LloydIvfPq.ivfPqIndex(spark, sfDir)
    val centRow = StreamIndexIngest.centroidRow(idx.centroids)
    val cbRow = StreamIndexIngest.codebookFlatRow(idx.codebooks)
    // a deterministic arrival nowhere near the corpus ids
    val nv = (0 until 64).map(d => ((d * 37 % 19) - 9) / 10.0f).toArray
    val arrival = Seq((999999L, nv)).toDF("vec_id", "embedding")
    val got = StreamIndexIngest.encodeArrivals(arrival, centRow, cbRow)
      .collect().head
    // batch replay: coarse argmin over the centroid table
    val e = arrival.select($"vec_id", $"embedding",
      graft.functions.Hashing.dotQ($"embedding", $"embedding").as("nq"))
    val coarse = e.crossJoin(broadcast(idx.centroids))
      .select($"c_cell", ($"nq"
        - lit(2.0) * graft.functions.Hashing.dotQ($"embedding", $"c")
        + graft.functions.Hashing.dotQ($"c", $"c")).as("dist_q"))
      .orderBy($"dist_q".asc, $"c_cell".asc).limit(1)
      .collect().head.getLong(0)
    assert(got.getAs[Long]("cell") == coarse,
      "streamed coarse assignment must equal the batch argmin")
    // and the codes must be argmins of the frozen codebooks against
    // the residual of THAT cell (the LloydIvfPqSpec fixpoint shape)
    val codes = got.getSeq[Long](got.fieldIndex("codes"))
    assert(codes.length == LloydIvfPq.M)
    assert(codes.forall(c => c >= 0 && c < LloydIvfPq.K))
  }

  test("X180: encoded arrivals share the persisted encoded table's " +
    "exact column ORDER (one schema layout for positional consumers)") {
    val idx = LloydIvfPq.ivfPqIndex(spark, sfDir)
    val centRow = StreamIndexIngest.centroidRow(idx.centroids)
    val cbRow = StreamIndexIngest.codebookFlatRow(idx.codebooks)
    val arrival = Seq((999999L, Array.fill(64)(0.1f)))
      .toDF("vec_id", "embedding")
    assert(StreamIndexIngest.encodeArrivals(arrival, centRow, cbRow)
      .columns.toSeq == idx.encoded.columns.toSeq,
      "appended files must bind identically by position, not just name")
  }

  test("X180: the parameter rows are one bounded row each") {
    val idx = LloydIvfPq.ivfPqIndex(spark, sfDir)
    val centRow = StreamIndexIngest.centroidRow(idx.centroids)
    val cbRow = StreamIndexIngest.codebookFlatRow(idx.codebooks)
    assert(centRow.count() == 1L && cbRow.count() == 1L)
    assert(centRow.select(size($"cents")).head.getInt(0) <= 10)
    assert(cbRow.select(size($"keys")).head.getInt(0) <=
      LloydIvfPq.M * LloydIvfPq.K)
    assert(cbRow.select(size($"qcs")).head.getInt(0) <=
      LloydIvfPq.M * LloydIvfPq.K * LloydIvfPq.Sub)
  }

  test("X180: the alias-following writer re-resolves the SERVING alias " +
    "per micro-batch — a flip between triggers redirects arrivals to " +
    "the new version's root AND its parameter tables; the straddling " +
    "batch encodes wholly against the version at batch start") {
    import graft.ops.{IndexAlias, IndexStore}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val built = LloydIvfPq.ivfPqIndex(spark, sfDir)
    val base = "target/stream_index_ingest_spec/alias_" +
      java.util.UUID.randomUUID().toString.take(8)
    val v1 = s"$base/v1"
    val v2 = s"$base/v2"
    IndexStore.writeIvfPq(built, v1)
    // v2: the same index with every cell RELABELED +1000 — a genuinely
    // different coarse table, so WHICH parameter tables encoded a batch
    // is visible in the landed inverted-list directory names
    IndexStore.writeIvfPq(built.copy(
      encoded = built.encoded.withColumn("cell", $"cell" + 1000L),
      centroids = built.centroids.withColumn("c_cell", $"c_cell" + 1000L)),
      v2)
    val aliasP = java.nio.file.Paths.get(s"$base/serving.alias")
    IndexAlias.writeAlias(aliasP, IndexAlias.Serving("v1", v1))

    val nv = (0 until 64).map(d => ((d * 31 % 17) - 8) / 10.0f)
    val input = MemoryStream[(Long, Seq[Float])]
    val query = input.toDF().toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .writeStream.outputMode("append")
      .foreachBatch(StreamIndexIngest.aliasFollowingBatchWriter(aliasP))
      .start()
    try {
      input.addData(Seq((555550L, nv)))
      query.processAllAvailable()
      val b1 = spark.read.parquet(s"$v1/encoded")
        .filter($"vec_id" === 555550L)
        .select($"cell".cast("long")).collect().map(_.getLong(0)).toSeq
      assert(b1.length == 1 && b1.head < 1000L,
        s"the pre-flip batch must land in v1's lists under v1's coarse " +
          s"labels, got $b1")

      // the cutover, between triggers
      IndexAlias.writeAlias(aliasP, IndexAlias.Serving("v2", v2))

      input.addData(Seq((555551L, nv)))
      query.processAllAvailable()
      val b2 = spark.read.parquet(s"$v2/encoded")
        .filter($"vec_id" === 555551L)
        .select($"cell".cast("long")).collect().map(_.getLong(0)).toSeq
      assert(b2.length == 1 && b2.head >= 1000L,
        s"the post-flip batch must land in v2's lists under v2's " +
          s"relabeled coarse cells, got $b2")
      assert(spark.read.parquet(s"$v1/encoded")
        .filter($"vec_id" === 555551L).isEmpty,
        "the retired version must receive nothing after the flip")
      assert(spark.read.parquet(s"$v2/encoded")
        .filter($"vec_id" === 555550L).isEmpty,
        "the flip must not retroactively move pre-flip arrivals")
    } finally query.stop()
  }

  test("X180: the native PqEncode path equals the HOF reference form " +
    "bit-for-bit on the corpus") {
    val idx = LloydIvfPq.ivfPqIndex(spark, sfDir)
    val centRow = StreamIndexIngest.centroidRow(idx.centroids)
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
    val native = StreamIndexIngest.encodeArrivals(vecs, centRow,
        StreamIndexIngest.codebookFlatRow(idx.codebooks))
      .collect().map(_.toString).sorted.toSeq
    val hof = StreamIndexIngest.encodeArrivalsHof(vecs, centRow,
        StreamIndexIngest.codebookRow(idx.codebooks))
      .collect().map(_.toString).sorted.toSeq
    assert(native == hof,
      "one argmin, two evaluation strategies — codegen and interpreted " +
        "lambdas must agree bit-for-bit")
    // force interpreted projections so PqEncode.nullSafeEval is
    // exercised too (the HashingSpec discipline — a doGenCode/eval
    // divergence would otherwise hide behind codegen)
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(key, "FALLBACK")
    spark.conf.set(key, "NO_CODEGEN")
    try {
      val interp = StreamIndexIngest.encodeArrivals(vecs, centRow,
          StreamIndexIngest.codebookFlatRow(idx.codebooks))
        .collect().map(_.toString).sorted.toSeq
      assert(interp == hof, "interpreted eval diverges from the lambda form")
    } finally spark.conf.set(key, prev)
  }
}
