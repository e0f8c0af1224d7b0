package graft

/** The SQL surface of the native expressions: registered functions are
  * callable from spark.sql and agree with the Column API.
  */
class ExtensionsSpec extends SparkSpec {

  test("registered SQL functions match the Column API") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT md5_long40('abc') AS h,
        |       quantized_dot(array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT)),
        |                     array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d
        |""".stripMargin).collect()(0)
    // h: independently verified value in HashingSpec for 'abc'
    import spark.implicits._
    val viaColumn = Seq("abc").toDF("s")
      .select(graft.functions.Hashing.md5Long40($"s")).collect()(0).getLong(0)
    assert(r.getLong(0) == viaColumn)
    // 0.5*1.0 + (-0.25)*2.0 = 0.0 → quantized 0
    assert(r.getLong(1) == 0L)
  }

  test("array-fold SQL functions: quantized_abs_l1 / count_positive / count_in_set") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT quantized_abs_l1(array(CAST(1.5 AS FLOAT), CAST(-2.5 AS FLOAT))) AS l1,
        |       count_positive(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT),
        |                            CAST(2.0 AS FLOAT))) AS np,
        |       count_in_set(array('the', 'cat', 'a'), 'the', 'a') AS ns
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == 40000000L) // floor(1.5e7) + floor(2.5e7)
    assert(r.getInt(1) == 2)
    assert(r.getInt(2) == 2)
    // non-literal set members must be rejected with an analysis error
    // naming the function, not silently mis-planned
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT count_in_set(array('x'), lower('THE'))").collect()
    }
    assert(e.getCondition == "NON_FOLDABLE_ARGUMENT", e.getMessage)
    assert(e.getMessage.contains("count_in_set"), e.getMessage)
  }

  test("minhash_sig SQL function matches the Column API with the engine constants") {
    GraftFunctions.register(spark)
    import spark.implicits._
    import graft.ops.Dedup
    val viaSql = spark.sql(
      "SELECT minhash_sig(array(CAST(12345 AS BIGINT), CAST(67890 AS BIGINT))) AS s")
      .head().getSeq[Long](0)
    val viaColumn = Seq(Seq(12345L, 67890L)).toDF("hs")
      .select(graft.functions.Hashing.minHashSig(
        $"hs", Dedup.A.toSeq, Dedup.B.toSeq, Dedup.P))
      .head().getSeq[Long](0)
    assert(viaSql == viaColumn && viaSql.length == Dedup.nHashes)
  }

  test("wrong arity raises the standard WRONG_NUM_ARGS analysis error") {
    GraftFunctions.register(spark)
    for (sql <- Seq(
        "SELECT count_in_set()", // the args.head IndexOutOfBounds case
        "SELECT md5_long40('a', 'b')",
        "SELECT quantized_dot(array(CAST(1.0 AS FLOAT)))")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(sql).collect()
      }
      assert(e.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        s"$sql → ${e.getMessage}")
    }
  }

  test("the extensions class applies without error (config-path shape)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; used via
    // spark.sql.extensions=graft.GraftExtensions at session build
  }
}
