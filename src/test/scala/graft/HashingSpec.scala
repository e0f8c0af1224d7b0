package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.functions.Hashing._
import graft.functions.SecondMax

/** Engine-portable hashing/quantization invariants (SURVEY.md §5.4):
  * md5Long40 against an independent JVM digest, codegen'd QuantizedDot
  * against its HOF reference form, cosine self-similarity, and the
  * SecondMax Aggregator's merge algebra.
  */
class HashingSpec extends SparkSpec {

  private def md5Long40Ref(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    // little-endian bytes 8..12 — must equal DuckDB md5_number_lower % 2^40
    (0 until 5).map(i => (d(8 + i).toLong & 0xffL) << (8 * i)).sum
  }

  test("md5Long40 matches an independent digest-derived value") {
    import spark.implicits._
    val inputs = Seq("abc", "hello world shingle", "", "the fast key order",
      "ünïcødé is fine too")
    val got = inputs.toDF("s").select(md5Long40($"s").as("h"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == inputs.map(md5Long40Ref))
    assert(got.forall(h => h >= 0 && h < (1L << 40)))
  }

  test("md5Long40 (codegen expr) equals the builtin conv/substring form") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val strs = Seq.fill(200)(rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
    val df = strs.toDF("s")
      .select(md5Long40($"s").as("fast"), md5Long40Builtin($"s").as("ref"))
    assert(df.filter($"fast" =!= $"ref").count() == 0)
  }

  test("QuantizedDot (codegen) equals the HOF reference form") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vecs = Seq.fill(50)(
      (Array.fill(64)(rnd.nextFloat() - 0.5f), Array.fill(64)(rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("a", "b")
      .select(dotQ($"a", $"b").as("fast"), dotQHof($"a", $"b").as("ref"))
    assert(df.filter($"fast" =!= $"ref").count() == 0)
  }

  test("cosQ(v, v) = 1 within quantization error") {
    import spark.implicits._
    val cos = Tables.embeddings(spark, sfDir)
      .select(cosQ(
        dotQ($"embedding", $"embedding"),
        dotQ($"embedding", $"embedding"),
        dotQ($"embedding", $"embedding")).as("c"))
      .collect().map(_.getDouble(0))
    assert(cos.forall(c => math.abs(c - 1.0) < 1e-9))
  }

  test("SecondMax: reduce/merge algebra") {
    val b = Seq(1.0, 5.0, 5.0, 3.0).foldLeft(SecondMax.zero)(SecondMax.reduce)
    assert(SecondMax.finish(b).contains(3.0))
    // merge of disjoint partial buffers, any split
    val (l, r) = (Seq(9.0, 2.0), Seq(7.0, 9.0))
    val m = SecondMax.merge(
      l.foldLeft(SecondMax.zero)(SecondMax.reduce),
      r.foldLeft(SecondMax.zero)(SecondMax.reduce))
    assert(SecondMax.finish(m).contains(7.0))
    // fewer than two distinct values → None
    assert(SecondMax.finish(
      Seq(4.0, 4.0).foldLeft(SecondMax.zero)(SecondMax.reduce)).isEmpty)
    assert(SecondMax.finish(SecondMax.zero).isEmpty)
  }

  test("SecondMax as a registered UDAF over a DataFrame") {
    import spark.implicits._
    val sm = udaf(SecondMax)
    val out = Seq(("a", 1.0), ("a", 5.0), ("a", 5.0), ("a", 3.0), ("b", 2.0))
      .toDF("k", "v")
      .groupBy($"k").agg(sm($"v").as("m2"))
      .orderBy($"k")
      .collect()
    assert(out(0).getDouble(1) == 3.0)
    assert(out(1).isNullAt(1))
  }

  test("array folds: randomized parity vs lambda forms, codegen AND interpreted") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import graft.functions.Hashing._
    // 300 seeded random float arrays with null elements, NaN, ±values and
    // empties — broader input space than the fixed EventsSpec pins
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map { i =>
      val n = rnd.nextInt(8)
      val arr = (0 until n).map { _ =>
        rnd.nextInt(10) match {
          case 0 => null
          case 1 => java.lang.Float.valueOf(Float.NaN)
          case _ => java.lang.Float.valueOf((rnd.nextFloat() - 0.5f) * 4f)
        }
      }
      Row(i.toLong, arr)
    }
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("arr", ArrayType(FloatType, containsNull = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)

    def mismatches(): Long = df.select(
      countPos(col("arr")).as("a"), countPosHof(col("arr")).as("b"),
      l1Q(col("arr")).as("c"), l1QHof(col("arr")).as("d"))
      .filter(!(col("a") <=> col("b")) || !(col("c") <=> col("d")))
      .count()

    assert(mismatches() == 0, "codegen path diverges from lambda forms")
    // force interpreted projections so nullSafeEval is exercised too —
    // a doGenCode/eval divergence would otherwise hide behind codegen
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(key, "FALLBACK")
    spark.conf.set(key, "NO_CODEGEN")
    try assert(mismatches() == 0, "interpreted eval diverges from lambda forms")
    finally spark.conf.set(key, prev)
  }

  test("count_in_set: randomized parity vs lambda form over word arrays") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import graft.functions.Hashing._
    val vocab = Seq("the", "a", "cat", "sat", "mat", "", "thé")
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val n = rnd.nextInt(10)
      val arr = (0 until n).map { _ =>
        if (rnd.nextInt(10) == 0) null else vocab(rnd.nextInt(vocab.size))
      }
      Row(i.toLong, arr)
    }
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("arr", ArrayType(StringType, containsNull = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val stop = Seq("the", "a", "")
    val bad = df.select(
      countInSet(col("arr"), stop).as("a"),
      countInSetHof(col("arr"), stop).as("b"))
      .filter(!(col("a") <=> col("b")))
    assert(bad.isEmpty)
  }
}
