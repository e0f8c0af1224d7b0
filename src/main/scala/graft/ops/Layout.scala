package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X35 — Z-order (Morton) layout: interleave the bits of two filter
  * keys into one clustering value so that sorting by it co-locates rows
  * that are close in BOTH dimensions. This is the data-layout operator
  * behind multi-dimensional data skipping: files written in z-value
  * ranges have bounded min/max rectangles on every interleaved key, so
  * a scan filtering on either key prunes most files from footer stats
  * alone — the table-format clustering trick (Delta/Iceberg OPTIMIZE
  * ZORDER) expressed as a plain Spark plan.
  *
  * The registered query computes the z-value with exact i64 bit
  * arithmetic (identical in DuckDB) and profiles the layout it induces:
  * rows grouped into z-range buckets, each reporting its row count and
  * per-key min/max — i.e. exactly the skipping metadata a writer would
  * put in file footers. The write-side seam is [[zorderWrite]]:
  * range-partition by z-value + sort within partitions, which a caller
  * follows with `.write` to lay files out physically.
  *
  * Scale shape: the z-value is row-local codegen arithmetic; the
  * profile is one narrow groupBy shuffle on the bucket id. At 100 TB
  * the same plan holds — bucket count scales with target file count,
  * and the range partitioner places contiguous z-ranges per writer.
  */
object Layout {

  /** Bits interleaved per key (covers key domains at the shipped SFs;
    * widen together with the bucket shift for larger domains). */
  val BitsPerKey = 16
  /** Bucket id = zval >> BucketShift: 2^(32−18) = 16 Ki max buckets. */
  val BucketShift = 18

  /** Morton interleave of the low [[BitsPerKey]] bits: key `a` occupies
    * even bit positions, `b` odd — disjoint bits, so the OR is a sum.
    */
  def zvalue(a: Column, b: Column): Column =
    (0 until BitsPerKey).map { i =>
      (shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i + 1)): Column
    }.reduce(_ + _)

  private def sqlZvalue(a: String, b: String): String =
    (0 until BitsPerKey).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  def zorderLayoutProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey",
        zvalue($"l_partkey", $"l_suppkey").as("zval"))
      .groupBy(expr(s"zval div ${1L << BucketShift}").as("zbucket"))
      .agg(count(lit(1)).as("n_rows"),
        min($"l_partkey").as("min_part"), max($"l_partkey").as("max_part"),
        min($"l_suppkey").as("min_supp"), max($"l_suppkey").as("max_supp"))
      .orderBy($"zbucket")
  }

  /** Write-side clustering: contiguous z-ranges per output partition,
    * rows z-sorted within each — follow with `.write` for a physically
    * z-ordered layout. Test seam (LayoutSpec checks the induced
    * per-partition key rectangles are bounded).
    */
  def zorderWrite(df: DataFrame, a: String, b: String,
      targetFiles: Int): DataFrame = {
    val withZ = df.withColumn("zval", zvalue(col(a), col(b)))
    withZ.repartitionByRange(targetFiles, col("zval"))
      .sortWithinPartitions("zval")
  }

  val zorderLayoutProfileSql: String =
    s"""WITH z AS (
       |  SELECT l_partkey, l_suppkey,
       |         ${sqlZvalue("l_partkey", "l_suppkey")} AS zval
       |  FROM lineitem)
       |SELECT zval // ${1L << BucketShift} AS zbucket,
       |       count(*) AS n_rows,
       |       min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       |       min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
       |FROM z
       |GROUP BY 1
       |ORDER BY zbucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x35_zorder_layout" -> zorderLayoutProfile _)

  val oracles: Map[String, String] = Map(
    "x35_zorder_layout" -> zorderLayoutProfileSql)
}
