package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

/** Batch source/sink formats beyond parquet (engine-baseline IO surface):
  * JSON lines, CSV with explicit schema, and ORC round-trip the same
  * relational data losslessly. Parquet is exercised by every oracle
  * query; these pin the other formats' read paths (schema declaration,
  * header handling, type fidelity).
  */
class SourceFormatSpec extends SparkSpec {

  private def sample(): DataFrame =
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey").limit(100)

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val l = a.orderBy("o_orderkey").collect().map(_.toString).toSeq
    val r = b.orderBy("o_orderkey").collect().map(_.toString).toSeq
    assert(l == r)
  }

  test("JSON lines round-trip with declared schema") {
    val dir = Files.createTempDirectory("graft-json-").toString
    val df = sample()
    df.write.mode("overwrite").json(dir)
    // explicit schema (not inference): the engine's schema-declared stance
    assertSameRows(df, spark.read.schema(df.schema).json(dir))
  }

  test("CSV round-trip with header and declared schema") {
    val dir = Files.createTempDirectory("graft-csv-").toString
    val df = sample()
    df.write.mode("overwrite").option("header", "true").csv(dir)
    assertSameRows(df,
      spark.read.schema(df.schema).option("header", "true").csv(dir))
  }

  test("ORC round-trip") {
    val dir = Files.createTempDirectory("graft-orc-").toString
    val df = sample()
    df.write.mode("overwrite").orc(dir)
    assertSameRows(df, spark.read.orc(dir))
  }

  test("partitioned parquet write prunes on read") {
    val dir = Files.createTempDirectory("graft-part-").toString
    sample().write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(dir)
    val pruned = spark.read.parquet(dir).filter("o_orderstatus = 'F'")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"partition pruning missing from plan:\n$plan")
    assert(pruned.count() ==
      sample().filter("o_orderstatus = 'F'").count())
  }
}
