package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one forked test JVM;
  * getOrCreate reuses the session across suites, so no per-suite
  * start/stop cost). UTC + small shuffle partitions mirror the Verify
  * harness.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // expected-WARN hygiene (round-16 verdict item 4): the
    // localCheckpoint lifecycle line and the suite-teardown job-group
    // cancel are both known-benign here — see HarnessLog's scaladoc
    // and BASELINE.md §log-hygiene
    HarnessLog.quietSuiteTeardown()
    s
  }

  /** Smallest driver-generated testdata; read-only. Env-overridable so
    * a machine with a different testdata root runs the suites unchanged
    * (suites needing sibling SFs derive them from this path).
    */
  val sfDir: String =
    sys.env.getOrElse("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
}
