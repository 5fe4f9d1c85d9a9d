package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs (UTC, AQE on, 8 shuffle
  * partitions — small data, fast tests; prod entry points use 32). */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkTestBase.session

  /** Root of the driver-generated test data; overridable so a foreign
    * checkout can point the suite elsewhere (r4 ADVICE). */
  val testdataRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")

  /** Smoke scale factor: ~6k lineitem rows. */
  val sf: String = s"$testdataRoot/sf0.001"

  /** Correctness scale factor (~60k lineitem rows) — some plan
    * contracts need data volume (e.g. the AQE skew threshold). */
  val sfData: String = s"$testdataRoot/sf0.01"

  /** Skip-with-info guard for specs that need a given sf dir. */
  def requireSf(dir: String): Boolean = {
    val ok = new java.io.File(dir).isDirectory
    if (!ok) info(s"sf dir $dir absent on this checkout — skipping")
    ok
  }

  def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val builder = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
    // same throwaway-scratch environment as the Bench/Verify mains
    // (r14): RocksDB state working dirs on this box's ext4 /tmp were
    // the streaming suites' fixed cost too (suite 13m -> 8m47s)
    graft.scratchConfs.foreach { case (k, v) => builder.config(k, v) }
    val s = builder
      // events.ts is parquet timestamp[ns] — see Tables.loadEvents
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // managed tables (the ANALYZE/CBO spec) go to tmp, not the repo
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
