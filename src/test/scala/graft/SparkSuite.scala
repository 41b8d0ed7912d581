package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for Spark-backed suites (one per suite, lazy). */
trait SparkSuite extends AnyFunSuite {
  // Every test JVM gets its OWN AnnStore root: reuse within a run exercises
  // the load path (AnnStoreSpec), while a store published by a previous —
  // possibly different-code — run can never satisfy this run's lookups.
  SparkSuite.annDirInit

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def sf: String = "/root/testdata/sf0.001"
}

object SparkSuite {
  /** Set once per JVM, before any suite touches AnnStore. */
  lazy val annDirInit: Unit = {
    sys.props.getOrElseUpdate("graft.ann.dir",
      java.nio.file.Files.createTempDirectory("graft_ann_test").toString)
    ()
  }
}
