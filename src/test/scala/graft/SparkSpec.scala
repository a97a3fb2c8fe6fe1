package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session, SURVEY §5.2.2). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // graft native functions (hash60, affine_min, ...) are session-scoped
    // temp functions; register once so every suite's shared-def frames
    // (reservoirKey, cmsBucket, minhash sigs) analyze (r16 — Qutil.hash60
    // is native now and reaches far more helper paths than the r15 set)
    graft.functions.GraftFunctions.registerAll(s)
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
  /** Bench-scale fixture — the largest SF checks run against. Tests that
    * read it should assume() it exists so a small checkout stays green. */
  val sf01 = "/root/testdata/sf0.1"
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sf: String = TestSession.sf0001
}
