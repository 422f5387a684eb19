package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared session for the whole suite (per-JVM; Test/fork gives the
  * suite its own JVM). Same configuration path as production sessions —
  * GraftSession.configure — so tests exercise the extensions registration,
  * UTC, AQE and LAST_WIN map semantics the engine relies on. */
object SparkTestBase {
  lazy val spark: SparkSession = graft.core.GraftSession.local(cores = 4)

  /** Smallest driver fixture — correctness-only tests stay sub-second. */
  val sf: String = "/root/testdata/sf0.001"
  /** Mid fixture for recall/threshold tests that need population. */
  val sf01: String = "/root/testdata/sf0.01"
}

abstract class GraftSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  def sf: String = SparkTestBase.sf
  def sf01: String = SparkTestBase.sf01
}
