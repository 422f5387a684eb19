package graft.core

import graft.GraftSuite
import org.apache.spark.sql.functions._

/** The concurrent-staging isolation seam (r18 #3): cloned sessions must
  * carry every conf the correctness contract pins (a clone silently
  * running non-UTC or FIRST_WIN would corrupt a drained store in a way
  * only a cross-engine hash catches much later), must isolate
  * shuffle-partition overrides from each other and from the parent, and
  * must still resolve the extension-registered kernels. */
class CloneSessionSpec extends GraftSuite {

  test("clonedSession carries the pinned correctness confs") {
    val ss = GraftSession.clonedSession(spark)
    for (k <- Seq("spark.sql.session.timeZone", "spark.sql.mapKeyDedupPolicy",
                  "spark.sql.adaptive.enabled",
                  "spark.sql.parquet.outputTimestampType",
                  "spark.sql.analyzer.maxIterations",
                  "spark.sql.shuffle.partitions"))
      assert(ss.conf.get(k) === spark.conf.get(k), k)
    assert(ss.conf.get("spark.sql.session.timeZone") === "UTC")
    assert(ss ne spark)
    assert(ss.sparkContext eq spark.sparkContext)
  }

  test("withShufflePartitions on a clone never leaks into the parent or another clone") {
    val a = GraftSession.clonedSession(spark)
    val b = GraftSession.clonedSession(spark)
    val parentBefore = spark.conf.get("spark.sql.shuffle.partitions")
    GraftSession.withShufflePartitions(a, 3) {
      assert(a.conf.get("spark.sql.shuffle.partitions") === "3")
      assert(b.conf.get("spark.sql.shuffle.partitions") === parentBefore)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === parentBefore)
    }
    assert(a.conf.get("spark.sql.shuffle.partitions") === parentBefore)
  }

  test("clones run concurrent overrides in parallel (per-session locks) and restore") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val gate = new java.util.concurrent.CyclicBarrier(2)
    // both bodies must be INSIDE their overrides at the same moment —
    // impossible under the old global conf lock
    val fs = Seq(4, 5).map { n =>
      Future {
        val ss = GraftSession.clonedSession(spark)
        GraftSession.withShufflePartitions(ss, n) {
          gate.await(10, java.util.concurrent.TimeUnit.SECONDS)
          ss.conf.get("spark.sql.shuffle.partitions").toInt
        }
      }
    }
    assert(fs.map(Await.result(_, 30.seconds)).sorted === Seq(4, 5))
    pool.shutdown()
  }

  test("clones resolve the extension-registered kernels") {
    import spark.implicits._
    val ss = GraftSession.clonedSession(spark)
    val df = ss.createDataFrame(Seq(Tuple1(Seq("data", "stream")))).toDF("ws")
    val viaClone = df.select(graft.functions.vec.simhash16(col("ws"))).head.getLong(0)
    val viaParent = Seq(Seq("data", "stream")).toDF("ws")
      .select(graft.functions.vec.simhash16(col("ws"))).head.getLong(0)
    assert(viaClone === viaParent)
    assert(ss.sql("SELECT token_hash('x')").head.getLong(0) ===
      spark.sql("SELECT token_hash('x')").head.getLong(0))
  }
}
