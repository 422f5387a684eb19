package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSuite
import graft.core.Tables

/** q183's exactly-once claim rests on idempotent replay, not a stateful
  * store: a batch writes ONLY its own `batch=<id>` partition, so
  * re-running the whole job over the same ordered arrivals — the
  * lost-checkpoint worst case, where every batch replays — must leave
  * the rollup byte-identical. Pin exactly that: drain once, record the
  * merged result, drain AGAIN into the SAME rollup dir with a fresh
  * checkpoint, and require the merge unchanged (same rows, and no
  * doubled counts — the failure a naive append sink would produce). */
class RollupReplaySpec extends GraftSuite {

  private def writeFile(df: DataFrame, dir: String, i: Int): Unit = {
    val sub = s"$dir/stage$i"
    df.coalesce(1).write.mode("overwrite").parquet(sub)
    val f = new java.io.File(sub).listFiles().filter(_.getName.endsWith(".parquet")).head
    val dst = java.nio.file.Paths.get(s"$dir/part-$i.parquet")
    java.nio.file.Files.move(f.toPath, dst)
    dst.toFile.setLastModified(1700000000000L + i * 60000L)
  }

  test("full replay into the same rollup dir changes nothing") {
    val events = Tables(spark, sf, "events")
    val src = Files.createTempDirectory("graft_rollup_replay_src").toString
    (0 to 2).foreach(i => writeFile(events.filter(col("event_id") % 3 === i), src, i))
    val out = Files.createTempDirectory("graft_rollup_replay_out").toString

    Streams.rollupDrain(spark, src, out)
    val first = Streams.rollupMerge(spark, out).collect().toSeq
    assert(first.nonEmpty)
    val totalN = first.map(_.getLong(2)).sum
    assert(totalN == events.count(), "rollup covers every event exactly once")

    Streams.rollupDrain(spark, src, out)   // fresh checkpoint, same out dir
    val second = Streams.rollupMerge(spark, out).collect().toSeq
    assert(second == first, "replay must be idempotent (no doubled partials)")
  }
}
