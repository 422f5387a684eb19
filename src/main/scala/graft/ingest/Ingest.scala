package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

import graft.model.ChangeLog
import graft.sync.DocSync

/** Typed config + lifecycle facade for the CDC sync pipeline — the
  * Spark-native replacement for the reference's coprocessor config surface
  * and lifecycle (SURVEY.md OP-14/OP-15).
  *
  * Mapping from the reference's 4-string config (Observer.java:46-59,
  * README.md:23-37):
  *   - `cluster.name` + `esClientInfo` (where the sink lives) -> `stateDir`
  *     (the doc table's storage root; on a cluster, a DFS path)
  *   - `indexName`/`indexType` (sink identity) -> the doc table itself;
  *     types were dropped by ES 7 anyway
  *   - install-time `MAX_BULK_COUNT` / `PUT_PREIOD` micro-batcher knobs
  *     (BulkOp.java:30-41, OP-8/OP-9) -> `maxFilesPerTrigger` (size
  *     trigger) + `trigger` (time trigger; prod default 10 s for envelope
  *     parity with the reference's timer)
  *
  * Lifecycle parity (OP-15): `start` wires source -> flatten/merge ->
  * checkpointed sink and returns the handle; `stopGracefully` stops the
  * trigger loop WITHOUT losing data — unlike the reference, whose stop()
  * drops up to 10 s of queued events (Observer.java:61-66, no final
  * flush). Note the no-loss guarantee is via REPLAY, not drain: an
  * in-flight micro-batch is interrupted by stop() (Spark has no drain
  * API), its uncommitted version dir stays invisible, and the checkpoint
  * re-runs the batch at restart — which StreamRestartSpec pins. */
object Ingest {

  /** @param sourceDir        change-log parquet dir (file-stream source; a
    *                         Kafka/HBase-replication source drops in here)
    * @param stateDir         doc-table root (bucketed version dirs)
    * @param checkpointDir    Structured Streaming offset/commit checkpoint
    * @param trigger          OP-9 time trigger; AvailableNow in tests
    * @param maxFilesPerTrigger OP-8 size trigger analog
    * @param numBuckets       doc-table hash buckets (scale knob) */
  case class SyncConfig(sourceDir: String,
                        stateDir: String,
                        checkpointDir: String,
                        trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
                        maxFilesPerTrigger: Int = 1,
                        numBuckets: Int = 16)

  /** Start the sync: change-log stream -> OP-4 flatten + OP-7 merge into
    * the bucketed doc table. Runs until stopped; each trigger is one
    * merge-upsert batch. */
  def start(spark: SparkSession, cfg: SyncConfig): StreamingQuery = {
    val schema = ChangeLog.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.sourceDir)
    startFrom(spark, stream, cfg)
  }

  /** The source seam: start the identical flatten+merge pipeline from ANY
    * streaming change-log source carrying the [[ChangeLog.schema]] columns
    * — a Kafka topic (`spark.readStream.format("kafka")` + a from_json
    * projection), an HBase-replication bridge, or a MemoryStream in tests.
    * [[start]]'s file source is one instance of this seam; nothing
    * downstream (flatten, merge, checkpointing, doc-table layout) knows
    * which source kind feeds it. IngestSpec runs the same doc-table oracle
    * through two source kinds to pin the seam's contract. */
  def startFrom(spark: SparkSession, stream: DataFrame, cfg: SyncConfig): StreamingQuery =
    DocSync.startStream(spark, stream, cfg.stateDir, cfg.checkpointDir,
      cfg.numBuckets, cfg.trigger)

  /** Stop the trigger loop and wait for termination. An in-flight batch is
    * interrupted, NOT drained — it left no committed state (versions
    * commit via the `_coverage` marker) and re-runs from the checkpoint on
    * the next `start`, so stop-anytime is loss-free but the doc table may
    * reflect pre-batch state until restart. */
  def stopGracefully(q: StreamingQuery): Unit = {
    q.stop()
    q.awaitTermination()
  }

  /** Current doc table under a config (readable while the stream runs —
    * versions are immutable). */
  def docTable(spark: SparkSession, cfg: SyncConfig): DataFrame =
    DocSync.docTable(spark, cfg.stateDir, cfg.numBuckets)

  /** OP-15's scheduler-observability analog: a listener surfacing per-batch
    * progress (rows/s replaces the reference's silent 10 s timer loop). */
  def progressListener(onProgress: String => Unit): StreamingQueryListener =
    new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        onProgress(s"batch=${e.progress.batchId} rows=${e.progress.numInputRows} " +
          f"rows/s=${e.progress.processedRowsPerSecond}%.0f")
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
}
