package graft.core

import org.apache.spark.sql.SparkSession

/** Session construction for the graft engine.
  *
  * One place pins every config the correctness contract depends on:
  *   - UTC session timezone (oracle parity with DuckDB),
  *   - LAST_WIN map-key dedup (the reference's last-write-wins per-field
  *     merge semantics, HbaseDataSyncEsObserver.java:74-79, relies on
  *     `map_concat`/`map_from_entries` keeping the *latest* duplicate),
  *   - AQE on (skew-join split + partition coalescing — the 100 TB posture),
  *   - TIMESTAMP_MICROS parquet output (so DuckDB/pyarrow read our dumps
  *     without INT96 legacy conversion),
  *   - shuffle partitions sized to the local core count, not 200.
  *
  * An extensions hook is reserved so later perf rules (e.g. rewrite exact
  * cosine top-k into an LSH candidate join) can be injected without
  * touching call sites (SURVEY.md §4.2).
  */
object GraftSession {

  /** Apply the engine's standard configs to any builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    // Driver fixtures have carried events.ts as parquet TIMESTAMP(NANOS)
    // (rejected outright by the reader unless surfaced as epoch-nanos
    // LongType via the legacy conf) and, since the round-8 regeneration, as
    // tz-naive timestamp[us]. Pin BOTH reader behaviors so either fixture
    // generation loads deterministically: nanos → LongType (Tables floors
    // to µs), tz-naive µs → TimestampType directly (inferTimestampNTZ off;
    // in the UTC session the wall clock is identical to DuckDB's naive
    // read, so the hash contract is unaffected). Tables.normalizeTimestamps
    // additionally folds TIMESTAMP_NTZ if a caller session re-enables the
    // inference.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    // The unrolled linear-recursion oracles (q226 BFS, q235/q236 Viterbi,
    // q241 EM backward walk) legitimately stack 30-45 chained CTEs; each
    // nesting level costs analyzer iterations, and the q241 twin crosses
    // the default cap of 100. The cap is a runaway-rule safety valve, not
    // a semantic bound — raise it for the SQL entry path.
    .config("spark.sql.analyzer.maxIterations", "400")
    .config("spark.ui.enabled", "false")

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to `n`,
    * serializing callers on one monitor: the setting is session-GLOBAL, so
    * an unsynchronized save/set/restore interleaving between two drains
    * (or a drain and a batch query) could restore a stale value and leave
    * the session mis-sized permanently. Harness drains are serial by
    * design; the lock makes that an invariant instead of an assumption. */
  private val confLock = new Object
  def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T =
    confLock.synchronized {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

  /** Local session for tests / ad-hoc runs. */
  def local(cores: Int = 32, extra: Map[String, String] = Map.empty): SparkSession = {
    var b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
    b = configure(b)
    extra.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
