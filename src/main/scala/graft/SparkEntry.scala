package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Aggregates, Dialect, Entry, Geo, Metrics, Relational, Scalars, Search}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator from SURVEY.md §2 registers here: `queries`
  * feeds Verify (DuckDB-oracle hash compare at sf0.01) and Bench; entries
  * whose output is engine-specific (sketches, LSH) have no oracle SQL and
  * get the driver's rows-only check.
  */
object SparkEntry {

  // SQL entry path (SURVEY.md §3.4 C): entries without an explicit
  // Spark-dialect twin get one derived from the oracle SQL by the
  // mechanical rename bridge; SqlParitySpec executes every twin against
  // the DataFrame plan, so a bad derivation cannot pass silently. A
  // derivation REJECT (rule token inside a string literal) is isolated to
  // that entry — recorded in [[twinDerivationErrors]] and failed by
  // SqlParitySpec — instead of throwing here, where one bad oracle would
  // take down registration for every unrelated bench/correctness run.
  private val derived: Seq[(Entry, Option[String], Boolean)] = {
    val declared =
      Relational.entries ++
      Aggregates.entries ++
      Scalars.entries ++
      Geo.entries ++
      Metrics.entries ++
      Search.entries ++
      sync.SyncQueries.entries ++
      streaming.Streams.entries ++
      text.Text.entries ++
      text.Pipeline.entries ++
      text.Utf8Repair.entries ++
      text.Normalize.entries ++
      text.Html.entries ++
      text.Urls.entries ++
      text.LangId.entries ++
      text.Robots.entries ++
      text.Sitemap.entries ++
      text.Domains.entries ++
      text.Funnel.entries ++
      text.LinkGraph.entries ++
      text.Anchors.entries ++
      text.QualityModel.entries ++
      text.Perceptron.entries ++
      text.Unigram.entries ++
      text.Sentences.entries ++
      text.Pii.entries ++
      vector.Vectors.entries ++
      multimodal.Multimodal.entries ++
      multimodal.MmEmbed.entries ++
      multimodal.Video.entries ++
      multimodal.Spectral.entries ++
      multimodal.Ulaw.entries ++
      multimodal.Flac.entries ++
      multimodal.PerceptualHash.entries ++
      multimodal.AspectBuckets.entries ++
      multimodal.Vad.entries ++
      multimodal.Resample.entries ++
      multimodal.Tiff.entries ++
      ingest.Shards.entries ++
      ingest.CompressedShards.entries ++
      ingest.ZipShards.entries ++
      ingest.WarcShards.entries ++
      ingest.Redirects.entries
    declared.map { e =>
      if (e.sparkSqlOverride.nonEmpty || e.oracle.isEmpty) (e, None, false)
      else
        scala.util.Try(e.sqlTwin(Dialect.duckToSpark(e.oracle.get))) match {
          case scala.util.Success(withTwin) => (withTwin, None, true)
          case scala.util.Failure(ex)       => (e, Some(ex.getMessage), false)
        }
    }
  }

  val allEntries: Seq[Entry] = derived.map(_._1)

  /** Names whose `spark.sql` twin was DERIVED by the dialect bridge (vs
    * declared explicitly) — DialectFuzzSpec pins literal-region
    * preservation over exactly this set. */
  val bridgedTwins: Set[String] = derived.collect { case (e, _, true) => e.name }.toSet

  /** Twin-derivation rejects by entry name (empty in a healthy build);
    * SqlParitySpec fails each named entry individually. */
  val twinDerivationErrors: Map[String, String] =
    derived.collect { case (e, Some(msg), _) => e.name -> msg }.toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mini-TPC-H-Q5: the 6-table join + revenue rollup. */
  def entry(spark: SparkSession): DataFrame =
    queriesByName("q20_join5").fn(spark, "/root/testdata/sf0.001")

  private def queriesByName(n: String): Entry = allEntries.find(_.name == n).get

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allEntries.map(e => e.name -> e.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allEntries.flatMap(e => e.oracle.map(o => e.name -> o)).toMap
}
