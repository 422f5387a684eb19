package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Aggregates, Entry, Relational, Scalars}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator from SURVEY.md §2 registers here: `queries`
  * feeds Verify (DuckDB-oracle hash compare at sf0.01) and Bench; entries
  * whose output is engine-specific (sketches, LSH) have no oracle SQL and
  * get the driver's rows-only check.
  */
object SparkEntry {

  val allEntries: Seq[Entry] =
    Relational.entries ++
    Aggregates.entries ++
    Scalars.entries ++
    sync.SyncQueries.entries ++
    streaming.Streams.entries ++
    text.Text.entries ++
    vector.Vectors.entries ++
    multimodal.Multimodal.entries

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
