package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the Spark implementation plus (when SQL-expressible)
  * the DuckDB oracle SQL the driver hash-compares against (SURVEY.md §2.2).
  * Oracle-less entries get the driver's weaker rows-only check (approx /
  * sketch variants whose outputs are engine-specific by design).
  *
  * SQL entry path (SURVEY.md §3.4 entry C): every oracle-backed query must
  * ALSO run via `spark.sql` and match the DataFrame result row-for-row —
  * SqlParitySpec enforces it across the whole registry. [[sparkSql]] is
  * that twin: the oracle SQL verbatim when it is ANSI enough for both
  * engines, or the [[sqlTwin]] override when the oracle leans on DuckDB
  * dialect (list_*, unnest, arg_max, epoch_us, ...).
  */
case class Entry(name: String,
                 fn: (SparkSession, String) => DataFrame,
                 oracle: Option[String],
                 sparkSqlOverride: Option[String] = None) {

  /** The `spark.sql` twin: explicit override, else the (dialect-shared)
    * oracle SQL. None only for bench-only sketch entries. */
  def sparkSql: Option[String] = sparkSqlOverride.orElse(oracle)

  /** Attach a Spark-dialect twin where the oracle SQL is DuckDB-specific. */
  def sqlTwin(sql: String): Entry = copy(sparkSqlOverride = Some(sql))
}

object Entry {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Entry =
    Entry(name, fn, Some(oracle))
  def benchOnly(name: String)(fn: (SparkSession, String) => DataFrame): Entry =
    Entry(name, fn, None)
}
