package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the Spark implementation plus (when SQL-expressible)
  * the DuckDB oracle SQL the driver hash-compares against (SURVEY.md §2.2).
  * Oracle-less entries get the driver's weaker rows-only check (approx /
  * sketch variants whose outputs are engine-specific by design).
  */
case class Entry(name: String,
                 fn: (SparkSession, String) => DataFrame,
                 oracle: Option[String])

object Entry {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Entry =
    Entry(name, fn, Some(oracle))
  def benchOnly(name: String)(fn: (SparkSession, String) => DataFrame): Entry =
    Entry(name, fn, None)
}
