package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the driver-generated test tables (TESTDATA.md).
  *
  * Each table is a single parquet file `<dir>/<name>.parquet`. At cluster
  * scale these would be partitioned/bucketed directories; the loader is the
  * one seam where that changes (a `spark.read.parquet` on a directory is
  * the same call).
  *
  * Timestamp normalization: the driver writes `events.ts` as parquet
  * TIMESTAMP(NANOS), which Spark cannot represent (TimestampType is µs).
  * With `spark.sql.legacy.parquet.nanosAsLong` the scan surfaces epoch
  * nanos as LongType; the loader restores TimestampType by flooring to
  * microseconds — identical to what the oracle side's canonicalizer does
  * (strftime %f truncation), so hash comparisons stay exact.
  */
object Tables {
  val tpch = Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extension = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ extension

  /** Columns read as raw epoch-nanos longs under the legacy conf. */
  private val nanosCols: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    nanosCols.getOrElse(name, Nil).foldLeft(df) { (acc, c) =>
      acc.schema.find(f => f.name == c && f.dataType == LongType) match {
        case Some(_) => acc.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
        case None    => acc
      }
    }
  }
}
