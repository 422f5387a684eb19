package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated test tables (TESTDATA.md).
  *
  * Each table is a single parquet file `<dir>/<name>.parquet`. At cluster
  * scale these would be partitioned/bucketed directories; the loader is the
  * one seam where that changes (a `spark.read.parquet` on a directory is
  * the same call).
  *
  * Timestamp normalization: the fixture generator has shipped `events.ts`
  * in two different physical shapes across rounds — parquet
  * TIMESTAMP(NANOS) (surfaced as epoch-nanos LongType under
  * `spark.sql.legacy.parquet.nanosAsLong`) and tz-naive `timestamp[us]`
  * (surfaced as TIMESTAMP_NTZ when `parquet.inferTimestampNTZ` is on).
  * The engine's contract is a single canonical type: µs-precision
  * [[TimestampType]] in the UTC session, which matches the DuckDB oracle's
  * naive-timestamp wall clock exactly. [[normalizeTimestamps]] folds every
  * known physical shape into that type, and [[apply]] fails with a NAMED
  * error if a declared timestamp column survives in any other type — so
  * the next silent fixture regeneration dies at load with a diagnosis
  * instead of a ClassCastException three stages downstream.
  */
object Tables {
  val tpch = Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extension = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ extension

  /** Columns that must surface as TimestampType, whatever the fixture's
    * current physical encoding. A LongType here is interpreted as epoch
    * NANOS (the legacy-conf read of parquet TIMESTAMP(NANOS)). */
  private val tsCols: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  /** Fold any known timestamp encoding of `name`'s declared ts columns into
    * µs TimestampType. NTZ→Timestamp is a plain cast: in a UTC session the
    * wall-clock fields are preserved verbatim, which is the oracle contract
    * (DuckDB reads the same parquet as naive timestamps). */
  private[core] def normalizeTimestamps(df: DataFrame, name: String): DataFrame =
    tsCols.getOrElse(name, Nil).foldLeft(df) { (acc, c) =>
      acc.schema.find(_.name == c).map(_.dataType) match {
        case Some(LongType) => // epoch nanos under the legacy conf: floor to µs
          acc.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
        case Some(TimestampNTZType) => // tz-naive micros: same wall clock in UTC
          acc.withColumn(c, col(c).cast(TimestampType))
        case _ => acc
      }
    }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = normalizeTimestamps(spark.read.parquet(s"$dir/$name.parquet"), name)
    // Fixture-drift tripwire: a new physical encoding must fail HERE, named.
    tsCols.getOrElse(name, Nil).foreach { c =>
      val dt = df.schema(c).dataType
      require(dt == TimestampType,
        s"fixture drift: $name.$c is $dt after normalization (expected TimestampType) — " +
          s"the driver regenerated $dir/$name.parquet with an encoding Tables.normalizeTimestamps " +
          "does not handle; extend it (graft/core/Tables.scala)")
    }
    df
  }
}
