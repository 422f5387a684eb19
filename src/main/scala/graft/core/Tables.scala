package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated test tables (TESTDATA.md).
  *
  * Each table is a single parquet file `<dir>/<name>.parquet`. At cluster
  * scale these would be partitioned/bucketed directories; the loader is the
  * one seam where that changes (a `spark.read.parquet` on a directory is
  * the same call).
  */
object Tables {
  val tpch = Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extension = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ extension

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
