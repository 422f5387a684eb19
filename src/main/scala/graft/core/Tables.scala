package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loader for the driver-generated test tables (TESTDATA.md).
  *
  * Each table is a single parquet file `<dir>/<name>.parquet`. At cluster
  * scale these would be partitioned/bucketed directories; the loader is the
  * one seam where that changes (a `spark.read.parquet` on a directory is
  * the same call).
  *
  * Timestamp normalization: the fixture generator has regenerated temporal
  * columns in several physical shapes across rounds — parquet
  * TIMESTAMP(NANOS) (surfaced as epoch-nanos LongType under
  * `spark.sql.legacy.parquet.nanosAsLong`), tz-naive `timestamp[us]`
  * (surfaced as TIMESTAMP_NTZ when `parquet.inferTimestampNTZ` is on),
  * tz-aware `timestamp[ms/us]` (TimestampType), and potentially `date32`
  * (DateType). The engine's contract is a single canonical type:
  * µs-precision [[TimestampType]] in the UTC session, which matches the
  * DuckDB oracle's naive-timestamp wall clock exactly.
  * [[normalizeTimestamps]] folds every known physical shape into that
  * type.
  *
  * Fixture-drift tripwire: round 8 (events.ts ns→NTZ) and round 10
  * (lineitem.l_shipdate / orders.o_orderdate ms→NTZ) both shipped silent
  * fixture regenerations that broke oracle entries downstream. The lesson
  * from round 10 is that *undeclared*-column drift is the mode that
  * actually happens, so [[apply]] now asserts the FULL post-normalization
  * schema of every table against the expected schema in FIXTURES.md and
  * fails with a NAMED error on any difference (missing column, renamed
  * column, new column, changed type) — the next regeneration dies at load
  * with a diagnosis instead of a hash mismatch three stages downstream.
  */
object Tables {
  val tpch = Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extension = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ extension

  /** Columns that must surface as TimestampType, whatever the fixture's
    * current physical encoding. A LongType here is interpreted as epoch
    * NANOS (the legacy-conf read of parquet TIMESTAMP(NANOS)). */
  private[core] val tsCols: Map[String, Seq[String]] = Map(
    "events"   -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders"   -> Seq("o_orderdate"))

  /** Expected post-normalization logical schema of every fixture table
    * (FIXTURES.md). Name + type in order; nullability ignored. */
  private[core] val expectedSchemas: Map[String, Seq[(String, DataType)]] = Map(
    "region"   -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation"   -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
                      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
                      "s_acctbal" -> DoubleType),
    "part"     -> Seq("p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
                      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders"   -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
                      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampType,
                      "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
                      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
                      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
                      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
                      "l_shipdate" -> TimestampType),
    "events"   -> Seq("event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
                      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
    "documents"  -> Seq("doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
                        "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  /** Fold any known timestamp encoding of `name`'s declared ts columns into
    * µs TimestampType. NTZ→Timestamp and Date→Timestamp are plain casts: in
    * a UTC session the wall-clock fields are preserved verbatim, which is
    * the oracle contract (DuckDB reads the same parquet naively). A column
    * that is absent or in an unknown type is left alone — the schema
    * tripwire in [[apply]] diagnoses it by name. */
  private[core] def normalizeTimestamps(df: DataFrame, name: String): DataFrame =
    tsCols.getOrElse(name, Nil).foldLeft(df) { (acc, c) =>
      acc.schema.find(_.name == c).map(_.dataType) match {
        case Some(LongType) => // epoch nanos under the legacy conf: floor to µs
          acc.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
        case Some(TimestampNTZType) => // tz-naive micros: same wall clock in UTC
          acc.withColumn(c, col(c).cast(TimestampType))
        case Some(DateType) => // date32: midnight UTC (fixture dates are day-granular)
          acc.withColumn(c, col(c).cast(TimestampType))
        case _ => acc
      }
    }

  /** Full-schema fixture-drift tripwire: any divergence from
    * [[expectedSchemas]] must fail HERE, named, at first load. */
  private[core] def checkSchema(df: DataFrame, dir: String, name: String): Unit =
    expectedSchemas.get(name).foreach { expected =>
      val actual = df.schema.map(f => f.name -> f.dataType)
      if (actual != expected) {
        val exp = expected.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ")
        val act = actual.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ")
        val missing = expected.map(_._1).filterNot(actual.map(_._1).contains)
        val extra = actual.map(_._1).filterNot(expected.map(_._1).contains)
        throw new IllegalStateException(
          s"fixture drift: $dir/$name.parquet schema after normalization differs from FIXTURES.md.\n" +
            s"  expected: [$exp]\n  actual:   [$act]\n" +
            (if (missing.nonEmpty) s"  missing columns: ${missing.mkString(", ")}\n" else "") +
            (if (extra.nonEmpty) s"  new columns: ${extra.mkString(", ")}\n" else "") +
            "The driver regenerated this fixture with a shape Tables does not handle; extend " +
            "graft/core/Tables.scala (normalizeTimestamps / expectedSchemas) and FIXTURES.md.")
      }
    }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = normalizeTimestamps(spark.read.parquet(s"$dir/$name.parquet"), name)
    checkSchema(df, dir, name)
    df
  }
}
