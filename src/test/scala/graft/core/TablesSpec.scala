package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.GraftSuite

/** The fixture loader's one tricky seam: the driver writes `events.ts` as
  * parquet TIMESTAMP(NANOS), which Spark's reader cannot represent. The
  * session reads it as epoch-nanos long (legacy conf) and Tables restores
  * µs TimestampType. Everything downstream assumes this worked. */
class TablesSpec extends GraftSuite {

  test("all fixture tables load with plausible relative sizes") {
    val counts = Tables.all.map(t => t -> Tables(spark, sf, t).count()).toMap
    assert(counts.values.forall(_ > 0), s"empty table: $counts")
    assert(counts("lineitem") > counts("orders"))
    assert(counts("orders") > counts("customer"))
    assert(counts("region") == 5 && counts("nation") == 25)
  }

  test("events.ts is restored to TimestampType at microsecond precision") {
    val events = Tables(spark, sf, "events")
    assert(events.schema("ts").dataType == TimestampType)
    // raw nanos (legacy read) floor-div 1000 must equal our micros exactly
    val raw = spark.read.parquet(s"$sf/events.parquet")
    assert(raw.schema("ts").dataType == LongType, "fixture no longer nanos — update Tables")
    val viaLoader = events.select(unix_micros(col("ts"))).as[Long](spark.implicits.newLongEncoder)
      .collect().sorted
    val viaRaw = raw.select(expr("ts div 1000")).as[Long](spark.implicits.newLongEncoder)
      .collect().sorted
    assert(viaLoader === viaRaw)
  }

  test("timestamps land in the fixture's 2024 UTC range") {
    val r = Tables(spark, sf, "events")
      .agg(min(col("ts")).cast("string"), max(col("ts")).cast("string")).collect()(0)
    assert(r.getString(0).startsWith("2024-"), s"min ts ${r.getString(0)}")
    assert(r.getString(1).startsWith("2024-"), s"max ts ${r.getString(1)}")
  }
}
