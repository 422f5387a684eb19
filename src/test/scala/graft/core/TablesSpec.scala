package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.GraftSuite

/** The fixture loader's one tricky seam: the driver has shipped `events.ts`
  * as parquet TIMESTAMP(NANOS) (→ epoch-nanos LongType under the legacy
  * conf) in some rounds and tz-naive timestamp[us] in others. Tables must
  * fold EITHER encoding into µs TimestampType, and fail with a named error
  * on anything else. Everything downstream assumes this worked. */
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
    // Whatever the current fixture encoding, the loader's micros must equal
    // the micros derived independently from the raw read.
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val rawMicros = raw.schema("ts").dataType match {
      case LongType         => expr("ts div 1000") // legacy nanos read
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case TimestampType    => unix_micros(col("ts"))
      case dt               => fail(s"unexpected raw encoding $dt — extend this test with Tables")
    }
    val viaLoader = events.select(unix_micros(col("ts"))).as[Long](spark.implicits.newLongEncoder)
      .collect().sorted
    val viaRaw = raw.select(rawMicros.cast("long")).as[Long](spark.implicits.newLongEncoder)
      .collect().sorted
    assert(viaLoader === viaRaw)
  }

  test("timestamps land in the fixture's 2024 UTC range") {
    val r = Tables(spark, sf, "events")
      .agg(min(col("ts")).cast("string"), max(col("ts")).cast("string")).collect()(0)
    assert(r.getString(0).startsWith("2024-"), s"min ts ${r.getString(0)}")
    assert(r.getString(1).startsWith("2024-"), s"max ts ${r.getString(1)}")
  }

  test("normalizeTimestamps folds both known encodings; tripwire names new ones") {
    import spark.implicits._
    // NTZ encoding (the round-8 fixture regeneration): cast survives with
    // identical wall clock in the UTC session.
    val ntz = Seq("2024-03-01 12:34:56.789012").toDF("s")
      .select(expr("cast(s as timestamp_ntz)").as("ts"))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val fromNtz = Tables.normalizeTimestamps(ntz, "events")
    assert(fromNtz.schema("ts").dataType == TimestampType)
    // Epoch-nanos LongType encoding (the original fixture): floored to µs.
    val micros = fromNtz.select(unix_micros(col("ts"))).as[Long].head()
    val nanos = Seq(micros * 1000L + 999L).toDF("ts") // sub-µs residue must floor away
    val fromNanos = Tables.normalizeTimestamps(nanos, "events")
    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromNanos.select(unix_micros(col("ts"))).as[Long].head() == micros)
    // Identical instants either way.
    assert(fromNtz.select(col("ts").cast("string")).as[String].head() ==
      fromNanos.select(col("ts").cast("string")).as[String].head())
    // A non-ts table passes through untouched.
    val other = Seq(1).toDF("x")
    assert(Tables.normalizeTimestamps(other, "nation").schema == other.schema)
    // date32 encoding (a shape the driver could plausibly regenerate next):
    // folded to midnight-UTC TimestampType.
    val dated = Seq("2024-03-01").toDF("s").select(col("s").cast("date").as("ts"))
    val fromDate = Tables.normalizeTimestamps(dated, "events")
    assert(fromDate.schema("ts").dataType == TimestampType)
    assert(fromDate.select(col("ts").cast("string")).as[String].head() == "2024-03-01 00:00:00")
  }

  test("lineitem.l_shipdate and orders.o_orderdate are restored to TimestampType") {
    // Round-10 drift mode: these regenerated as tz-naive timestamp[us] and
    // were NOT declared in tsCols, so the drift passed silently and broke
    // the SELECT * oracle entries. Now declared + normalized.
    assert(Tables(spark, sf, "lineitem").schema("l_shipdate").dataType == TimestampType)
    assert(Tables(spark, sf, "orders").schema("o_orderdate").dataType == TimestampType)
  }

  test("full-schema tripwire names any drift: missing, renamed, extra, retyped") {
    import spark.implicits._
    // The real tables all pass (exercised implicitly by Tables.apply above),
    // and a drifted shape fails with a named diagnosis.
    val good = Tables(spark, sf, "nation")
    Tables.checkSchema(good, sf, "nation") // no throw
    val dropped = intercept[IllegalStateException] {
      Tables.checkSchema(good.drop("n_name"), sf, "nation")
    }
    assert(dropped.getMessage.contains("fixture drift"))
    assert(dropped.getMessage.contains("missing columns: n_name"))
    val added = intercept[IllegalStateException] {
      Tables.checkSchema(good.withColumn("extra_col", lit(1)), sf, "nation")
    }
    assert(added.getMessage.contains("new columns: extra_col"))
    val retyped = intercept[IllegalStateException] {
      Tables.checkSchema(good.withColumn("n_regionkey", col("n_regionkey").cast("long")), sf, "nation")
    }
    assert(retyped.getMessage.contains("n_regionkey:bigint"))
    // Every fixture table has a declared expected schema — no undeclared
    // table can drift silently.
    assert(Tables.all.forall(Tables.expectedSchemas.contains))
  }
}
