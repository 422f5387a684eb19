package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract registry itself: duplicate names would silently
  * drop queries in the `toMap`, and an entry without a `queries` function
  * can't exist by construction — but name collisions across the eight
  * contributing modules can, so pin uniqueness. */
@graft.tags.Slow
class SparkEntrySpec extends AnyFunSuite {

  test("declared query names are unique across all modules") {
    val names = SparkEntry.allEntries.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(names.size == SparkEntry.queries.size)
  }

  test("every oracle belongs to a declared query") {
    val names = SparkEntry.allEntries.map(_.name).toSet
    val orphans = SparkEntry.oracleSql.keySet -- names
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("oracle SQL never references Spark-only function names") {
    // the oracle strings run in DuckDB: a Spark-ism here fails at driver
    // compare time, not compile time — catch the common ones early
    val sparkisms = Seq("unix_micros(", "date_format(", "element_at(", "xxhash64(")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      sparkisms.foreach(fn =>
        assert(!sql.contains(fn), s"$name oracle uses Spark-only $fn"))
    }
  }

  test("no declared output column is array/map/struct-typed (harness-shape lint)") {
    // The driver's correctness harness reads every entry's dump with
    // pandas and sorts all columns; an array/map/struct column crashes it
    // (r20: q291's Seq[Long] fp — `TypeError: unhashable type`), losing
    // the entry's hard signal entirely. Every declared output must be
    // flat scalars. Streaming entries are excluded here only because
    // obtaining their schema requires a real multi-second drain; their
    // outputs are windowed aggregates of scalar columns, exercised by
    // Verify and their own specs.
    val spark = SparkTestBase.spark
    val streaming = graft.streaming.Streams.entries.map(_.name).toSet
    val offenders = SparkEntry.allEntries
      .filterNot(e => streaming.contains(e.name))
      .flatMap { e =>
        try {
          import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
          val complex = SparkEntry.queries(e.name)(spark, SparkTestBase.sf)
            .schema.fields.collect {
              case f if f.dataType.isInstanceOf[ArrayType] ||
                        f.dataType.isInstanceOf[MapType] ||
                        f.dataType.isInstanceOf[StructType] =>
                s"${f.name}: ${f.dataType.simpleString}"
            }
          if (complex.isEmpty) None else Some(s"${e.name}: ${complex.mkString(", ")}")
        } finally spark.catalog.clearCache()
      }
    assert(offenders.isEmpty,
      "declared output carries non-scalar column(s) the driver harness cannot read:\n  " +
        offenders.mkString("\n  "))
  }

  test("every batch entry executes on the degenerate sf0.001 corpus") {
    // The correctness gate runs at sf0.01; this sweep pins the SMALLER
    // scale, where degenerate populations live (sub-k percentile groups,
    // lag(7) over 3 buckets, empty agg inputs — the q112 LN(0) class of
    // bug). Zero rows is a legal answer; throwing is not. Streaming
    // entries are excluded (each is a real multi-second writeStream run,
    // exercised by Verify and their own specs).
    val spark = SparkTestBase.spark
    val streaming = graft.streaming.Streams.entries.map(_.name).toSet
    val failures = SparkEntry.allEntries
      .filterNot(e => streaming.contains(e.name))
      .flatMap { e =>
        try { SparkEntry.queries(e.name)(spark, SparkTestBase.sf).count(); None }
        catch { case t: Throwable => Some(s"${e.name}: ${t.getMessage}") }
        finally spark.catalog.clearCache()
      }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
