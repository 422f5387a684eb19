package graft.sync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSuite
import graft.core.Tables

/** q177 (_delete_by_query) and q193 (_update_by_query) declare the
  * READ-side audit of a bulk batch and claim the write side is the SAME
  * merge the CDC path uses (q57/q158). This spec runs that write side:
  * the matched documents become DELETE / partial-PUT change events
  * through the real DocSync fold+merge, and the resulting doc table must
  * agree with the audit columns the declared entries report — so the
  * audit is pinned as a faithful description of the actual state
  * transition, not a parallel computation. */
class BulkQueryWriteSpec extends GraftSuite {

  private val cellsType = "array<struct<family:string,qualifier:string,value:string>>"

  private def docsT = Tables(spark, sf, "documents")

  /** Initial state: one PUT per document carrying (lang, source, n_chars). */
  private def baseState(): DataFrame =
    DocSync.fold(docsT.select(
      lit("PUT").as("op"), col("doc_id").cast("string").as("rowKey"), lit(1L).as("seq"),
      array(
        struct(lit("d").as("family"), lit("lang").as("qualifier"),
               col("lang").as("value")),
        struct(lit("d").as("family"), lit("source").as("qualifier"),
               col("source").as("value")),
        struct(lit("d").as("family"), lit("n_chars").as("qualifier"),
               col("n_chars").cast("string").as("value"))).as("cells")))

  test("q177's audit describes the delete batch applied through the real merge") {
    val state = baseState()
    val delBatch = docsT.filter(col("source") === "src2" && col("n_chars") < 500)
      .select(lit("DELETE").as("op"), col("doc_id").cast("string").as("rowKey"),
              lit(2L).as("seq"), lit(null).cast(cellsType).as("cells"))
    val merged = DocSync.merge(state, DocSync.foldIncrement(delBatch))

    val after = merged.select(element_at(col("doc"), "lang").as("lang"))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val audit = graft.SparkEntry.queries("q177_delete_by_query")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(audit.nonEmpty && audit.values.map(_._2).sum > 0, "batch must match docs")
    audit.foreach { case (lang, (before, deleted, afterN)) =>
      assert(after.getOrElse(lang, 0L) == afterN,
        s"lang=$lang: merged table has ${after.getOrElse(lang, 0L)} docs, audit says $afterN")
      assert(before - deleted == afterN) // audit self-consistency
    }
    assert(after.values.sum == audit.values.map(_._3).sum)
  }

  test("q193's audit describes the update batch applied through the real merge") {
    val state = baseState()
    // the script `n_chars += 17` as a PARTIAL document (setDocAsUpsert):
    // only the touched field rides the event; lang/source must survive
    val updBatch = docsT.filter(col("source") === "src1" && col("n_chars") < 300)
      .select(lit("PUT").as("op"), col("doc_id").cast("string").as("rowKey"),
              lit(2L).as("seq"),
              array(struct(lit("d").as("family"), lit("n_chars").as("qualifier"),
                           (col("n_chars") + 17).cast("string").as("value"))).as("cells"))
    val merged = DocSync.merge(state, DocSync.foldIncrement(updBatch))

    val after = merged.select(element_at(col("doc"), "lang").as("lang"),
                              element_at(col("doc"), "n_chars").cast("long").as("nc"))
      .groupBy("lang").agg(count(lit(1)).as("n"), sum(col("nc")).as("chars"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val audit = graft.SparkEntry.queries("q193_update_by_query")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(audit.nonEmpty && audit.values.map(_._2).sum > 0, "batch must match docs")
    audit.foreach { case (lang, (total, _, charsBefore, charsAfter)) =>
      val (n, chars) = after(lang)
      assert(n == total, s"lang=$lang: update must not add or drop docs")
      assert(chars == charsAfter,
        s"lang=$lang: merged checksum $chars, audit chars_after $charsAfter")
      assert(chars != charsBefore || audit(lang)._2 == 0) // the script really ran
    }
  }
}
