package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's change-data-capture event model.
  *
  * Mirrors the reference's mutation stream: an HBase RegionServer coprocessor
  * observing Put/Delete row mutations (HbaseDataSyncEsObserver.java:69-108).
  * A `Put` carries a set of cells (family, qualifier, value — all strings
  * after the reference's `Bytes.toString` decode, Observer lines 71-77); a
  * `Delete` carries only the rowKey (column scope is discarded,
  * Observer.java:97-108).
  *
  * `seq` is the total per-key order of the log (the reference relies on
  * arrival order at the RegionServer; we make the order explicit so replay
  * is deterministic and shardable).
  */
object ChangeLog {

  case class Cell(family: String, qualifier: String, value: String)
  case class ChangeEvent(op: String, rowKey: String, seq: Long,
                         ts: java.sql.Timestamp, cells: Seq[Cell])

  val cellType: StructType = StructType(Seq(
    StructField("family", StringType),
    StructField("qualifier", StringType),
    StructField("value", StringType)))

  val schema: StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("rowKey", StringType),
    StructField("seq", LongType),
    StructField("ts", TimestampType),
    StructField("cells", ArrayType(cellType))))

  /** Wire timestamp format for the JSON encoding. Spark's DEFAULT
    * to_json format truncates to milliseconds — with micro-precision
    * event times that silently loses the low digits on the wire, so the
    * format is pinned to microseconds on both encode and decode. */
  val wireTimestampFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
  private val wireOptions = Map("timestampFormat" -> wireTimestampFormat)

  /** Decode a stream of JSON-encoded change events — the Kafka wire shape
    * (one JSON object per record `value`) — into the canonical change-log
    * columns. A Kafka deployment is exactly
    * `spark.readStream.format("kafka")... .select(col("value").cast("string"))`
    * feeding this; IngestSpec drives the same doc-table oracle through it
    * AND asserts decode(encode(log)) == log including `ts`, so the wire
    * decode is contract-tested without a broker. */
  def fromJsonValues(values: DataFrame): DataFrame =
    values.select(from_json(col("value"), schema, wireOptions).as("e")).select("e.*")

  /** Encode change-log rows to the JSON wire shape (`value` column) —
    * what a producer would publish; the test-side inverse of
    * [[fromJsonValues]] with the same pinned timestamp format. */
  def toJsonValues(log: DataFrame): DataFrame =
    log.select(to_json(struct(col("*")), wireOptions).as("value"))

  /** Number of distinct rowKeys the derived fixture folds events into.
    * Chosen so every key sees many Puts (exercises per-field LWW merge)
    * and is coprime with the delete stride below. */
  val KeySpace = 199

  /** Derived change-log fixture (FIXTURES.md): a pure function of the
    * `events` table so a SQL oracle can replay it.
    *
    *  - every event row emits a PUT: rowKey = event_id % 199,
    *    seq = event_id, cells over family "data":
    *      event_type  (always)
    *      value       (always; rendered via DECIMAL(18,6) so both engines
    *                   produce the identical string)
    *      user_id     (only when event_id % 3 != 0 — exercises the
    *                   partial-document merge of Observer.java:86-87)
    *    and family "meta": props (only when non-null).
    *  - every event with event_id % 50 == 0 additionally emits a DELETE of
    *    rowKey = (event_id + 25) % 199 at the same seq (different key, so
    *    per-key seq order stays total).
    */
  def fromEvents(events: DataFrame): DataFrame = {
    def cell(f: String, q: String, v: Column): Column =
      struct(lit(f).as("family"), lit(q).as("qualifier"), v.as("value"))

    val puts = events.select(
      lit("PUT").as("op"),
      (col("event_id") % KeySpace).cast("string").as("rowKey"),
      col("event_id").as("seq"),
      col("ts"),
      filter(array(
        cell("data", "event_type", col("event_type")),
        cell("data", "value", col("value").cast(DecimalType(18, 6)).cast("string")),
        when(col("event_id") % 3 =!= 0, cell("data", "user_id", col("user_id").cast("string"))),
        when(col("props").isNotNull, cell("meta", "props", col("props")))
      ), c => c.isNotNull).as("cells"))

    val deletes = events.filter(col("event_id") % 50 === 0).select(
      lit("DELETE").as("op"),
      ((col("event_id") + 25) % KeySpace).cast("string").as("rowKey"),
      col("event_id").as("seq"),
      col("ts"),
      lit(null).cast(ArrayType(cellType)).as("cells"))

    puts.unionByName(deletes)
  }
}
