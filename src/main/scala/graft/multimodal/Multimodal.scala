package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Entry

/** Multimodal-column plumbing — SURVEY.md Q65 + the training-pipeline
  * decode/feature-extract path.
  *
  * Media payloads are opaque `binary` columns inside a typed struct
  * `mm(kind, text, bytes, vec)`; modality dispatch is plain `CASE WHEN`
  * so Catalyst prunes/pushes around it. The decode step is a typed
  * `mapPartitions` pipeline (batch-shaped like a real image/audio decode);
  * the actual codec is a DETERMINISTIC FAKE (this container has no media
  * libraries — SURVEY.md north-star note): it derives "features" from byte
  * lengths only. The Spark-side plumbing (schema, encoders, partition
  * batching) is real and oracle-checked.
  */
object Multimodal {

  private def T(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** The multimodal view: documents joined with their embeddings, payload
    * as binary, modality assigned deterministically by id. */
  def mmView(s: SparkSession, d: String): DataFrame = {
    val docs = T(s, d, "documents")
    val emb = T(s, d, "embeddings")
    docs.join(emb, col("vec_id") === col("doc_id"), "left")
      .select(col("doc_id"),
        struct(
          when(col("doc_id") % 3 === 0, "text")
            .when(col("doc_id") % 3 === 1, "image")
            .otherwise("audio").as("kind"),
          when(col("doc_id") % 3 === 0, col("text")).as("text"),
          when(col("doc_id") % 3 =!= 0, encode(col("text"), "UTF-8")).as("bytes"),
          col("embedding").as("vec")).as("mm"))
  }

  case class MmRow(doc_id: Long, kind: String, n_bytes: Int)
  case class MmFeature(doc_id: Long, kind: String, n_bytes: Int,
                       width: Int, height: Int, n_frames: Int)

  case class MmTransformed(doc_id: Long, kind: String,
                           out_w: Int, out_h: Int, n_sampled: Int)

  /** Stand-in for a real decoder binding (libjpeg/ffmpeg/JNI): stateful
    * per-partition handle + batch-in/batch-out API. The arithmetic is a
    * DETERMINISTIC FAKE of decode/resize/frame-sample — swap the bodies
    * for the real codec calls; the Spark plumbing stays identical. */
  object FakeCodec {
    final class Handle private[FakeCodec] () {
      def decodeBatch(batch: Seq[MmRow]): Seq[MmFeature] =
        batch.map { r =>
          val width = 1 + r.n_bytes % 64
          val height = 1 + r.n_bytes % 48
          val frames = if (r.kind == "audio") 1 + r.n_bytes % 30 else 1
          MmFeature(r.doc_id, r.kind, r.n_bytes, width, height, frames)
        }

      /** Aspect-preserving fit into maxW x maxH (integer floor scaling),
        * plus uniform frame sampling down to at most maxFrames. */
      def transformBatch(batch: Seq[MmFeature], maxW: Int, maxH: Int,
                         maxFrames: Int): Seq[MmTransformed] =
        batch.map { f =>
          val (outW, outH) =
            if (f.width <= maxW && f.height <= maxH) (f.width, f.height)
            else if (maxW.toLong * f.height <= maxH.toLong * f.width)
              (maxW, math.max(1, (f.height.toLong * maxW / f.width).toInt))
            else
              (math.max(1, (f.width.toLong * maxH / f.height).toInt), maxH)
          MmTransformed(f.doc_id, f.kind, outW, outH, math.min(maxFrames, f.n_frames))
        }
    }
    def open(): Handle = new Handle()
  }

  val entries: Seq[Entry] = Seq(

    Entry("q65_multimodal",
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'text'
        |            WHEN doc_id % 3 = 1 THEN 'image' ELSE 'audio' END AS kind,
        |  COUNT(*) AS n,
        |  COUNT(CASE WHEN doc_id % 3 = 0 THEN text END) AS n_text,
        |  COUNT(CASE WHEN doc_id % 3 <> 0 THEN text END) AS n_bytes_col,
        |  COUNT(e.vec_id) AS n_vec,
        |  CAST(SUM(CASE WHEN doc_id % 3 <> 0 THEN octet_length(CAST(text AS BLOB)) ELSE 0 END) AS BIGINT) AS total_bytes
        |FROM documents d LEFT JOIN embeddings e ON e.vec_id = d.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      mmView(s, d)
        .groupBy(col("mm.kind").as("kind"))
        .agg(count(lit(1)).as("n"),
             count(col("mm.text")).as("n_text"),
             count(col("mm.bytes")).as("n_bytes_col"),
             count(col("mm.vec")).as("n_vec"),
             coalesce(sum(length(col("mm.bytes"))), lit(0)).cast("bigint").as("total_bytes"))
        .orderBy(col("kind"))
    },

    // typed mapPartitions "decode": batch-shaped feature extraction whose
    // fake codec is pure arithmetic on byte length -> SQL-expressible oracle.
    Entry("q73_mm_decode",
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 1 THEN 'image' ELSE 'audio' END AS kind,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        |  CAST(1 + octet_length(CAST(text AS BLOB)) % 64 AS INT) AS width,
        |  CAST(1 + octet_length(CAST(text AS BLOB)) % 48 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + octet_length(CAST(text AS BLOB)) % 30 ELSE 1 END AS INT) AS n_frames
        |FROM documents WHERE doc_id % 3 <> 0 ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val payloads = mmView(s, d)
        .filter(col("mm.kind") =!= "text")
        .select(col("doc_id"), col("mm.kind").as("kind"),
                length(col("mm.bytes")).as("n_bytes"))
        .as[MmRow]
      // partition-batched decode stub, batch-shaped like a real codec
      // binding: one library/context init per partition, payloads pulled in
      // fixed-size batches (what a GPU/JNI decoder wants), rows emitted per
      // batch. The codec itself is the deterministic fake (no media libs in
      // this container); everything around it is the real plumbing.
      payloads.mapPartitions { rows =>
        val codec = FakeCodec.open()   // per-partition init (JNI/ctx analog)
        rows.grouped(64).flatMap { batch =>
          codec.decodeBatch(batch)
        }
      }.toDF()
        .select(col("doc_id"), col("kind"), col("n_bytes"),
                col("width"), col("height"), col("n_frames"))
        .orderBy(col("doc_id"))
    },

    // resize + frame-sample over the decoded features — the other half of
    // the training-pipeline media transform chain; same batch-shaped
    // codec-binding pattern, deterministic-fake arithmetic (aspect-fit
    // into 32x24, uniform sample to <= 8 frames) so the oracle replays it.
    Entry("q80_mm_transform",
      """WITH f AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 1 THEN 'image' ELSE 'audio' END AS kind,
        |    CAST(1 + octet_length(CAST(text AS BLOB)) % 64 AS INT) AS w,
        |    CAST(1 + octet_length(CAST(text AS BLOB)) % 48 AS INT) AS h,
        |    CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + octet_length(CAST(text AS BLOB)) % 30 ELSE 1 END AS INT) AS fr
        |  FROM documents WHERE doc_id % 3 <> 0)
        |SELECT doc_id, kind,
        |  CAST(CASE WHEN w <= 32 AND h <= 24 THEN w
        |       WHEN 32 * h <= 24 * w THEN 32
        |       ELSE GREATEST(1, (w * 24) // h) END AS INT) AS out_w,
        |  CAST(CASE WHEN w <= 32 AND h <= 24 THEN h
        |       WHEN 32 * h <= 24 * w THEN GREATEST(1, (h * 32) // w)
        |       ELSE 24 END AS INT) AS out_h,
        |  CAST(LEAST(8, fr) AS INT) AS n_sampled
        |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val payloads = mmView(s, d)
        .filter(col("mm.kind") =!= "text")
        .select(col("doc_id"), col("mm.kind").as("kind"),
                length(col("mm.bytes")).as("n_bytes"))
        .as[MmRow]
      payloads.mapPartitions { rows =>
        val codec = FakeCodec.open()
        rows.grouped(64).flatMap { batch =>
          codec.transformBatch(codec.decodeBatch(batch), 32, 24, 8)
        }
      }.toDF()
        .select(col("doc_id"), col("kind"), col("out_w"), col("out_h"), col("n_sampled"))
        .orderBy(col("doc_id"))
    }
  )
}
