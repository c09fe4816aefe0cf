package graft.multimodal

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque binary columns with typed
  * metadata, decoded/feature-extracted in partition-local batches.
  *
  * The decode step is a STUB — this container has no image/audio codecs —
  * implemented as a deterministic fake (byte statistics + frame count
  * derived from payload length). Everything around it is the real Spark
  * shape a 100 TB media pipeline needs: a `binary` payload column + typed
  * metadata schema, and per-partition batched iteration (the Scala
  * equivalent of `mapInPandas` batches) so a real decoder would amortize
  * model/codec init once per partition, not per row.
  */
object Multimodal {

  /** Input shape: one media object per row. */
  final case class MediaRow(
      doc_id: Long, media_type: String, payload: Array[Byte],
      width: Int, height: Int)

  /** Output shape of the (stubbed) decoder. */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, byte_len: Int, byte_sum: Long,
      n_frames: Int, width: Int, height: Int)

  /** STUB decoder — deterministic fake standing in for a codec call.
    * Real implementation would decode `payload` here, once-per-partition
    * init above the row loop. */
  private def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
      MediaFeatures(r.doc_id, r.media_type, r.payload.length, sum,
        n_frames = r.payload.length / 256 + 1, r.width, r.height)
    }

  /** Rows-only operator: fabricates media rows from `documents` (payload =
    * UTF-8 bytes), runs the partition-batched decode, returns features. */
  val multimodalIngest: Q = Q.rowsOnly("multimodal_ingest") { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"),
        (lit(64) + col("n_chars") % 512).cast("int").as("width"),
        (lit(64) + col("doc_id") % 512).cast("int").as("height"))
      .as[MediaRow]
      .mapPartitions(decodeBatch _)
      .toDF()
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(multimodalIngest)
}
