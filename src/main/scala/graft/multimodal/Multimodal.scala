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

  /** Fabricates media rows from `documents` (payload = UTF-8 bytes), runs
    * the partition-batched decode, returns features. The stub decode's
    * byte statistics are independently recomputable from the source text,
    * so the whole binary-column + mapPartitions path is ORACLE-GATED: the
    * DuckDB twin re-derives every output column (char-code sums stand in
    * for byte sums — the corpus is ASCII), and a drift anywhere in the
    * Dataset encode → partition-batch → decode loop breaks the hash. */
  val multimodalIngest: Q = Q.sql(
    "multimodal_ingest",
    """SELECT doc_id,
      |  ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |  length(text) AS byte_len,
      |  CAST(list_sum(list_transform(range(1, length(text) + 1),
      |    i -> ascii(text[i]))) AS BIGINT) AS byte_sum,
      |  CAST(length(text) // 256 + 1 AS INT) AS n_frames,
      |  CAST(64 + n_chars % 512 AS INT) AS width,
      |  CAST(64 + doc_id % 512 AS INT) AS height
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
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
