package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata carried alongside an opaque media payload. */
final case class MediaMeta(kind: String, encoding: String, declaredBytes: Long)

/** One media row: the payload is an opaque binary column — the engine
  * never interprets it except inside the (pluggable) decoder.
  */
final case class MediaRow(doc_id: Long, media: Array[Byte], meta: MediaMeta)

/** Extracted per-media features. `feature_vec` is what a real decoder
  * would emit (CNN embedding, mel spectrogram stats, ...).
  */
final case class MediaFeatures(
    doc_id: Long,
    n_bytes: Int,
    n_chunks: Int,
    head_hex: String,
    feature_vec: Array[Float])

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata struct, with decode / feature-extraction as
  * a partition-local typed transformation.
  *
  * The Spark-side shape is the real thing — schema, encoders, batch
  * iteration via mapPartitions (one decoder instance per partition, the
  * same pattern a JNI codec or ONNX session would need). Only the codec
  * itself is STUBBED (this container has no image/audio libraries): see
  * [[decodeStub]], which derives deterministic fake features from the
  * bytes so the pipeline is end-to-end testable.
  */
object Multimodal {

  /** Wrap a text table as a media table (text bytes standing in for real
    * blobs; with real data this would be `spark.read.format("binaryFile")`
    * or a parquet `binary` column).
    */
  def asMediaTable(documents: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    documents
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        struct(
          lit("text").as("kind"),
          lit("utf-8").as("encoding"),
          octet_length(encode(col("text"), "UTF-8")).cast("long").as("declaredBytes"))
          .as("meta"))
      .as[MediaRow]
  }

  /** STUB decoder: a real implementation would decode the codec here
    * (e.g. JPEG -> pixels -> resize -> embed; PCM -> mel features;
    * video -> frame sample). This stand-in derives deterministic
    * features from the raw bytes so tests exercise the full pipeline:
    * partition-local batching, one "decoder" per partition, typed output.
    */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    // Per-partition decoder init would go here (expensive handle, reused
    // across the partition's rows — NOT per row).
    rows.map { r =>
      val bytes = r.media
      val nBytes = bytes.length
      val nChunks = (nBytes + 1023) / 1024
      val headHex = bytes.take(8).map(b => f"$b%02X").mkString
      // Fake "embedding": 4 byte-histogram moments. Deterministic stand-in
      // for the real feature extractor (???).
      val hist = new Array[Long](8)
      var i = 0
      while (i < nBytes) { hist((bytes(i) & 0xff) >> 5) += 1; i += 1 }
      val vec = hist.take(4).map(h => if (nBytes == 0) 0f else h.toFloat / nBytes)
      MediaFeatures(r.doc_id, nBytes, nChunks, headHex, vec)
    }
  }

  /** Full pipeline: media table -> partition-local decode -> features.
    * `mapPartitions` (not `map`) so decoder setup amortizes across the
    * partition — the shape that matters when the decoder is a native
    * library session.
    */
  def extractFeatures(documents: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    asMediaTable(documents).mapPartitions(decodeStub)
  }

  /** One sampled frame of a chunked media payload. */
  final case class FrameSample(
      doc_id: Long, frame_idx: Int, frame_off: Int, frame_len: Int, frame_md5: String)

  /** One cell of a fixed-size "thumbnail" (byte-level downsample). */
  final case class ThumbCell(doc_id: Long, seg: Int, value: Double)

  private def rnd4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  /** Frame sampling: treat the payload as fixed-size frames and keep a
    * uniform-stride sample (the video keyframe-sampling shape). A real
    * codec would decode container frames; the chunking/stride/identity
    * plumbing here is the real distributed shape and is oracle-checked
    * on the byte level (frame md5s).
    */
  def frameSample(
      documents: DataFrame,
      frameBytes: Int = 256,
      targetFrames: Int = 8)(implicit spark: SparkSession): Dataset[FrameSample] = {
    import spark.implicits._
    val fb = frameBytes; val tf = targetFrames
    asMediaTable(documents).flatMap { r =>
      val n = r.media.length
      val nF = (n + fb - 1) / fb
      val stride = math.max(1, (nF + tf - 1) / tf)
      (0 until nF by stride).map { i =>
        val off = i * fb
        val len = math.min(fb, n - off)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(java.util.Arrays.copyOfRange(r.media, off, off + len))
          .map(b => f"$b%02x").mkString
        FrameSample(r.doc_id, i, off, len, md)
      }
    }
  }

  /** Byte-level resize: downsample the payload to `segments` cells, each
    * the mean byte value of its contiguous slice — the deterministic
    * stand-in for pixel-space resampling, with the same partitioning and
    * output shape (one narrow pass, exploded cells so the oracle compares
    * scalars, assembled back into a vector with collect_list downstream).
    */
  def resizeBytes(
      documents: DataFrame,
      segments: Int = 16)(implicit spark: SparkSession): Dataset[ThumbCell] = {
    import spark.implicits._
    val segs = segments
    asMediaTable(documents).flatMap { r =>
      val n = r.media.length
      (0 until segs).map { s =>
        val lo = (s * n) / segs
        val hi = ((s + 1) * n) / segs
        val v =
          if (hi > lo) {
            var sum = 0L; var j = lo
            while (j < hi) { sum += (r.media(j) & 0xff); j += 1 }
            rnd4(sum.toDouble / (hi - lo))
          } else 0.0
        ThumbCell(r.doc_id, s, v)
      }
    }
  }
}
