package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with a
  * typed metadata struct, processed by an imperative per-partition
  * featurizer — the Spark-side plumbing (schema, batching, partition
  * shape) a real image/audio pipeline needs.
  *
  * The actual media *decode* is the only non-real piece: no codec
  * libraries exist in this environment, so [[decodeStub]] is a
  * clearly-marked deterministic stand-in (byte histogram). Swapping it
  * for a JPEG/PNG decoder changes nothing outside that one function —
  * the Dataset schema, the mapPartitions batch shape, and the
  * downstream aggregation contract all stay as they are.
  *
  * Scale notes: the binary payload never passes through a shuffle (the
  * featurizer runs map-side against the scan); only the small feature
  * vector flows on. Partition sizing is the scan's
  * `maxPartitionBytes`, which is the right knob for fat binary rows.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte],
      media_type: String, width: Int, height: Int)
  final case class MediaFeatures(doc_id: Long, n_bytes: Long,
      byte_hist: Array[Long], mean_byte: Double)

  /** Synthesize a media table from `documents`: UTF-8 bytes stand in
    * for the opaque payload; metadata derived deterministically.
    *
    * The payload is sanitized to printable ASCII first so one byte ==
    * one character == one codepoint. The byte-level operators (frames,
    * resize, windowed energy) are compared against substr-arithmetic
    * oracles over the text; without the sanitization a single
    * multi-byte UTF-8 char would silently shift every byte offset
    * relative to the oracle's character offsets.
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id"),
        encode(regexp_replace(col("text"), "[^\\x20-\\x7E]", "?"), "UTF-8")
          .as("payload"),
        lit("image/fake").as("media_type"),
        (col("n_chars") % 64 + 1).cast("int").as("width"),
        (col("n_chars") % 48 + 1).cast("int").as("height"))
      .as[MediaRow]
  }

  /** STUB decode ??? — stands in for the real codec: deterministic
    * 16-bin byte histogram + mean byte value. A real implementation
    * would decode `payload` per `media_type` and emit pixel/sample
    * features; it replaces ONLY this function body.
    */
  def decodeStub(payload: Array[Byte]): (Array[Long], Double) = {
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      hist(b % 16) += 1
      sum += b
      i += 1
    }
    (hist, if (payload.length == 0) 0.0 else sum.toDouble / payload.length)
  }

  /** Per-partition featurization — the imperative boundary. Batching
    * is per-partition (a real decoder would reuse codec contexts per
    * partition exactly here).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (hist, mean) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.payload.length.toLong, hist, mean)
      }
    }
  }

  def features(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaTable(spark, sfDir)).toDF()

  // ---------------------------------------------------------- resize

  final case class ResizedMedia(doc_id: Long, payload: Array[Byte],
      width: Int, height: Int)

  /** STUB resize ??? — downsamples the payload by keeping every n-th
    * byte (a real implementation decodes, rescales pixels, re-encodes;
    * it replaces only this body — the schema and partition shape are
    * the contract).
    */
  def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  def resize(media: Dataset[MediaRow], factor: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => ResizedMedia(r.doc_id,
      resizeStub(r.payload, factor),
      math.max(r.width / factor, 1), math.max(r.height / factor, 1))))
  }

  // ----------------------------------------------------- frame sample

  // -------------------------------------------------- windowed energy

  final case class AudioWindow(doc_id: Long, win_idx: Int, sum_sq: Long)

  /** STUB audio decode ??? — treats payload bytes as unsigned 8-bit
    * PCM samples and emits the exact integer energy (Σ sample²) of
    * each full `winBytes` window. A real audio path decodes the
    * container to PCM first and replaces only that read; the windowed
    * flatMap shape, the exact-integer energy (floats would make the
    * result partial-order-dependent), and the one-row-per-window
    * contract stay.
    */
  def windowEnergy(media: Dataset[MediaRow], winBytes: Int): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val nWins = r.payload.length / winBytes
      (0 until nWins).map { wi =>
        var s = 0L
        var i = wi * winBytes
        val end = (wi + 1) * winBytes
        while (i < end) {
          val b = (r.payload(i) & 0xff).toLong
          s += b * b
          i += 1
        }
        AudioWindow(r.doc_id, wi, s)
      }
    }
  }

  // ----------------------------------------------------- frame sample

  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB frame sampling ??? — treats the payload as fixed-size
    * "frames" and emits every `stride`-th one (a real video path
    * demuxes; same flatMap shape, one row per sampled frame).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int,
      stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val nFrames = r.payload.length / frameBytes
      (0 until nFrames by stride).map { f =>
        Frame(r.doc_id, f,
          java.util.Arrays.copyOfRange(r.payload, f * frameBytes, (f + 1) * frameBytes))
      }
    }
  }

  /** The SAME sampling as [[sampleFrames]] expressed as a native
    * generator — `explode(sequence(0, nFrames-1, stride))` + substring
    * arithmetic — so the hot path stays inside whole-stage codegen
    * with no typed-encoder round trip (the flatMap costs an
    * InternalRow⇄object conversion per row that a 100 TB frame scan
    * cannot afford when the "decode" is pure byte slicing).
    * [[sampleFrames]] remains the documented codec seam: a real
    * demuxer replaces its body and pays the object boundary because it
    * must; THIS is the plumbing to run when it needn't.
    * MultimodalSpec proves the two produce identical frames.
    */
  def sampleFramesNative(media: Dataset[MediaRow], frameBytes: Int,
      stride: Int): DataFrame =
    media.toDF()
      .withColumn("_nf",
        (octet_length(col("payload")) / lit(frameBytes)).cast("int"))
      .filter(col("_nf") > 0)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), col("_nf") - 1, lit(stride))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)")
          .as("frame"))
}
