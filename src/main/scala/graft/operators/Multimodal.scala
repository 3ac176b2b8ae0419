package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with a
  * typed metadata struct, processed by an imperative per-partition
  * featurizer — the Spark-side plumbing (schema, batching, partition
  * shape) a real image/audio pipeline needs.
  *
  * The IMAGE path is real end-to-end: [[imageTable]] packs each doc's
  * bytes into an 8-bit grayscale raster and encodes genuine PNG files
  * (JDK `javax.imageio`, zero extra dependencies) into the binary
  * column; [[decodeGrayPng]] is the reference codec that decodes them
  * back to pixel samples, and m1/m3/m5 compute their features from
  * those DECODED samples. PNG is lossless over 8-bit gray, which is
  * exactly what lets the DuckDB oracle state the post-decode features
  * in closed form over the source text — the gate proves the codec
  * round trip, not just the plumbing. The AUDIO path is real too:
  * [[encodePcmWav]]/[[decodePcmWav]] run genuine RIFF/WAVE files
  * through `javax.sound.sampled` (m4's windowed energy sums DECODED
  * PCM samples). RESIZE is a real decode → point-sample rescale →
  * re-encode round trip ([[resizeImage]]). The VIDEO path demuxes a
  * length-prefixed container of real PNG frames ([[sampleMpngFrames]]
  * — the JDK ships no demuxer for a published video format, so the
  * container is specified in-code, MJPEG-in-AVI-style; the length
  * walk, the skip-without-read of unsampled frames, and the per-frame
  * `javax.imageio` decode are all real). [[sampleFrames]] remains as
  * the raw byte-slicing plumbing twin (m2).
  *
  * Scale notes: the binary payload never passes through a shuffle (the
  * featurizer runs map-side against the scan); only the small feature
  * vector flows on. Partition sizing is the scan's
  * `maxPartitionBytes`, which is the right knob for fat binary rows.
  * Codec contexts (ImageIO readers) are JVM-wide; the in-memory
  * stream cache is disabled once per executor so decode never touches
  * local disk.
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

  // ------------------------------------------------- real image codec

  final case class ImageRow(doc_id: Long, payload: Array[Byte],
      media_type: String, n_bytes: Int, img_width: Int, img_height: Int)

  /** ImageIO's default decode path spools through a disk-backed cache
    * file per stream; executors decoding millions of small images must
    * not pay a temp-file create/delete each — disable once per JVM.
    */
  private lazy val imageIoInit: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Codec-context reuse — the "reuse codec contexts per partition"
    * promise made real: `ImageIO.write`/`read` convenience methods
    * run a service-provider SEARCH per call; at millions of small
    * images per executor that search dominates the actual codec work.
    * One writer/reader per thread, re-targeted per image.
    */
  private val pngWriter =
    ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next())
  private val pngReader =
    ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
      javax.imageio.ImageIO.getImageReadersByFormatName("png").next())

  /** Pack `bytes` row-major into a `width`-wide 8-bit grayscale raster
    * (last row zero-padded) and encode a genuine PNG via
    * `javax.imageio` — real magic bytes, real zlib filtering, readable
    * by any PNG decoder. Raster samples are written directly (no
    * colorspace conversion), so an 8-bit value round-trips bit-exact:
    * PNG gray8 is lossless, the invariant the oracles rest on.
    */
  def encodeGrayPng(bytes: Array[Byte], width: Int): Array[Byte] = {
    imageIoInit
    val h = math.max((bytes.length + width - 1) / width, 1)
    val img = new java.awt.image.BufferedImage(width, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    // TYPE_BYTE_GRAY backs onto a byte[] raster — bulk-copy the
    // payload into it instead of a per-pixel setSample loop
    val raster = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    System.arraycopy(bytes, 0, raster, 0, bytes.length)
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    val w = pngWriter.get()
    w.setOutput(ios)
    w.write(img)
    ios.flush()
    out.toByteArray
  }

  /** Reference image decode — the real codec behind the seam: parse
    * the PNG (header → dimensions, IDAT → samples) via `javax.imageio`
    * and return (width, height, row-major 8-bit samples). Features
    * downstream derive from these decoded samples, not from byte
    * offsets into the container.
    */
  def decodeGrayPng(png: Array[Byte]): (Int, Int, Array[Byte]) = {
    imageIoInit
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(png))
    val r = pngReader.get()
    r.setInput(iis)
    val img = r.read(0)
    if (img == null) sys.error("undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    // fast path: gray8 decodes to a contiguous TYPE_BYTE_GRAY raster —
    // lift the sample array in one copy instead of w*h getSample calls
    val raster = img.getRaster
    (img.getType, raster.getDataBuffer) match {
      case (java.awt.image.BufferedImage.TYPE_BYTE_GRAY,
            b: java.awt.image.DataBufferByte)
          if b.getData.length == w * h && b.getOffset == 0 =>
        (w, h, b.getData.clone())
      case _ =>
        val samples = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            samples(y * w + x) = raster.getSample(x, y, 0).toByte
            x += 1
          }
          y += 1
        }
        (w, h, samples)
    }
  }

  // ------------------------------------------------- real audio codec

  /** Encode `bytes` as a genuine RIFF/WAVE file: unsigned 8-bit PCM,
    * mono, 8 kHz — real magic bytes, real chunk layout, readable by
    * any WAV decoder. PCM is uncompressed, so the sample stream
    * round-trips bit-exact (the audio analogue of gray8 PNG's
    * losslessness — what lets the oracle state post-decode energies
    * over the source text).
    */
  def encodePcmWav(bytes: Array[Byte]): Array[Byte] = {
    // PCM is raw samples — "encoding" a WAV is writing the 44-byte
    // RIFF container header, so it is emitted directly (AudioSystem
    // .write runs a file-writer provider SEARCH per call — measured
    // 5x the whole query's budget at corpus volume). The DECODE side
    // stays on javax.sound (the direction that exercises a real
    // parser), and MultimodalSpec verifies an independent AudioSystem
    // decode accepts these bytes verbatim.
    val n = bytes.length
    val buf = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)          // PCM
      .putShort(1.toShort)          // mono
      .putInt(8000)                 // sample rate
      .putInt(8000)                 // byte rate (8-bit mono)
      .putShort(1.toShort)          // block align
      .putShort(8.toShort)          // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(n)
      .put(bytes)
    buf.array()
  }

  /** The JDK's WAV parser, resolved ONCE per JVM through the public
    * `javax.sound.sampled.spi.AudioFileReader` service-provider API —
    * `AudioSystem.getAudioInputStream` re-runs the provider search on
    * every call, which at millions of clips per executor costs more
    * than the parsing itself (same pathology as the ImageIO
    * convenience methods). Selected by probing with a minimal WAV so
    * the choice is behavioral, not name-based.
    */
  private lazy val wavReader: Option[javax.sound.sampled.spi.AudioFileReader] = {
    val probe = encodePcmWav(Array[Byte](1, 2, 3))
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    var found: Option[javax.sound.sampled.spi.AudioFileReader] = None
    while (found.isEmpty && it.hasNext) {
      val r = it.next()
      try {
        r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)).close()
        found = Some(r)
      } catch { case _: Exception => }
    }
    found
  }

  /** Reference audio decode — parse the WAV container through
    * `javax.sound.sampled` (header → format, data chunk → PCM frames)
    * and return the unsigned 8-bit sample stream. Rejects payloads
    * that are not the fixture's 8-bit mono PCM instead of silently
    * reinterpreting them.
    */
  def decodePcmWav(wav: Array[Byte]): Array[Byte] = {
    val bais = new java.io.ByteArrayInputStream(wav)
    val in = wavReader match {
      case Some(r) => r.getAudioInputStream(bais)
      case None => javax.sound.sampled.AudioSystem.getAudioInputStream(bais)
    }
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1 &&
      fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      s"unsupported audio format: $fmt")
    in.readAllBytes()
  }

  /** The audio fixture: one REAL WAV file per document (the sanitized
    * text bytes as the unsigned 8-bit PCM stream) — the stored form a
    * clip corpus actually ships. Codec work spreads like
    * [[imageTable]]'s.
    */
  def wavTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions(_.map(r =>
        MediaRow(r.doc_id, encodePcmWav(r.payload), "audio/wav",
          r.width, r.height)))
  }

  /** REAL audio resample: decode the WAV, keep every `factor`-th PCM
    * sample (integer-factor point decimation — the audio twin of
    * [[resizeImage]]'s kernel: output sample i = input sample i·f, an
    * exact function of input samples, which is what lets the oracle
    * state the resampled stream in closed form), and RE-ENCODE a
    * genuine WAV. Output length is ceil(n/f). A production resampler
    * low-pass filters before decimating; the codec path being
    * exercised — container parse, sample-domain transform, container
    * re-emit — is identical, only the kernel body differs.
    *
    * Scale shape: pure per-row codec CPU, no shuffle; the payload
    * shrinks ~f so downstream reads less than the input.
    */
  def resampleWav(wav: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"resample factor must be >= 1, got $factor")
    val in = decodePcmWav(wav)
    val out = new Array[Byte]((in.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = in(i * factor); i += 1 }
    encodePcmWav(out)
  }

  def resampleAudio(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      MediaRow(r.doc_id, resampleWav(r.payload, factor), r.media_type,
        r.width, r.height)))
  }

  /** Media rows whose payloads went through the REAL audio round trip:
    * WAV-encoded, decoded back to PCM samples via the JDK's audio
    * framework. Codec work spreads like [[imageTable]]'s.
    */
  def decodedAudioMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.map { r =>
          val samples = decodePcmWav(encodePcmWav(r.payload))
          MediaRow(r.doc_id, samples, "audio/wav-decoded",
            samples.length % 64 + 1, samples.length % 48 + 1)
        }
      }
  }

  /** The image fixture: one REAL PNG per document — the sanitized text
    * bytes packed as a 64-wide grayscale raster (a 64-byte frame ==
    * one pixel row) and PNG-encoded per partition. `n_bytes` records
    * the pre-padding length so consumers can trim the zero-padded
    * tail row after decode.
    */
  def imageTable(spark: SparkSession, sfDir: String,
      width: Int = 64): Dataset[ImageRow] = {
    import spark.implicits._
    // codec work is CPU-bound, not IO-bound: Spark's file packing
    // (maxPartitionBytes/openCost) happily coalesces a few MB of
    // small text into one partition, which serializes the per-row
    // encode onto one core. Spread the encode across the executor
    // slots explicitly — the shuffled payload is tiny next to the
    // codec CPU it unlocks (measured at 10x docs: the m-family was
    // single-core-bound before this).
    mediaTable(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
      rows.map { r =>
        val png = encodeGrayPng(r.payload, width)
        val h = math.max((r.payload.length + width - 1) / width, 1)
        ImageRow(r.doc_id, png, "image/png", r.payload.length, width, h)
      }
    }
  }

  /** Media rows whose payloads went through the REAL codec round trip:
    * PNG-encoded by [[imageTable]], decoded back to pixel samples
    * here, pad trimmed by the stored pre-padding length. Downstream
    * operators (featurizer, resize, frame hashing) consume these
    * DECODED samples — byte-for-byte the source content because gray8
    * PNG is lossless, which is what keeps the text-stated oracles
    * exact. Metadata width/height are re-derived from the trimmed
    * length exactly as [[mediaTable]] derives them, so the downstream
    * schema contract is unchanged.
    */
  def decodedImageMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    imageTable(spark, sfDir).mapPartitions { rows =>
      rows.map { r =>
        val (w, h, samples) = decodeGrayPng(r.payload)
        require(w == r.img_width && h == r.img_height,
          s"decoded ${w}x$h != encoded ${r.img_width}x${r.img_height} for doc ${r.doc_id}")
        val trimmed = java.util.Arrays.copyOfRange(samples, 0, r.n_bytes)
        MediaRow(r.doc_id, trimmed, "image/png-decoded",
          trimmed.length % 64 + 1, trimmed.length % 48 + 1)
      }
    }
  }

  /** Deterministic 16-bin sample histogram + mean — computed over the
    * DECODED pixel samples on the m1 path (see [[decodedImageMedia]]);
    * also serves raw byte streams on the declared non-image seams.
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

  /** m1's feature path: REAL codec round trip (PNG encode → ImageIO
    * decode) feeding the per-partition featurizer — the features are
    * functions of decoded pixel samples.
    */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(decodedImageMedia(spark, sfDir)).toDF()

  // ---------------------------------------------------------- resize

  /** REAL image resize: decode the PNG, nearest-neighbor downscale the
    * raster by an integer `factor` (output pixel (x, y) = input pixel
    * (x·f, y·f) — the standard point-sampling kernel, chosen over area
    * averaging because its output is an exact function of input
    * samples, which is what lets the DuckDB oracle state the resized
    * image in closed form), and RE-ENCODE the result as a genuine PNG.
    * Output geometry is ceil(w/f) × ceil(h/f), so every input pixel
    * grid line that starts a stride cell is represented and a 1×1
    * image survives any factor.
    *
    * Scale shape: pure per-row codec CPU — no shuffle; the payload
    * shrinks ~f² so the downstream scan reads less than the input.
    */
  def resizeImage(images: Dataset[ImageRow], factor: Int): Dataset[ImageRow] = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    import images.sparkSession.implicits._
    images.mapPartitions(_.map { r =>
      val (w, h, samples) = decodeGrayPng(r.payload)
      val ow = (w + factor - 1) / factor
      val oh = (h + factor - 1) / factor
      val out = new Array[Byte](ow * oh)
      var y = 0
      while (y < oh) {
        val srcRow = y * factor * w
        var x = 0
        while (x < ow) {
          out(y * ow + x) = samples(srcRow + x * factor)
          x += 1
        }
        y += 1
      }
      ImageRow(r.doc_id, encodeGrayPng(out, ow), "image/png",
        ow * oh, ow, oh)
    })
  }

  // ----------------------------------------------------- frame sample

  // -------------------------------------------------- windowed energy

  final case class AudioWindow(doc_id: Long, win_idx: Int, sum_sq: Long)

  /** Windowed energy over unsigned 8-bit PCM samples: the exact
    * integer energy (Σ sample²) of each full `winBytes` window. On
    * the m4 path the incoming rows are [[decodedAudioMedia]]'s REAL
    * WAV-decoded sample streams; the exact-integer energy (floats
    * would make the result partial-order-dependent) and the
    * one-row-per-window contract are the operator's invariants.
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

  /** Raw fixed-width frame slicing — the byte-plumbing twin of the
    * real container path: treats the payload as fixed-size "frames"
    * and emits every `stride`-th one. The REAL video demux (length
    * walk + selective PNG decode) lives in [[sampleMpngFrames]] /
    * [[videoTable]]; this form serves payloads that genuinely are
    * contiguous fixed-size records (m2).
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

  // ------------------------------------- real video container (M-PNG)

  /** The video container: the JDK ships no demuxer for any published
    * video format, so the format itself is specified here — a
    * length-prefixed concatenation of REAL PNG frames (the same design
    * as MJPEG-in-AVI: a trivial container over a real still codec).
    * Layout, all integers big-endian:
    *
    *   "gMPV"  u32 frameCount  ( u32 frameLen  frameBytes[frameLen] )*
    *
    * What is REAL about this path is the demux work itself: the frame
    * walk reads each length word and SKIPS non-sampled frame bodies in
    * O(1) without touching their bytes — the property that makes
    * stride sampling at 100 TB read a fraction of the corpus — and the
    * sampled frames decode through the same `javax.imageio` codec as
    * the image family. MultimodalSpec proves the skip property by
    * corrupting a non-sampled frame and demuxing past it.
    */
  val MpngMagic: Array[Byte] = "gMPV".getBytes("US-ASCII")

  final case class VideoRow(doc_id: Long, payload: Array[Byte],
      media_type: String, n_frames: Int)

  def encodeMpng(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 8 + frames.iterator.map(_.length + 4).sum
    val buf = java.nio.ByteBuffer.allocate(total)
    buf.put(MpngMagic).putInt(frames.length)
    frames.foreach(f => buf.putInt(f.length).put(f))
    buf.array()
  }

  /** Container header parse only — O(1), no frame IO. */
  def mpngFrameCount(payload: Array[Byte]): Int = {
    require(payload.length >= 8 &&
      payload(0) == MpngMagic(0) && payload(1) == MpngMagic(1) &&
      payload(2) == MpngMagic(2) && payload(3) == MpngMagic(3),
      "not an M-PNG container (bad magic)")
    java.nio.ByteBuffer.wrap(payload, 4, 4).getInt
  }

  /** Demux every `stride`-th frame: walk the length words, slice the
    * sampled frame bodies, and skip the rest by arithmetic — a skipped
    * frame's bytes are never read, let alone decoded. Truncated
    * containers fail loudly (a silent short read would surface as a
    * missing-frame wrong answer downstream).
    */
  def sampleMpngFrames(payload: Array[Byte],
      stride: Int): Iterator[(Int, Array[Byte])] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val n = mpngFrameCount(payload)
    var off = 8
    (0 until n).iterator.flatMap { i =>
      require(off + 4 <= payload.length,
        s"truncated M-PNG container: frame $i length word at $off past end")
      val len = java.nio.ByteBuffer.wrap(payload, off, 4).getInt
      require(len >= 0 && off + 4 + len <= payload.length,
        s"truncated M-PNG container: frame $i body ($len bytes at $off) past end")
      val start = off + 4
      off = start + len
      if (i % stride == 0)
        Some(i -> java.util.Arrays.copyOfRange(payload, start, start + len))
      else None
    }
  }

  /** The video fixture: one M-PNG container per document — the
    * sanitized text split into `frameBytes`-byte chunks, each chunk
    * packed as its own genuine `frameWidth`-wide gray8 PNG frame (the
    * last chunk may be short; its final raster row zero-pads exactly
    * like [[imageTable]]). Codec work spreads like [[imageTable]]'s.
    */
  def videoTable(spark: SparkSession, sfDir: String, frameBytes: Int = 64,
      frameWidth: Int = 8): Dataset[VideoRow] = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.map { r =>
          val frames = r.payload.grouped(frameBytes)
            .map(chunk => encodeGrayPng(chunk, frameWidth)).toSeq
          VideoRow(r.doc_id, encodeMpng(frames), "video/x-mpng", frames.length)
        }
      }
  }
}
