package graft.queries

import graft.operators.Multimodal
import graft.functions.XSql.{Duck => SqlDuck}

/** Multimodal featurization as catalog queries. The image family
  * (m1/m3/m5/m8) runs a REAL codec round trip: each doc's sanitized
  * ASCII bytes are packed into a genuine PNG ([[Multimodal.imageTable]],
  * `javax.imageio`) and the features are computed from the DECODED
  * pixel samples — gray8 PNG is lossless, so sample == byte ==
  * codepoint and the oracle states the post-decode result exactly in
  * SQL over the source text. m4 decodes real RIFF/WAVE audio
  * (`javax.sound.sampled`), m9 demuxes the M-PNG video container and
  * decodes its sampled frames, m3 re-encodes and re-decodes its
  * resized rasters; m2/m6/m7 exercise the raw binary plumbing.
  */
object MultimodalOps {

  /** Oracle twin of [[Multimodal.mediaTable]]'s payload sanitization:
    * printable ASCII only, so byte == character == codepoint and the
    * substr-arithmetic oracles line up with byte offsets on ANY input,
    * not just fixtures that happen to be ASCII.
    */
  private val SrcCte =
    "src AS (SELECT doc_id, regexp_replace(text, '[^\\x20-\\x7E]', '?', 'g') AS text FROM documents)"

  val all: Seq[Q] = Seq(
    Q("m1_media_features",
      "real PNG media column -> ImageIO decode -> mapPartitions featurizer over pixel samples",
      {
        implicit val dl: SqlDuck.type = SqlDuck
        val chars = dl.chars("text")
        val hist = dl.xform(dl.seq0("16"), "k_",
          s"cast(${dl.arrSize(dl.filt(chars, "c_", "unicode(c_) % 16 = k_"))} as bigint)")
        val sum = dl.foldL(dl.xform(chars, "c_", dl.codepoint("c_")), 0,
          "a_", "x_", "a_ + x_")
        s"""WITH $SrcCte
           |SELECT doc_id, cast(length(text) as bigint) AS n_bytes,
           |  array_to_string(list_transform($hist, x_ -> cast(x_ as varchar)), ',') AS byte_hist_csv,
           |  cast($sum as double) / cast(length(text) as double) AS mean_byte
           |FROM src ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.functions._
      Multimodal.features(s, d)
        .select(col("doc_id"), col("n_bytes"),
          expr("array_join(transform(byte_hist, x_ -> cast(x_ as string)), ',')")
            .as("byte_hist_csv"),
          col("mean_byte"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // Frame sampling as a gate query: one row per sampled fixed-size
    // frame, produced by the NATIVE generator path (explode(sequence)
    // + substring — whole-stage codegen, no typed-encoder round trip;
    // Multimodal.sampleFrames keeps the flatMap shape solely as the
    // documented codec seam). The oracle states the same byte slicing
    // as substr arithmetic (payload == ASCII text bytes), and each
    // frame is content-hashed so the comparison covers the bytes,
    // not just the shape.
    Q("m2_frame_sample",
      "video-style frame sampling: every 2nd 64-byte frame, content-hashed",
      {
        implicit val dl: SqlDuck.type = SqlDuck
        val frame = "substr(text, frame_idx * 64 + 1, 64)"
        s"""WITH $SrcCte,
           |f AS (
           |  SELECT doc_id, text,
           |    unnest(list_filter(range(0, cast(floor(length(text) / 64) as bigint)),
           |                       i_ -> i_ % 2 = 0)) AS frame_idx
           |  FROM src)
           |SELECT doc_id, frame_idx,
           |  cast(length($frame) as bigint) AS frame_bytes,
           |  ${graft.functions.XSql.charHash(frame)} AS frame_hash
           |FROM f ORDER BY doc_id, frame_idx""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.functions._
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val frames = Multimodal.sampleFramesNative(
        Multimodal.mediaTable(s, d), frameBytes = 64, stride = 2)
      frames
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          expr("cast(length(frame) as bigint)").as("frame_bytes"),
          expr("graft_char_hash(decode(frame, 'UTF-8'))").as("frame_hash"))
        .orderBy("doc_id", "frame_idx")
    },

    // ---------------------------------------------------------------
    // Media near-dup by shared frame fingerprints — the video/image
    // dedup tier of a multimodal pipeline: every aligned 64-byte frame
    // is content-hashed, pairs sharing >= 2 frame hashes are flagged.
    // Scale shape: the pair discovery is an EQUI-JOIN on the frame
    // hash (identical copies and re-containered media collide on their
    // frames) — never an all-pairs media comparison; the per-pair
    // count is a groupBy on the matched hash rows only. The frames
    // are decoded PIXEL ROWS of each doc's real PNG (gray8 PNG is
    // lossless, payload == sanitized ASCII bytes), so the oracle
    // states the identical frames via substr arithmetic.
    Q("m5_media_near_dup",
      "image near-dup pairs: >= 2 shared decoded-pixel-row hashes (equi-join, never all-pairs)",
      {
        implicit val dl: SqlDuck.type = SqlDuck
        val frame = "substr(text, cast(i_ * 64 + 1 as bigint), 64)"
        s"""WITH $SrcCte,
           |f AS (
           |  SELECT doc_id,
           |    unnest(range(0, cast(floor(length(text) / 64) as bigint))) AS i_,
           |    text
           |  FROM src),
           |h AS (SELECT DISTINCT doc_id, ${graft.functions.XSql.charHash(frame)} AS fh
           |      FROM f)
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
           |FROM h a JOIN h b ON a.fh = b.fh AND a.doc_id < b.doc_id
           |GROUP BY 1, 2 HAVING count(*) >= 2
           |ORDER BY doc_a, doc_b""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.functions._
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      // DISTINCT fingerprints per doc BEFORE the join: n_shared counts
      // shared distinct frames (the stated semantics), and a frame
      // repeated within a doc (padding, black frames) cannot inflate
      // the pair's agg input nA x nB-fold.
      // decodedImageMedia: each 64-byte frame is one decoded PIXEL ROW
      // of the doc's real PNG (imageTable packs 64-wide rasters), so
      // the near-dup tier compares decoded image content
      val h = Multimodal.sampleFramesNative(
        Multimodal.decodedImageMedia(s, d), frameBytes = 64, stride = 1)
        .select(col("doc_id"),
          expr("graft_char_hash(decode(frame, 'UTF-8'))").as("fh"))
        .distinct()
      val a = h.select(col("doc_id").as("doc_a"), col("fh"))
      val b = h.select(col("doc_id").as("doc_b"), col("fh"))
      a.join(b, Seq("fh"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .orderBy("doc_a", "doc_b")
    },

    // ---------------------------------------------------------------
    // Audio-style windowed energy: payload bytes as unsigned 8-bit PCM,
    // one row per full 50-sample window with exact integer energy and
    // derived RMS + a silence flag. The energy is Σ sample² as a LONG —
    // exact, so the cross-engine contract holds bit-for-bit; RMS is a
    // fixed two-op IEEE derivation from it.
    Q("m4_audio_energy",
      "audio windowed RMS energy over REAL WAV payloads (javax.sound PCM decode)",
      {
        implicit val dl: SqlDuck.type = SqlDuck
        val win = "substr(text, win_idx * 50 + 1, 50)"
        val sumsq = dl.foldL(
          dl.xform(dl.chars(win), "c_", dl.codepoint("c_")),
          0, "a_", "x_", "a_ + x_ * x_")
        s"""WITH $SrcCte,
           |w AS (
           |  SELECT doc_id, text,
           |    unnest(range(0, cast(floor(length(text) / 50) as bigint))) AS win_idx
           |  FROM src)
           |SELECT doc_id, win_idx, $sumsq AS sum_sq,
           |  round(sqrt(cast($sumsq as double) / 50.0), 6) AS rms,
           |  sqrt(cast($sumsq as double) / 50.0) < 100.0 AS is_quiet
           |FROM w ORDER BY doc_id, win_idx""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.functions._
      import s.implicits._
      // decodedAudioMedia: the payload went through the REAL WAV
      // round trip (RIFF encode -> javax.sound PCM decode); the
      // windowed energy below sums DECODED samples — PCM is
      // uncompressed, so the text-stated oracle stays exact
      Multimodal.windowEnergy(Multimodal.decodedAudioMedia(s, d), winBytes = 50)
        .toDF()
        .select(col("doc_id"), col("win_idx").cast("long").as("win_idx"),
          col("sum_sq"),
          round(sqrt(col("sum_sq").cast("double") / 50.0), 6).as("rms"),
          (sqrt(col("sum_sq").cast("double") / 50.0) < 100.0).as("is_quiet"))
        .orderBy("doc_id", "win_idx")
    },

    // ---------------------------------------------------------------
    // REAL 2-D image resize as a gate query: decode the doc's PNG,
    // nearest-neighbor 3x downscale the 64-wide raster (out(y,x) =
    // in(3y,3x) over the zero-padded input), re-encode as PNG, then
    // DECODE THE RESIZED PNG AGAIN and gate its IHDR geometry plus an
    // exact sum and rolling hash of the decoded samples. The oracle
    // states the point-sampled raster in closed form over the source
    // text (gray8 PNG is lossless both ways), so equality proves the
    // full decode -> rescale -> re-encode -> decode chain.
    Q("m3_resize",
      "real image resize: decode -> 3x point-sample downscale -> PNG re-encode, gated on re-decoded samples",
      {
        implicit val dl: SqlDuck.type = SqlDuck
        // input sample (r_, c_) = codepoint(text[r_*64 + c_ + 1]) below
        // length, else the pad zero; output index i_ maps to input
        // (3*(i_ // 22), 3*(i_ % 22)) -> flat 192*(i_ // 22) + 3*(i_ % 22)
        val srcIdx = "(i_ // 22) * 192 + (i_ % 22) * 3"
        val vals = s"list_transform(range(0, 22 * oh), i_ -> " +
          s"CASE WHEN $srcIdx < length(text) " +
          s"THEN cast(unicode(substr(text, cast($srcIdx + 1 as bigint), 1)) as bigint) " +
          s"ELSE cast(0 as bigint) END)"
        val sum = dl.foldL("vals", 0, "a_", "x_", "a_ + x_")
        val hash = dl.foldL("vals", 0, "a_", "x_", "(a_ * 1000003 + x_) % 2147483647")
        s"""WITH $SrcCte,
           |g AS (SELECT doc_id, text,
           |        greatest(cast(ceil(length(text) / 64.0) as bigint), 1) AS h
           |      FROM src),
           |r AS (SELECT doc_id, text, cast(ceil(h / 3.0) as bigint) AS oh FROM g),
           |v AS (SELECT doc_id, oh, $vals AS vals FROM r)
           |SELECT doc_id, cast(22 as bigint) AS rw, oh AS rh,
           |  cast($sum as bigint) AS sample_sum,
           |  cast($hash as bigint) AS sample_hash
           |FROM v ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      import s.implicits._
      Multimodal.resizeImage(Multimodal.imageTable(s, d), factor = 3)
        .mapPartitions { rows =>
          rows.map { r =>
            val (w, h, samples) = Multimodal.decodeGrayPng(r.payload)
            var sum = 0L
            var hash = 0L
            var i = 0
            while (i < samples.length) {
              val v = samples(i) & 0xff
              sum += v
              hash = (hash * 1000003L + v) % 2147483647L
              i += 1
            }
            (r.doc_id, w.toLong, h.toLong, sum, hash)
          }
        }.toDF("doc_id", "rw", "rh", "sample_sum", "sample_hash")
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // REAL video-container demux as a gate query: each doc's text is
    // packed as an M-PNG container (length-prefixed real PNG frames,
    // 64 text bytes -> one 8-wide frame); the engine reads the frame
    // count from the container HEADER, length-walks to every 2nd
    // frame WITHOUT reading skipped frame bodies, and PNG-decodes only
    // the sampled frames — geometry from each frame's real IHDR, the
    // sample sum from its decoded raster (pad rows are zeros, so the
    // sum equals the chunk's codepoint sum and the oracle states it
    // exactly). Scale shape: demux is per-row CPU with no shuffle,
    // and stride sampling reads O(sampled frames) bytes, not O(video).
    Q("m9_video_demux",
      "M-PNG video demux: header frame count, every 2nd frame length-walked out and PNG-decoded",
      {
        implicit val dl: SqlDuck.type = SqlDuck
        val sum = dl.foldL(dl.xform(dl.chars("chunk"), "c_", dl.codepoint("c_")),
          0, "a_", "x_", "a_ + x_")
        s"""WITH $SrcCte,
           |f AS (SELECT doc_id, text,
           |        cast(ceil(length(text) / 64.0) as bigint) AS nf
           |      FROM src),
           |s_ AS (SELECT doc_id, nf, text,
           |         unnest(list_filter(range(0, nf), i_ -> i_ % 2 = 0)) AS frame_idx
           |       FROM f),
           |c AS (SELECT doc_id, nf, frame_idx,
           |        substr(text, cast(frame_idx * 64 + 1 as bigint), 64) AS chunk
           |      FROM s_)
           |SELECT doc_id, nf AS n_frames, frame_idx,
           |  cast(8 as bigint) AS frame_w,
           |  cast(ceil(length(chunk) / 8.0) as bigint) AS frame_h,
           |  cast($sum as bigint) AS sample_sum
           |FROM c ORDER BY doc_id, frame_idx""".stripMargin
      }) { (s, d) =>
      import s.implicits._
      Multimodal.videoTable(s, d).flatMap { v =>
        Multimodal.sampleMpngFrames(v.payload, stride = 2).map { case (idx, png) =>
          val (w, h, samples) = Multimodal.decodeGrayPng(png)
          var sum = 0L
          var i = 0
          while (i < samples.length) { sum += samples(i) & 0xff; i += 1 }
          (v.doc_id, v.n_frames.toLong, idx.toLong, w.toLong, h.toLong, sum)
        }
      }.toDF("doc_id", "n_frames", "frame_idx", "frame_w", "frame_h", "sample_sum")
        .orderBy("doc_id", "frame_idx")
    },

    // ---------------------------------------------------------------
    // REAL audio resample as a gate query — the audio twin of m3:
    // each doc's WAV (real RIFF container over its text bytes as
    // 8-bit PCM) is decoded, 3x point-decimated (output sample i =
    // input sample 3i), RE-encoded as a genuine WAV, then DECODED
    // AGAIN and gated on the re-decoded stream: sample count, exact
    // sum, rolling hash. PCM is uncompressed, so the oracle states
    // the decimated stream in closed form over the source text, and
    // equality proves the full parse -> transform -> re-emit -> parse
    // chain.
    Q("m10_audio_resample",
      "real audio resample: WAV decode -> 3x decimate -> WAV re-encode, gated on re-decoded PCM",
      {
        implicit val dl: SqlDuck.type = SqlDuck
        val idx = "i_ * 3"
        val vals = s"list_transform(range(0, cast(ceil(length(text) / 3.0) as bigint)), i_ -> " +
          s"cast(unicode(substr(text, cast($idx + 1 as bigint), 1)) as bigint))"
        val sum = dl.foldL("vals", 0, "a_", "x_", "a_ + x_")
        val hash = dl.foldL("vals", 0, "a_", "x_", "(a_ * 1000003 + x_) % 2147483647")
        s"""WITH $SrcCte,
           |v AS (SELECT doc_id,
           |        cast(ceil(length(text) / 3.0) as bigint) AS n_samples,
           |        $vals AS vals
           |      FROM src)
           |SELECT doc_id, n_samples,
           |  cast($sum as bigint) AS sample_sum,
           |  cast($hash as bigint) AS sample_hash
           |FROM v ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      import s.implicits._
      Multimodal.resampleAudio(Multimodal.wavTable(s, d), factor = 3)
        .mapPartitions { rows =>
          rows.map { r =>
            val pcm = Multimodal.decodePcmWav(r.payload)
            var sum = 0L
            var hash = 0L
            var i = 0
            while (i < pcm.length) {
              val v = pcm(i) & 0xff
              sum += v
              hash = (hash * 1000003L + v) % 2147483647L
              i += 1
            }
            (r.doc_id, pcm.length.toLong, sum, hash)
          }
        }.toDF("doc_id", "n_samples", "sample_sum", "sample_hash")
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // Inference batch packing — the multimodal twin of t12's context
    // packing: media items are packed greedily (deterministic doc_id
    // order) into 4096-BYTE inference batches per modality, the step
    // between a curated media corpus and a GPU featurization run. The
    // engine side measures the REAL binary column (octet_length of
    // the payload); the oracle states the same lengths over the
    // sanitized text (m1's byte == char contract). One running-sum
    // window per modality partition — the same shuffle the per-
    // modality groupBy needs anyway.
    Q("m6_inference_packing",
      "greedy 4096-byte inference-batch packing per modality: items/bytes per bin",
      {
        s"""WITH $SrcCte,
           |d AS (SELECT doc_id,
           |        CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
           |             ELSE 'video' END AS modality,
           |        cast(length(text) as bigint) AS n_bytes
           |      FROM src),
           |c AS (SELECT modality, n_bytes,
           |        sum(n_bytes) OVER (PARTITION BY modality ORDER BY doc_id
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
           |      FROM d WHERE n_bytes > 0)
           |SELECT modality,
           |  cast(floor(cast(run - 1 as double) / 4096) as bigint) AS bin,
           |  count(*) AS n_items, cast(sum(n_bytes) as bigint) AS total_bytes
           |FROM c GROUP BY 1, 2 ORDER BY modality, bin""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("modality").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Multimodal.mediaTable(s, d).toDF()
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("modality"),
          expr("cast(octet_length(payload) as bigint)").as("n_bytes"))
        .filter(col("n_bytes") > 0)
        .withColumn("run", sum(col("n_bytes")).over(w))
        .withColumn("bin", floor((col("run") - 1).cast("double") / 4096).cast("long"))
        .groupBy("modality", "bin")
        .agg(count(lit(1)).as("n_items"),
          sum(col("n_bytes")).cast("long").as("total_bytes"))
        .orderBy("modality", "bin")
    },

    // ---------------------------------------------------------------
    // Interleaved multimodal document assembly — the MMC4/OBELICS-
    // style step that turns (text, attachments) into ONE ordered
    // training sequence per document: the text splits into
    // non-overlapping 50-word chunks, the media payload splits into
    // 64-byte frames (m2's rule), and frame f is slotted after text
    // chunk (f mod n_chunks) — text at even positions, media at odd,
    // so the interleave is a pure integer rule both engines state
    // identically. Gated per doc: segment counts, the token total
    // (text words + a fixed 16 "patch tokens" per frame), and a
    // charHash fingerprint of the ordered T/M pattern string — the
    // fingerprint pins the ORDER of the assembled sequence, not just
    // its composition.
    // Scale: chunking and framing are narrow explodes; the pattern
    // fold is one per-doc sort of (pos, idx) structs — the same
    // shuffle the per-doc groupBy needs anyway.
    Q("m7_interleaved_docs",
      "ordered text-chunk x media-frame interleave per doc: counts, tokens, pattern hash",
      {
        implicit val dl: SqlDuck.type = SqlDuck
        val w = graft.functions.XSql.words("text")
        s"""WITH $SrcCte,
           |ws AS (SELECT doc_id, $w AS w,
           |              cast(length(text) as bigint) AS n_bytes
           |       FROM src),
           |base AS (SELECT doc_id, w,
           |    cast(floor((${dl.arrSize("w")} + 49) / 50.0) as bigint) AS nc,
           |    cast(floor((n_bytes + 63) / 64.0) as bigint) AS nf
           |  FROM ws),
           |tseg AS (SELECT doc_id, 2 * k AS pos, k AS idx, 'T' AS tag,
           |    cast(${dl.arrSize(dl.slice("w", "k * 50", 50))} as bigint) AS toks
           |  FROM base, (SELECT unnest(${dl.seq0("nc")}) AS k)),
           |mseg AS (SELECT doc_id,
           |    2 * (f % greatest(nc, 1)) + 1 AS pos, f AS idx, 'M' AS tag,
           |    cast(16 as bigint) AS toks
           |  FROM base, (SELECT unnest(${dl.seq0("nf")}) AS f)),
           |segs AS (SELECT * FROM tseg UNION ALL SELECT * FROM mseg)
           |SELECT doc_id,
           |  count(*) FILTER (tag = 'T') AS n_text_seg,
           |  count(*) FILTER (tag = 'M') AS n_media_seg,
           |  cast(sum(toks) as bigint) AS n_tokens,
           |  ${graft.functions.XSql.charHash(
              "string_agg(tag, '' ORDER BY pos, idx)")} AS pattern_hash
           |FROM segs GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.functions._
      import graft.functions.XSql
      import graft.functions.XSql.{Spark => dl}
      implicit val dlv: dl.type = dl
      graft.functions.GraftFunctions.register(s)
      val base = Multimodal.mediaTable(s, d).toDF()
        .select(col("doc_id"),
          expr(XSql.words("decode(payload, 'UTF-8')")).as("w"),
          expr("cast(octet_length(payload) as bigint)").as("n_bytes"))
        .withColumn("nc",
          floor((expr(dl.arrSize("w")) + lit(49)) / 50.0).cast("long"))
        .withColumn("nf",
          floor((col("n_bytes") + lit(63)) / 64.0).cast("long"))
      val tseg = base
        .select(col("doc_id"), col("w"), explode(expr(dl.seq0("nc"))).as("k"))
        .select(col("doc_id"), (col("k") * 2).as("pos"), col("k").as("idx"),
          lit("T").as("tag"),
          expr(dl.arrSize(dl.slice("w", "k * 50", 50))).cast("long").as("toks"))
      val mseg = base
        .select(col("doc_id"), col("nc"), explode(expr(dl.seq0("nf"))).as("f"))
        .select(col("doc_id"),
          (col("f") % greatest(col("nc"), lit(1L)) * 2 + 1).as("pos"),
          col("f").as("idx"), lit("M").as("tag"), lit(16L).as("toks"))
      tseg.unionByName(mseg)
        .groupBy("doc_id")
        .agg(
          count(when(col("tag") === "T", 1)).as("n_text_seg"),
          count(when(col("tag") === "M", 1)).as("n_media_seg"),
          sum(col("toks")).cast("long").as("n_tokens"),
          expr(XSql.charHash(
            "array_join(transform(array_sort(collect_list(" +
              "struct(pos, idx, tag))), s_ -> s_.tag), '')"))
            .as("pattern_hash"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // The decode path itself as a gate: geometry comes from the REAL
    // PNG header (ImageIO parses IHDR), the mean from the decoded
    // raster INCLUDING the zero-padded tail row — a quantity that
    // exists only in the image domain, so a byte-offset shortcut that
    // skipped the codec could not produce it. The oracle restates the
    // geometry rule (64-wide raster, ceil(len/64) rows, min 1) and
    // the padded mean in closed form over the source text; equality
    // proves the encode→decode round trip is lossless and the decoded
    // dimensions are the encoded ones.
    Q("m8_image_decode",
      "real PNG decode: IHDR geometry + zero-padded raster mean from decoded samples",
      {
        implicit val dl: SqlDuck.type = SqlDuck
        val sum = dl.foldL(dl.xform(dl.chars("text"), "c_", dl.codepoint("c_")),
          0, "a_", "x_", "a_ + x_")
        s"""WITH $SrcCte,
           |g AS (SELECT doc_id, text,
           |        greatest(cast(ceil(length(text) / 64.0) as bigint), 1) AS h
           |      FROM src)
           |SELECT doc_id, cast(64 as bigint) AS img_width, h AS img_height,
           |  cast($sum as double) / cast(64 * h as double) AS padded_mean
           |FROM g ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.functions._
      import s.implicits._
      Multimodal.imageTable(s, d).mapPartitions { rows =>
        rows.map { r =>
          val (w, h, samples) = Multimodal.decodeGrayPng(r.payload)
          var sum = 0L
          var i = 0
          while (i < samples.length) { sum += samples(i) & 0xff; i += 1 }
          (r.doc_id, w.toLong, h.toLong, sum.toDouble / samples.length)
        }
      }.toDF("doc_id", "img_width", "img_height", "padded_mean")
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // M11 — PERCEPTUAL-hash near-dup over REAL decoded rasters: each
    // image's 64-bit hash point-samples an 8×8 grid of the decoded
    // PNG, and each bit compares its sample to that grid position's
    // CORPUS MEDIAN (exact lower-median order statistic) — the
    // balanced variant of aHash production image-dedup uses, because
    // own-mean bits are heavily skewed (~80% ones here) and skewed
    // bits make every Hamming-LSH band bucket dense: measured 4.1×
    // wall at 10× docs with own-mean bits vs ~7× fewer band
    // candidates balanced (the j18/c12 occupancy lesson applied to
    // Hamming space). Candidates block on (band, image height) —
    // same-geometry comparison is the perceptual-dedup contract —
    // across 4×16-bit bands: pigeonhole-complete for Hamming ≤3, so
    // banded + exact re-check equals the all-pairs truth the oracle
    // computes. The hash is packed as two 32-bit words so neither
    // engine's bigint shift overflows. Corpus doubled with pixel-
    // perturbed twins ('a'→' '); at larger corpora the remaining
    // scale knob is band width ≈ log2(n) (multi-index hashing), the
    // same occupancy-capping c12 applies to hyperplanes.
    Q("m11_phash_near_dup",
      "median-balanced perceptual hash from decoded PNGs; Hamming<=3 pairs via geometry-blocked 16-bit bands",
      s"""WITH $SrcCte,
         |u AS (
         |  SELECT doc_id, text FROM src
         |  UNION ALL
         |  SELECT doc_id + 1000000, replace(text, 'a', ' ') FROM src),
         |g AS (SELECT doc_id, text,
         |        greatest(cast(ceil(length(text) / 64.0) as bigint), 1) AS h
         |      FROM u),
         |px AS (
         |  SELECT doc_id, h, k,
         |    (CASE WHEN (((k//8) * h) // 8) * 64 + (k%8)*8 + 1 <= length(text)
         |     THEN cast(unicode(substr(text, cast((((k//8) * h) // 8) * 64 + (k%8)*8 + 1 as bigint), 1)) as bigint)
         |     ELSE 0 END) AS pix
         |  FROM (SELECT doc_id, text, h, unnest(range(0,64)) AS k FROM g)),
         |th AS (
         |  SELECT k, pix AS th FROM (
         |    SELECT k, pix, doc_id,
         |      row_number() OVER (PARTITION BY k ORDER BY pix, doc_id) AS rn,
         |      count(*) OVER (PARTITION BY k) AS n
         |    FROM px) WHERE rn = (n + 1) // 2),
         |hsh AS (
         |  SELECT doc_id, max(h) AS h,
         |    sum(CASE WHEN k < 32 AND pix > th
         |        THEN (cast(1 as bigint) << cast(k as int)) ELSE 0 END) AS h1,
         |    sum(CASE WHEN k >= 32 AND pix > th
         |        THEN (cast(1 as bigint) << cast(k - 32 as int)) ELSE 0 END) AS h2
         |  FROM px JOIN th USING (k) GROUP BY doc_id)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  cast(bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) as bigint) AS hamming
         |FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id AND a.h = b.h
         |WHERE bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions._
      import s.implicits._
      import graft.operators.Multimodal
      import graft.operators.Multimodal.MediaRow
      val media = Multimodal.mediaTable(s, d)
      val twins = media.map(r => MediaRow(r.doc_id + 1000000,
        r.payload.map(b => if (b == 'a'.toByte) ' '.toByte else b),
        r.media_type, r.width, r.height))
      // REAL codec round trip per image; ONE row out per image with
      // its 64 grid samples (typed-encoder cost is per image, not
      // per sample; everything downstream is native codegen)
      val imgs = media.union(twins)
        .repartition(s.sparkContext.defaultParallelism)
        .map { r =>
          val png = Multimodal.encodeGrayPng(r.payload, 64)
          val (_, h, samples) = Multimodal.decodeGrayPng(png)
          val sm = (0 until 64).map { k =>
            val idx = ((k / 8) * h / 8) * 64 + (k % 8) * 8
            (samples(idx) & 0xff).toLong
          }
          (r.doc_id, h.toLong, sm)
        }.toDF("doc_id", "h", "sm")
      imgs.cache()
      // exact lower-median threshold per grid position: the sorted
      // pixel multiset's (n+1)/2-th value — identical to the oracle's
      // rank definition (the value at a rank depends only on the
      // multiset). 64 groups, one narrow explode.
      val th = imgs.select(posexplode(col("sm")))
        .withColumnsRenamed(Map("pos" -> "k", "col" -> "pix"))
        .groupBy("k")
        .agg(expr("element_at(array_sort(collect_list(pix)), " +
          "cast((count(1) + 1) div 2 as int))").as("th"))
      // thresholds as one broadcast 64-array; the hash is a native
      // fold over the sample array — no per-sample rows, no join
      val thArr = th.agg(expr(
        "transform(array_sort(collect_list(struct(k, th))), s_ -> s_.th)")
        .as("tha"))
      def word(lo: Int, hi: Int) =
        s"""aggregate(sequence($lo, $hi), cast(0 as bigint), (a_, k_) ->
           |  a_ + IF(element_at(sm, k_ + 1) > element_at(tha, k_ + 1),
           |          shiftleft(cast(1 as bigint), k_ - $lo), cast(0 as bigint)))""".stripMargin
      val hashes = imgs.crossJoin(broadcast(thArr))
        .select(col("doc_id"), col("h"),
          expr(word(0, 31)).as("ah1"), expr(word(32, 63)).as("ah2"))
      // 4 bands of 16 bits, blocked on geometry: complete for
      // Hamming <= 3 by pigeonhole
      val bands = hashes.select(col("doc_id"), col("h"), col("ah1"), col("ah2"),
        explode(expr(
          "array(named_struct('bi', 0, 'bv', ah1 % 65536)," +
            " named_struct('bi', 1, 'bv', ah1 div 65536)," +
            " named_struct('bi', 2, 'bv', ah2 % 65536)," +
            " named_struct('bi', 3, 'bv', ah2 div 65536))")).as("b"))
        .select(col("doc_id"), col("h"), col("ah1"), col("ah2"),
          col("b.bi").as("bi"), col("b.bv").as("bv"))
      val aS = bands.select(col("doc_id").as("doc_a"), col("h"),
        col("ah1").as("a1"), col("ah2").as("a2"), col("bi"), col("bv"))
      val bS = bands.select(col("doc_id").as("doc_b"), col("h"),
        col("ah1").as("b1"), col("ah2").as("b2"), col("bi"), col("bv"))
      aS.join(bS, Seq("bi", "bv", "h"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b", "a1", "a2", "b1", "b2")
        .distinct()
        .withColumn("hamming",
          expr("bit_count(a1 ^ b1) + bit_count(a2 ^ b2)").cast("bigint"))
        .filter(col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    }
  )
}
