package graft.operators

import graft.SparkSpec

/** Multimodal plumbing + the REAL codec paths: imageTable emits
  * genuine PNGs (javax.imageio), decodedImageMedia round-trips them to
  * pixel samples, encodePcmWav/decodePcmWav run real RIFF/WAVE audio,
  * resizeImage re-encodes its downscaled rasters, and the M-PNG video
  * container length-walks real PNG frames with skip-without-read
  * demux.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaTable(spark, "/root/testdata/sf0.001")

  test("imageTable emits genuine PNGs: magic bytes, IHDR geometry, 64-wide raster") {
    val imgs = Multimodal.imageTable(spark, "/root/testdata/sf0.001")
      .filter(_.doc_id < 20L).collect()
    assert(imgs.nonEmpty)
    val pngMagic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    imgs.foreach { r =>
      assert(r.payload.take(8).sameElements(pngMagic),
        s"doc ${r.doc_id}: payload is not a PNG")
      assert(r.img_width == 64)
      assert(r.img_height == math.max((r.n_bytes + 63) / 64, 1))
      // an independent decoder agrees with the stored geometry
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth == r.img_width && img.getHeight == r.img_height)
    }
  }

  test("PNG round trip is lossless: decoded samples == source bytes") {
    val src = media.collect().map(r => r.doc_id -> r.payload.toSeq).toMap
    val decoded = Multimodal.decodedImageMedia(spark, "/root/testdata/sf0.001")
      .collect()
    assert(decoded.length == src.size)
    decoded.foreach { r =>
      assert(r.payload.toSeq == src(r.doc_id),
        s"doc ${r.doc_id}: decode(encode(bytes)) != bytes")
    }
  }

  test("encodePcmWav emits genuine RIFF/WAVE; PCM round trip is lossless") {
    val bytes = "real-audio-codec-check".getBytes("UTF-8")
    val wav = Multimodal.encodePcmWav(bytes)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    // an independent decode agrees on format and samples
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(in.getFormat.getSampleSizeInBits == 8 && in.getFormat.getChannels == 1)
    assert(Multimodal.decodePcmWav(wav).toSeq == bytes.toSeq)
  }

  test("decodedAudioMedia round-trips every payload through the WAV codec") {
    val src = media.collect().map(r => r.doc_id -> r.payload.toSeq).toMap
    val decoded = Multimodal.decodedAudioMedia(spark, "/root/testdata/sf0.001")
      .collect()
    assert(decoded.length == src.size)
    decoded.foreach(r => assert(r.payload.toSeq == src(r.doc_id)))
  }

  test("encodeGrayPng pads the tail row with zeros; decode sees them") {
    val bytes = "hello-multimodal-png".getBytes("UTF-8") // 20 bytes
    val png = Multimodal.encodeGrayPng(bytes, 16)
    val (w, h, samples) = Multimodal.decodeGrayPng(png)
    assert(w == 16 && h == 2)
    assert(samples.take(20).toSeq == bytes.toSeq)
    assert(samples.drop(20).forall(_ == 0))
  }

  test("features: histogram sums to byte count, mean in range") {
    val f = Multimodal.extractFeatures(media).head()
    assert(f.byte_hist.sum == f.n_bytes)
    assert(f.mean_byte > 0 && f.mean_byte < 256)
  }

  test("resizeImage: real decode -> point-sample -> re-encode; samples match hand decimation") {
    val imgs = Multimodal.imageTable(spark, "/root/testdata/sf0.001")
    val before = imgs.filter(_.n_bytes > 200).head()
    val after = Multimodal.resizeImage(imgs, 3)
      .filter(_.doc_id == before.doc_id).head()
    val (w, h, samples) = Multimodal.decodeGrayPng(before.payload)
    val (ow, oh) = ((w + 2) / 3, (h + 2) / 3)
    assert(after.img_width == ow && after.img_height == oh)
    // the resized payload is itself a genuine PNG an independent
    // decoder accepts, and its samples are exactly in(3y, 3x)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(after.payload))
    assert(img.getWidth == ow && img.getHeight == oh)
    val (_, _, rs) = Multimodal.decodeGrayPng(after.payload)
    val expect = Array.tabulate(ow * oh)(i =>
      samples((i / ow) * 3 * w + (i % ow) * 3))
    assert(rs.toSeq == expect.toSeq)
  }

  test("resampleWav: real WAV decode -> decimate -> re-encode; PCM matches hand decimation") {
    val pcm = Array.tabulate[Byte](1001)(i => (i % 251).toByte)
    val wav = Multimodal.encodePcmWav(pcm)
    val res = Multimodal.resampleWav(wav, 3)
    // the resampled payload is itself a WAV an independent decoder
    // accepts with the same declared format
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(res))
    assert(in.getFormat.getSampleSizeInBits == 8 && in.getFormat.getChannels == 1)
    val got = in.readAllBytes()
    val expect = Array.tabulate[Byte]((pcm.length + 2) / 3)(i => pcm(i * 3))
    assert(got.toSeq == expect.toSeq)
    // factor 1 is the identity round trip
    assert(Multimodal.decodePcmWav(Multimodal.resampleWav(wav, 1)).toSeq
      == pcm.toSeq)
  }

  test("M-PNG container: encode -> frame count + full demux round-trips the frames") {
    val frames = Seq("alpha", "beta-frame", "g").map(s =>
      Multimodal.encodeGrayPng(s.getBytes("US-ASCII"), 4))
    val container = Multimodal.encodeMpng(frames)
    assert(container.take(4).sameElements(Multimodal.MpngMagic))
    assert(Multimodal.mpngFrameCount(container) == 3)
    val out = Multimodal.sampleMpngFrames(container, 1).toSeq
    assert(out.map(_._1) == Seq(0, 1, 2))
    assert(out.map(_._2.toSeq) == frames.map(_.toSeq))
  }

  test("M-PNG demux skips non-sampled frame BODIES: corrupting one is invisible at stride 2") {
    val frames = (0 until 4).map(i =>
      Multimodal.encodeGrayPng(s"frame-$i-payload".getBytes("US-ASCII"), 4))
    val container = Multimodal.encodeMpng(frames)
    // corrupt every byte of frame 1's body (a non-sampled frame at
    // stride 2): offset = 8 (header) + 4 (len word) + frame0 + 4
    val f1Start = 8 + 4 + frames(0).length + 4
    (f1Start until f1Start + frames(1).length)
      .foreach(i => container(i) = 0x7f.toByte)
    val sampled = Multimodal.sampleMpngFrames(container, 2).toSeq
    assert(sampled.map(_._1) == Seq(0, 2))
    // sampled frames still decode — the skipped body was never read
    sampled.foreach { case (_, png) => Multimodal.decodeGrayPng(png) }
  }

  test("M-PNG demux fails loudly on truncation and bad magic") {
    val container = Multimodal.encodeMpng(Seq(
      Multimodal.encodeGrayPng("0123456789".getBytes("US-ASCII"), 4)))
    val truncated = container.take(container.length - 3).toArray
    intercept[IllegalArgumentException](
      Multimodal.sampleMpngFrames(truncated, 1).toSeq)
    intercept[IllegalArgumentException](
      Multimodal.mpngFrameCount("nope".getBytes("US-ASCII") ++ container.drop(4)))
  }

  test("videoTable: one real PNG frame per 64-byte chunk, header count matches") {
    val vids = Multimodal.videoTable(spark, "/root/testdata/sf0.001")
      .filter(_.doc_id < 5L).collect()
    val src = media.filter(_.doc_id < 5L).collect()
      .map(r => r.doc_id -> r.payload).toMap
    assert(vids.nonEmpty)
    vids.foreach { v =>
      val bytes = src(v.doc_id)
      assert(v.n_frames == (bytes.length + 63) / 64)
      assert(Multimodal.mpngFrameCount(v.payload) == v.n_frames)
      val decodedFrames = Multimodal.sampleMpngFrames(v.payload, 1)
        .map { case (i, png) => i -> Multimodal.decodeGrayPng(png) }.toMap
      bytes.grouped(64).zipWithIndex.foreach { case (chunk, i) =>
        val (w, h, samples) = decodedFrames(i)
        assert(w == 8)
        assert(h == math.max((chunk.length + 7) / 8, 1))
        assert(samples.take(chunk.length).toSeq == chunk.toSeq)
        assert(samples.drop(chunk.length).forall(_ == 0))
      }
    }
  }

  test("frame sampling emits every stride-th fixed-size frame") {
    val r = media.filter(_.doc_id == 0L).head()
    val frames = Multimodal.sampleFrames(media.filter(_.doc_id == 0L), 16, 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.length == (r.payload.length / 16 + 1) / 2)
    assert(frames.forall(_.frame.length == 16))
    assert(frames.map(_.frame_idx).toSeq == (0 until r.payload.length / 16 by 2))
  }

  test("native generator sampling == typed flatMap sampling, bytes included") {
    def key(docId: Long, idx: Int, frame: Array[Byte]) =
      (docId, idx, frame.toSeq)
    for ((fb, st) <- Seq((16, 2), (64, 1), (64, 2))) {
      val typed = Multimodal.sampleFrames(media, fb, st).collect()
        .map(f => key(f.doc_id, f.frame_idx, f.frame)).toSet
      val native = Multimodal.sampleFramesNative(media, fb, st).collect()
        .map(r => key(r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2))).toSet
      assert(native == typed, s"frameBytes=$fb stride=$st")
    }
  }

  test("native sampling plan has no typed-encoder boundary") {
    val p = Multimodal.sampleFramesNative(media, 64, 2)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("SerializeFromObject") && !p.contains("MapPartitions") &&
      !p.contains("DeserializeToObject"),
      "frame slicing must stay in codegen, not cross an object boundary:\n" + p)
  }
}
