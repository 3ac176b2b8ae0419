package graft.operators

import graft.SparkSpec

/** Multimodal plumbing + the REAL image codec path: imageTable emits
  * genuine PNGs (javax.imageio), decodedImageMedia round-trips them to
  * pixel samples; the audio/video seams remain declared deterministic
  * stand-ins.
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

  test("resize shrinks payload and dimensions") {
    val before = media.head()
    val after = Multimodal.resize(media, 4).filter(_.doc_id == before.doc_id).head()
    assert(after.payload.length == (before.payload.length + 3) / 4)
    assert(after.width == math.max(before.width / 4, 1))
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
