package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic media carries binary payloads with typed metadata") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sf001))
    val r = media.head()
    assert(r.payload.nonEmpty && r.meta_width == 640)
    assert(Set("image", "audio", "video").contains(r.kind))
  }

  test("stub decode produces deterministic normalized features per partition batch") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sf001)).limit(50)
    val f1 = Multimodal.decodeFeatures(media, new Multimodal.StubDecoder(16))
      .collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeFeatures(media.repartition(7), new Multimodal.StubDecoder(16))
      .collect().sortBy(_.media_id)
    assert(f1.length == 50)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.media_id == b.media_id && a.checksum == b.checksum)
      assert(a.features.sameElements(b.features), "repartition must not change features")
    }
    // histogram features sum to ~1
    assert(math.abs(f1.head.features.map(_.toDouble).sum - 1.0) < 1e-5)
  }

  test("decoded features feed ANN search") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sf001)).limit(40)
    val feats = Multimodal.decodeFeatures(media, new Multimodal.StubDecoder(8)).toDF()
    val queries = feats.filter(col("media_id") < 2)
    val nn = Ann.bruteForceTopK(feats, col("media_id"), col("features"),
      queries, col("media_id"), col("features"), k = 3)
    val byQ = nn.select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)]
      .collect().groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L))
    assert(byQ.values.forall(_.length == 3))
  }

  test("frame sampling explodes stride-spaced frame indices") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sf001)).limit(3)
    val frames = Multimodal.sampleFrames(media, nFrames = 10, stride = 3)
    assert(frames.count() == 3 * 4) // indices 0,3,6,9
    assert(frames.filter(col("media_id") === 0).select("frame_idx")
      .as[Int].collect().toSet == Set(0, 3, 6, 9))
  }

  /** Minimal RIFF/WAVE writer: 16-bit PCM, interleaved channels. */
  private def wavBytes(sampleRate: Int, channels: Int,
                       samples: Array[Array[Short]]): Array[Byte] = {
    val frames = samples(0).length
    val dataLen = frames * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1)
    bb.putShort(channels.toShort); bb.putInt(sampleRate)
    bb.putInt(sampleRate * channels * 2); bb.putShort((channels * 2).toShort)
    bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    for (i <- 0 until frames; c <- 0 until channels) bb.putShort(samples(c)(i))
    bb.array()
  }

  test("WavPcmDecoder recovers sine-wave stats through the batched decode path") {
    val sr = 16000; val freq = 440.0; val amp = 16000.0; val secs = 0.5
    val n = (sr * secs).toInt
    val sine = Array.tabulate(n)(i =>
      (amp * math.sin(2 * math.Pi * freq * i / sr)).toShort)
    val mono = wavBytes(sr, 1, Array(sine))
    val stereo = wavBytes(sr, 2, Array(sine, sine)) // identical channels
    val media = Seq(
      MediaRow(1L, "audio", mono, 0, 0, sr),
      MediaRow(2L, "audio", stereo, 0, 0, sr)
    ).toDS()
    val feats = Multimodal.decodeFeatures(media, new Multimodal.WavPcmDecoder)
      .collect().map(f => f.media_id -> f.features).toMap
    for (id <- Seq(1L, 2L)) {
      val Array(dur, rms, zcr, peak) = feats(id)
      assert(math.abs(dur - secs) < 1e-3, s"dur $dur")
      // RMS of a sine of normalized amplitude a is a/sqrt(2)
      val a = amp / 32768.0
      assert(math.abs(rms - a / math.sqrt(2)) < 0.01 * a, s"rms $rms")
      // a 440 Hz tone crosses zero 2*440 times/sec -> zcr ~ 2f/sr
      assert(math.abs(zcr - 2 * freq / sr) < 0.005, s"zcr $zcr")
      assert(math.abs(peak - a) < 0.01, s"peak $peak")
    }
    // channel mixdown of identical channels == mono features
    assert(feats(1L).zip(feats(2L)).forall { case (x, y) => math.abs(x - y) < 1e-6 })
  }

  test("RoutingDecoder decodes a MIXED media table in one pass") {
    val sine = Array.tabulate(800)(i =>
      (8000 * math.sin(2 * math.Pi * 440 * i / 16000)).toShort)
    val wav = wavBytes(16000, 1, Array(sine))
    val pgm = Multimodal.encodePgm(4, 2, Array(0, 64, 128, 255, 10, 20, 30, 40))
    val txt = "plain text payload".getBytes
    val media = Seq(
      MediaRow(1L, "audio", wav, 0, 0, 16000),
      MediaRow(2L, "image", pgm, 4, 2, 0),
      MediaRow(3L, "video", txt, 0, 0, 0)
    ).toDS()
    val router = new Multimodal.RoutingDecoder(
      Map("audio" -> new Multimodal.WavPcmDecoder,
        "image" -> new Multimodal.PgmDecoder),
      fallback = new Multimodal.StubDecoder(16))
    assert(router.featureDim == 16)
    val feats = Multimodal.decodeFeatures(media, router)
      .collect().map(f => f.media_id -> f.features).toMap
    assert(feats.values.forall(_.length == 16), "all vectors padded to one width")
    assert(math.abs(feats(1L)(0) - 800.0 / 16000) < 1e-4, "audio routed to WAV decoder")
    assert(feats(2L)(0) == 4.0f && feats(2L)(1) == 2.0f, "image routed to PGM decoder")
    assert(feats(1L).drop(4).forall(_ == 0.0f), "short vectors zero-padded")
    assert(math.abs(feats(3L).map(_.toDouble).sum - 1.0) < 1e-5, "fallback histogram")
  }

  test("corrupt RIFF chunk sizes throw instead of hanging the walk") {
    val sine = Array.tabulate(100)(i => (1000 * math.sin(i / 7.0)).toShort)
    val wav = wavBytes(16000, 1, Array(sine))
    // corrupt the fmt chunk size to 0xFFFFFFF8 (-8 as a signed int: the old
    // Int walk stopped advancing; the Long walk overshoots and throws)
    val bad = wav.clone()
    bad(16) = 0xF8.toByte; bad(17) = 0xFF.toByte
    bad(18) = 0xFF.toByte; bad(19) = 0xFF.toByte
    val dec = new Multimodal.WavPcmDecoder
    intercept[IllegalArgumentException](dec.decode("audio", bad))
    intercept[IllegalArgumentException](dec.rawStats(bad))
  }

  test("truncated PGM payloads fail loudly in decode, resize, and rawStats") {
    val full = Multimodal.encodePgm(8, 4, Array.tabulate(32)(i => i * 7 % 256))
    val truncated = full.dropRight(10)
    val dec = new Multimodal.PgmDecoder
    intercept[IllegalArgumentException](dec.decode("image", truncated))
    intercept[IllegalArgumentException](dec.resize(truncated, 4, 2))
    intercept[IllegalArgumentException](dec.rawStats(truncated))
  }

  test("encodePgm → rawStats round-trip matches closed-form integer stats") {
    val px = Array.tabulate(21)(i => (i * 12) % 256)
    val img = Multimodal.encodePgm(21, 1, px)
    val (n, s1, s2, mx) = new Multimodal.PgmDecoder().rawStats(img)
    assert(n == 21 && s1 == px.map(_.toLong).sum)
    assert(s2 == px.map(p => p.toLong * p).sum && mx == px.max.toLong)
  }

  test("decodeFeaturesSafe quarantines corrupt payloads instead of failing the job") {
    val sine = Array.tabulate(200)(i => (2000 * math.sin(i / 5.0)).toShort)
    val good = Multimodal.encodeWavPcm(8000, sine)
    val media = Seq(
      MediaRow(1L, "audio", good, 0, 0, 8000),
      MediaRow(2L, "audio", "corrupt bytes".getBytes, 0, 0, 8000),
      MediaRow(3L, "audio", good.dropRight(30), 0, 0, 8000) // truncated data chunk
    ).toDS()
    // strict mode fails the whole job on the corrupt row
    intercept[Exception](
      Multimodal.decodeFeatures(media, new Multimodal.WavPcmDecoder).collect())
    // safe mode: every row survives, bad ones carry the error
    val rows = Multimodal.decodeFeaturesSafe(media, new Multimodal.WavPcmDecoder)
      .collect().map(r => r.media_id -> r).toMap
    assert(rows.size == 3)
    assert(rows(1L).decode_error == null && rows(1L).features.length == 4)
    assert(rows(2L).decode_error != null && rows(2L).features == null)
    assert(rows(3L).decode_error == null, "short data chunk is decodable (bounded len)")
    assert(rows(2L).n_bytes == "corrupt bytes".getBytes.length.toLong)
  }

  test("AudioSystemDecoder: AIFF round-trip preserves exact sample stats") {
    val qs = Array.tabulate(500)(i => ((i * 131 + 7) % 65536 - 32768).toShort)
    val aiff = Multimodal.encodeAudio(8000, qs, "AIFF")
    assert(new String(aiff, 0, 4) == "FORM", "real AIFF container")
    val dec = new Multimodal.AudioSystemDecoder
    val (n, s1, s2, mx) = dec.rawStats(aiff)
    assert(n == 500 && s1 == qs.map(_.toLong).sum)
    assert(s2 == qs.map(q => q.toLong * q).sum && mx == qs.max.toLong)
    // identical samples through the byte-walk WAV path -> identical features
    val viaJdk = dec.decode("audio", aiff)
    val viaWav = new Multimodal.WavPcmDecoder()
      .decode("audio", Multimodal.encodeWavPcm(8000, qs))
    assert(viaJdk.sameElements(viaWav), "AIFF features == WAV features")
  }

  test("AudioSystemDecoder: G.711 µ-law payloads expand to the textbook table") {
    // AU container around all 256 µ-law codes (decode-direction test: the
    // JRE's G.711 codec must reproduce the public ITU expansion exactly)
    val hdr = java.nio.ByteBuffer.allocate(24 + 256)
    hdr.putInt(0x2e736e64); hdr.putInt(24); hdr.putInt(256)
    hdr.putInt(1); hdr.putInt(8000); hdr.putInt(1) // encoding 1 = 8-bit µ-law
    for (i <- 0 until 256) hdr.put(i.toByte)
    def expand(u: Int): Long = {
      val b = ~u & 0xFF
      val x = ((((b & 0x0F) << 3) + 0x84) << ((b >> 4) & 7)) - 0x84
      if ((b & 0x80) != 0) -x else x
    }
    val expected = (0 until 256).map(expand)
    val (n, s1, s2, mx) = new Multimodal.AudioSystemDecoder().rawStats(hdr.array())
    assert(n == 256 && s1 == expected.sum)
    assert(s2 == expected.map(q => q * q).sum && mx == expected.max)
  }

  test("AudioSystemDecoder rejects unrecognized payloads") {
    intercept[IllegalArgumentException](
      new Multimodal.AudioSystemDecoder().decode("audio", "not audio".getBytes))
  }

  test("ImageIoDecoder: PNG round-trip preserves exact gray pixel stats") {
    val px = Array.tabulate(200)(i => (i * 37 + 11) % 256)
    val png = Multimodal.encodeImage(20, 10, px, "png")
    // a real PNG: magic bytes present, payload actually deflate-compressed
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val dec = new Multimodal.ImageIoDecoder
    val (n, s1, s2, mx) = dec.rawStats(png)
    assert(n == 200 && s1 == px.map(_.toLong).sum)
    assert(s2 == px.map(p => p.toLong * p).sum && mx == px.max.toLong)
    val Array(w, h, mean, std) = dec.decode("image", png)
    assert(w == 20f && h == 10f)
    assert(math.abs(mean - px.sum.toDouble / 200 / 255) < 1e-6)
    assert(std > 0)
  }

  test("ImageIoDecoder: JPEG decodes with exact dims and near-exact mean") {
    val px = Array.tabulate(256)(i => (128 + 100 * math.sin(i / 9.0)).toInt)
    val jpg = Multimodal.encodeImage(16, 16, px, "jpg")
    assert((jpg(0) & 0xFF) == 0xFF && (jpg(1) & 0xFF) == 0xD8, "JFIF magic")
    val Array(w, h, mean, _) = new Multimodal.ImageIoDecoder().decode("image", jpg)
    assert(w == 16f && h == 16f)
    val exact = px.sum.toDouble / 256 / 255
    assert(math.abs(mean - exact) * 255 < 4.0, s"jpeg mean ${mean * 255} vs ${exact * 255}")
  }

  test("ImageIoDecoder: color BMP uses integer BT.601 luma; garbage throws") {
    // 2x1 BMP, one red + one white pixel, via an RGB BufferedImage
    val img = new java.awt.image.BufferedImage(2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val dec = new Multimodal.ImageIoDecoder
    val (n, s1, _, mx) = dec.rawStats(bos.toByteArray)
    // luma(red) = (77*255 + 128) >> 8 = 77, luma(white) = 255
    assert(n == 2 && s1 == 77L + 255L && mx == 255L)
    intercept[IllegalArgumentException](
      dec.decode("image", "definitely not an image".getBytes))
  }

  test("ImageIoDecoder routes through decodeFeatures alongside other kinds") {
    val png = Multimodal.encodeImage(4, 2, Array(0, 64, 128, 255, 10, 20, 30, 40), "png")
    val pgm = Multimodal.encodePgm(4, 2, Array(0, 64, 128, 255, 10, 20, 30, 40))
    val media = Seq(
      MediaRow(1L, "png", png, 4, 2, 0),
      MediaRow(2L, "pgm", pgm, 4, 2, 0)
    ).toDS()
    val router = new Multimodal.RoutingDecoder(
      Map("png" -> new Multimodal.ImageIoDecoder, "pgm" -> new Multimodal.PgmDecoder),
      fallback = new Multimodal.StubDecoder(4))
    val feats = Multimodal.decodeFeatures(media, router)
      .collect().map(f => f.media_id -> f.features).toMap
    // identical pixels through two different containers -> identical features
    assert(feats(1L).sameElements(feats(2L)))
  }

  test("Mp3HeaderDecoder walks synthesized frames to exact closed-form stats") {
    // 3 frames: (bi=9 → 128 kbps, pad 0), (bi=14 → 320, pad 1), (bi=1 → 32, pad 0)
    val mp3 = Multimodal.encodeMp3Frames(Array((9, 0), (14, 1), (1, 0)))
    val dec = new Multimodal.Mp3HeaderDecoder
    val (frames, sumKbps, sumBytes, samples, sr) = dec.walk(mp3)
    assert(frames == 3 && sr == 44100 && samples == 3 * 1152)
    assert(sumKbps == 128 + 320 + 32)
    val expBytes = 144000L * 128 / 44100 + (144000L * 320 / 44100 + 1) +
      144000L * 32 / 44100
    assert(sumBytes == expBytes)
    // payload = ID3v2 prefix (22 bytes) + frame bytes exactly
    assert(mp3.length == 22 + expBytes)
    val Array(dur, meanKbps, rate, nf) = dec.decode("mp3", mp3)
    assert(nf == 3.0f && rate == 44100.0f)
    assert(math.abs(dur - 3.0 * 1152 / 44100) < 1e-6)
    assert(math.abs(meanKbps - (128 + 320 + 32) / 3.0) < 1e-4)
  }

  test("Mp3HeaderDecoder skips ID3v1 trailers and rejects malformed streams") {
    val dec = new Multimodal.Mp3HeaderDecoder
    val base = Multimodal.encodeMp3Frames(Array((9, 0), (9, 1)))
    val v1 = new Array[Byte](128)
    v1(0) = 'T'; v1(1) = 'A'; v1(2) = 'G'
    val (frames, _, _, _, _) = dec.walk(base ++ v1)
    assert(frames == 2)
    // truncated final frame
    intercept[IllegalArgumentException](dec.walk(base.dropRight(1)))
    // junk after last frame (not a 128-byte TAG block) loses sync
    intercept[IllegalArgumentException](dec.walk(base :+ 0x00.toByte))
    // free bitrate index rejected
    val free = base.clone()
    free(24) = (free(24) & 0x0F).toByte // zero the bitrate nibble (after 22-byte ID3 + 2)
    intercept[IllegalArgumentException](dec.walk(free))
    // corrupt ID3v2 size: skip overshoots payload -> no frames found
    intercept[IllegalArgumentException] {
      val bad = base.clone(); bad(9) = 0x7F.toByte; dec.walk(bad)
    }
  }

  test("AdtsHeaderDecoder walks synthesized AAC frames to exact closed-form stats") {
    // 3 frames: payloads 100 (CRC), 200 (no CRC), 50 (CRC) at 48 kHz stereo LC
    val adts = Multimodal.encodeAdtsFrames(
      Array((100, 1), (200, 0), (50, 1)), srIdx = 3, channels = 2, profile = 2)
    val dec = new Multimodal.AdtsHeaderDecoder
    val m = dec.walk(adts)
    assert(m.frames == 3 && m.sampleRate == 48000 && m.channels == 2)
    assert(m.profile == 2 && m.samples == 3 * 1024 && m.crcFrames == 2)
    val expBytes = (100 + 9) + (200 + 7) + (50 + 9)
    assert(m.sumBytes == expBytes)
    // payload = ID3v2 prefix (22 bytes) + frame bytes exactly
    assert(adts.length == 22 + expBytes)
    val Array(dur, rate, ch, nf) = dec.decode("aac", adts)
    assert(nf == 3.0f && rate == 48000.0f && ch == 2.0f)
    assert(math.abs(dur - 3.0 * 1024 / 48000) < 1e-6)
    // mono 8 kHz HE-ish variant exercises the other field encodings
    val m2 = dec.walk(Multimodal.encodeAdtsFrames(
      Array((10, 0)), srIdx = 11, channels = 1, profile = 1))
    assert(m2.sampleRate == 8000 && m2.channels == 1 && m2.profile == 1)
  }

  test("AdtsHeaderDecoder quarantines malformed streams instead of stalling") {
    val dec = new Multimodal.AdtsHeaderDecoder
    val base = Multimodal.encodeAdtsFrames(Array((100, 0), (100, 0)))
    // clean walk first (the cases below are single-defect mutants of it)
    assert(dec.walk(base).frames == 2)
    // truncated final frame
    intercept[IllegalArgumentException](dec.walk(base.dropRight(1)))
    // junk after the last frame loses sync
    intercept[IllegalArgumentException](dec.walk(base :+ 0x00.toByte))
    // frame length smaller than its own header (13-bit field zeroed)
    val tiny = base.clone()
    tiny(25) = (tiny(25) & 0xFC).toByte // 22 ID3 + 3: len hi bits
    tiny(26) = 0x00.toByte
    tiny(27) = (tiny(27) & 0x1F).toByte // len lo bits
    intercept[IllegalArgumentException](dec.walk(tiny))
    // reserved sampling-frequency index (13)
    val badSr = base.clone()
    badSr(24) = ((badSr(24) & 0xC1) | (13 << 2)).toByte
    intercept[IllegalArgumentException](dec.walk(badSr))
    // channel config 0 (in-band PCE) rejected
    val ch0 = base.clone()
    ch0(24) = (ch0(24) & 0xFE).toByte
    ch0(25) = (ch0(25) & 0x3F).toByte
    intercept[IllegalArgumentException](dec.walk(ch0))
    // mid-stream sample-rate change rejected (stream-constancy contract)
    val twoRates = Multimodal.encodeAdtsFrames(Array((100, 0)), srIdx = 3) ++
      Multimodal.encodeAdtsFrames(Array((100, 0)), srIdx = 4).drop(22)
    intercept[IllegalArgumentException](dec.walk(twoRates))
    // and the quarantine route: corrupt payloads isolate per-row in
    // decodeFeaturesSafe instead of failing the job
    val media = Seq(
      MediaRow(1L, "aac", base, 0, 0, 48000),
      MediaRow(2L, "aac", base.dropRight(1), 0, 0, 48000)).toDS()
    val rows = Multimodal.decodeFeaturesSafe(media,
        new Multimodal.AdtsHeaderDecoder)
      .collect().map(r => r.media_id -> r).toMap
    assert(rows(1L).decode_error == null && rows(1L).features.length == 4)
    assert(rows(2L).decode_error != null && rows(2L).features == null)
  }

  test("container parsers route through decodeFeaturesSafe in a mixed media table") {
    val mp3 = Multimodal.encodeMp3Frames(Array((9, 0), (9, 1)))
    val mp4 = Multimodal.encodeMp4Meta(600L, 1200L, Seq((640, 480, "avc1")))
    val wav = Multimodal.encodeWavPcm(16000, Array[Short](0, 100, -100, 50))
    val media = Seq(
      MediaRow(1L, "mp3", mp3, 0, 0, 44100),
      MediaRow(2L, "mp4", mp4, 640, 480, 0),
      MediaRow(3L, "wav", wav, 0, 0, 16000),
      MediaRow(4L, "mp3", Array[Byte](1, 2, 3), 0, 0, 0) // corrupt
    ).toDS()
    val router = new Multimodal.RoutingDecoder(
      Map("mp3" -> new Multimodal.Mp3HeaderDecoder,
          "mp4" -> new Multimodal.Mp4BoxDecoder,
          "wav" -> new Multimodal.WavPcmDecoder),
      fallback = new Multimodal.StubDecoder(4))
    val out = Multimodal.decodeFeaturesSafe(media, router)
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).decode_error == null && out(1L).features(3) == 2.0f) // 2 frames
    assert(out(2L).decode_error == null && out(2L).features(1) == 640.0f)
    assert(out(3L).decode_error == null && out(3L).features(0) == 4.0f / 16000)
    assert(out(4L).decode_error != null && out(4L).features == null,
      "corrupt mp3 must quarantine, not fail the task")
  }

  test("Mp4BoxDecoder recovers movie metadata through the box tree") {
    val mp4 = Multimodal.encodeMp4Meta(600L, 123456L,
      Seq((1920, 1080, "avc1"), (0, 0, "mp4a")))
    val dec = new Multimodal.Mp4BoxDecoder
    val m = dec.walk(mp4)
    assert(m.timescale == 600L && m.duration == 123456L)
    assert(m.nTracks == 2 && m.videoW == 1920L && m.videoH == 1080L)
    assert(m.codecs == Seq("avc1", "mp4a"))
    val Array(dur, w, h, nt) = dec.decode("mp4", mp4)
    assert(math.abs(dur - 123456.0 / 600) < 1e-3)
    assert(w == 1920.0f && h == 1080.0f && nt == 2.0f)
  }

  test("Mp4BoxDecoder rejects malformed box trees instead of stalling") {
    val dec = new Multimodal.Mp4BoxDecoder
    val good = Multimodal.encodeMp4Meta(600L, 100L, Seq((64, 48, "avc1")))
    // truncation mid-box
    intercept[IllegalArgumentException](dec.walk(good.dropRight(5)))
    // no moov/mvhd at all
    intercept[IllegalArgumentException](
      dec.walk(good.take(16))) // just the ftyp box
    // corrupt inner box size (zero would stall a naive walk)
    val bad = good.clone()
    val moovOff = good.indexOfSlice("moov".getBytes) - 4
    bad(moovOff + 8) = 0; bad(moovOff + 9) = 0
    bad(moovOff + 10) = 0; bad(moovOff + 11) = 4 // mvhd size 4 < header
    intercept[IllegalArgumentException](dec.walk(bad))
    // undersized-but-valid-size mvhd: fields would read the NEXT box's
    // bytes as metadata — must throw, not return garbage
    val small = good.clone()
    small(moovOff + 11) = 16 // mvhd claims 16 bytes: header + 8 < v0's 20
    intercept[IllegalArgumentException](dec.walk(small))
    // encodeMp4Meta rejects durations that would wrap the v0 u32 field
    intercept[IllegalArgumentException](
      Multimodal.encodeMp4Meta(600L, 5000000000L, Seq((64, 48, "avc1"))))
  }

  test("media walkers never hang or escape on fuzzed payloads") {
    // byte-flip / truncate / extend mutations of valid payloads: every
    // parse must either succeed or throw IllegalArgumentException —
    // nothing else (no OOB, no NPE), and always terminate. This is the
    // contract decodeFeaturesSafe quarantines on.
    val rnd = new scala.util.Random(20260813)
    val mp3 = Multimodal.encodeMp3Frames(Array((9, 0), (14, 1), (3, 0)))
    val mp4 = Multimodal.encodeMp4Meta(600L, 4242L,
      Seq((640, 480, "avc1"), (0, 0, "mp4a")))
    val wav = Multimodal.encodeWavPcm(8000, Array.tabulate[Short](64)(i => (i * 97).toShort))
    val cases = Seq[(String, Array[Byte] => Any)](
      ("mp3", b => new Multimodal.Mp3HeaderDecoder().walk(b)),
      ("mp4", b => new Multimodal.Mp4BoxDecoder().walk(b)),
      ("wav", b => new Multimodal.WavPcmDecoder().decode("wav", b)))
    val bases = Map("mp3" -> mp3, "mp4" -> mp4, "wav" -> wav)
    for ((kind, parse) <- cases; trial <- 0 until 300) {
      val base = bases(kind)
      val m = base.clone()
      val mutated = rnd.nextInt(3) match {
        case 0 => // flip 1-4 random bytes
          (0 until 1 + rnd.nextInt(4)).foreach { _ =>
            m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
          }
          m
        case 1 => m.take(rnd.nextInt(m.length + 1)) // truncate
        case 2 => m ++ Array.fill[Byte](1 + rnd.nextInt(16))(rnd.nextInt(256).toByte)
      }
      try parse(mutated)
      catch {
        case _: IllegalArgumentException => // the documented contract
        case e: Throwable =>
          fail(s"$kind trial $trial escaped with ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("PgmDecoder parses P5 images and resizes by nearest neighbor") {
    val w = 64; val h = 32
    // horizontal ramp: pixel value = x * 255 / (w-1)
    val head = s"P5\n# synthetic ramp\n$w $h\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val img = head ++ Array.tabulate(h * w)(i => (i % w * 255 / (w - 1)).toByte)
    val dec = new Multimodal.PgmDecoder
    val Array(fw, fh, mean, std) = dec.decode("image", img)
    assert(fw == w && fh == h)
    // uniform ramp over [0,1]: mean 0.5, std ~ 1/sqrt(12)
    assert(math.abs(mean - 0.5) < 0.02, s"mean $mean")
    assert(math.abs(std - 1 / math.sqrt(12)) < 0.02, s"std $std")
    val small = dec.resize(img, 16, 8)
    val Array(sw, sh, smean, _) = dec.decode("image", small)
    assert(sw == 16 && sh == 8)
    assert(math.abs(smean - mean) < 0.05, s"resized mean $smean vs $mean")
    // corners survive nearest-neighbor: left edge dark, right edge bright
    val (_, _, _, off) = dec.header(small)
    assert((small(off) & 0xFF) == 0)
    assert((small(off + 15) & 0xFF) > 220)
  }

  test("vbrInfo reads Xing TOC frame counts in O(1) and matches the full walk") {
    val dec = new Multimodal.Mp3HeaderDecoder
    val spec = Array((9, 0), (14, 1), (1, 0), (7, 1))
    val plain = Multimodal.encodeMp3Frames(spec)
    val withToc = Multimodal.encodeMp3Frames(spec, xingHeader = true)
    // no TOC → None (fall back to the walk)
    assert(dec.vbrInfo(plain).isEmpty)
    val (frames, _, sumBytes, _, _) = dec.walk(plain)
    // TOC counts = the audio frames/bytes, excluding the TOC frame itself
    assert(dec.vbrInfo(withToc).contains((frames, sumBytes)))
    // the TOC stream is still a structurally valid stream for the walker
    // (one extra frame: the TOC frame is a real frame)
    val (framesT, _, _, _, _) = dec.walk(withToc)
    assert(framesT == frames + 1)
    // garbage in front → None, not a throw
    assert(dec.vbrInfo(Array[Byte](1, 2, 3, 4, 5)).isEmpty)
  }

  test("vbrInfo reads a VBRI header at its fixed offset") {
    // VBRI sits 32 bytes past the 4-byte header regardless of side info:
    // synthesize one frame (bi=9 → 417 bytes) and plant the table
    val mp3 = Multimodal.encodeMp3Frames(Array((9, 0)))
    val dec = new Multimodal.Mp3HeaderDecoder
    val off = mp3.length - 417 // frame start (after the ID3 prefix)
    val v = off + 4 + 32
    mp3(v) = 'V'; mp3(v + 1) = 'B'; mp3(v + 2) = 'R'; mp3(v + 3) = 'I'
    def putU32(o: Int, x: Long): Unit = {
      mp3(o) = (x >> 24).toByte; mp3(o + 1) = (x >> 16).toByte
      mp3(o + 2) = (x >> 8).toByte; mp3(o + 3) = x.toByte
    }
    putU32(v + 10, 123456L) // byte total
    putU32(v + 14, 789L)    // frame count
    assert(dec.vbrInfo(mp3).contains((789L, 123456L)))
  }

  test("Mp4BoxDecoder recovers per-track stts/stsz sample stats") {
    val dec = new Multimodal.Mp4BoxDecoder
    val tables = Seq((90000L, 3000L, 240L, 4096L), (48000L, 1024L, 375L, 128L))
    val mp4 = Multimodal.encodeMp4Meta(600L, 4800L,
      Seq((1920, 1080, "avc1"), (0, 0, "mp4a")), tables)
    val m = dec.walk(mp4)
    assert(m.trackTimescales == Seq(90000L, 48000L))
    assert(m.trackSamples == Seq(240L, 375L))
    assert(m.trackDurUnits == Seq(240L * 3000L, 375L * 1024L))
    assert(m.trackBytes == Seq(240L * 4096L, 375L * 128L))
    // the derived rates a triage stage filters on: 30 fps, ~983 kbps video
    assert(m.trackSamples.head * m.trackTimescales.head /
      m.trackDurUnits.head == 30L)
    assert(m.trackBytes.head * 8L * m.trackTimescales.head /
      m.trackDurUnits.head / 1000L == 983L)
    // tables absent → zeroed stats, not a throw (triage stays total)
    val bare = dec.walk(Multimodal.encodeMp4Meta(600L, 4800L,
      Seq((64, 48, "avc1"))))
    assert(bare.trackSamples == Seq(0L) && bare.trackBytes == Seq(0L))
  }

  test("DecoderProvider SPI: a codec-pack provider is discovered and routed " +
       "without engine changes") {
    import spark.implicits._
    // the test classpath registers FakeMp3SampleProvider via
    // META-INF/services — exactly how an external codec-pack jar plugs in
    assert(DecoderProviders.discovered.contains("mp3-sample"),
      s"provider not discovered: ${DecoderProviders.discovered.keySet}")
    val routing = DecoderProviders.routing(
      Map("audio" -> new Multimodal.WavPcmDecoder),
      fallback = new Multimodal.StubDecoder(4))
    // pack kind → pack decoder (recognizable vector, zero-padded to the
    // routing table's max width)
    val media = Seq(
      MediaRow(1L, "mp3-sample", Array[Byte](9, 9, 9, 9, 9), 0, 0, 16000),
      MediaRow(2L, "unknown", Array[Byte](1, 2), 0, 0, 0)).toDS()
    val got = Multimodal.decodeFeatures(media, routing)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(got(1L) == Seq(42.0f, 5.0f, 10.0f, 0.0f),
      s"pack decode wrong: ${got(1L)}")
    // unrouted kinds still hit the fallback (stub histogram, dim 4)
    assert(got(2L).size == 4 && got(2L).sum > 0)
    // discovery is cached: same map instance on re-access (once per JVM)
    assert(DecoderProviders.discovered eq DecoderProviders.discovered)
  }

  test("default routing ships mp3 -> Mp3.SampleDecoder (not the stub)") {
    val routes = DecoderProviders.builtinRoutes
    assert(routes("mp3").isInstanceOf[Mp3.SampleDecoder])
    assert(routes("flac").isInstanceOf[Flac.FlacDecoder])
    assert(routes("wav").isInstanceOf[Multimodal.WavPcmDecoder])
    // a real Layer III stream sample-decodes through the DEFAULT router —
    // no manual wiring (the round-9 gap: SampleDecoder existed but nothing
    // routed kind=mp3 to it)
    val router = DecoderProviders.defaultRouting()
    val pcm = Array.tabulate(2 * 1152)(i =>
      0.3 * math.sin(2 * math.Pi * 1000.0 * i / 44100.0))
    val f = router.decode("mp3", Mp3.encodeMono(pcm))
    assert(f(0) > 0f && f(1) > 0f, s"mp3 route did not sample-decode: ${f.toSeq}")
    // aac still falls through to the fallback (dim padded to router width)
    assert(router.decode("aac", Array[Byte](1, 2, 3)).length == router.featureDim)
  }

  test("mixed-corpus mp3 compat: an unsupported-Huffman-table stream " +
       "quarantines through decodeFeaturesSafe with triage metadata intact") {
    import spark.implicits._
    // patch `width` bits at absolute bit offset `bitOff` (MSB-first)
    def setBits(buf: Array[Byte], bitOff: Int, width: Int, value: Int): Unit = {
      var i = 0
      while (i < width) {
        val bit = (value >> (width - 1 - i)) & 1
        val pos = bitOff + i
        val by = pos / 8; val sh = 7 - (pos % 8)
        buf(by) = ((buf(by) & ~(1 << sh)) | (bit << sh)).toByte
        i += 1
      }
    }
    val pcm = Array.tabulate(2 * 1152)(i =>
      0.3 * math.sin(2 * math.Pi * 1000.0 * i / 44100.0))
    val good = Mp3.encodeMono(pcm)
    // a third-party encoder routinely selects tables 10-31; ours can't, so
    // synthesize one by patching granule-0 table_select(0) to ESC table 16.
    // Mono long-block layout: header(32) + main_data_begin(9) + private(5)
    // + scfsi(4) + part2_3_length(12) + big_values(9) + global_gain(8) +
    // scalefac_compress(4) + window_switching(1) = bit 84, width 5.
    val bad = good.clone()
    setBits(bad, 84, 5, 16)
    // strict decode fails loudly by name (the documented boundary) ...
    val err = intercept[IllegalArgumentException](Mp3.decode(bad))
    assert(err.getMessage.contains("not transcribed"))
    // ... but a MIXED corpus degrades instead of erroring out: the bad
    // member lands in quarantine, healthy members keep decoding in the
    // SAME pass — q139-style pipelines over real-world MP3s survive.
    val wav = Multimodal.encodeWavPcm(16000,
      Array.tabulate(400)(i => (1000 * math.sin(i * 0.1)).toShort))
    val media = Seq(
      MediaRow(1L, "mp3", good, 0, 0, 44100),
      MediaRow(2L, "mp3", bad, 0, 0, 44100),
      MediaRow(3L, "wav", wav, 0, 0, 16000)).toDS()
    val out = Multimodal
      .decodeFeaturesSafe(media, DecoderProviders.defaultRouting())
      .collect().map(r => r.media_id -> r).toMap
    assert(out(2L).decode_error != null &&
      out(2L).decode_error.contains("not transcribed"),
      s"expected named quarantine, got: ${out(2L).decode_error}")
    assert(out(2L).features == null)
    // triage metadata survives the failure: true byte count + payload crc
    assert(out(2L).n_bytes == bad.length.toLong)
    var crc = 1469598103934665603L // independent FNV-1a 64 fold
    bad.foreach { b => crc ^= (b & 0xFFL); crc *= 1099511628211L }
    assert(out(2L).checksum == crc)
    assert(out(1L).decode_error == null && out(1L).features != null &&
      out(1L).features(0) > 0f)
    assert(out(3L).decode_error == null && out(3L).features != null)
  }

  test("envelopeHash64: amplitude-scale invariant, content sensitive, short clips rejected") {
    val dec = new Multimodal.WavPcmDecoder()
    val rnd = new scala.util.Random(5)
    val base = Array.fill(330)((rnd.nextInt(8000) - 4000).toShort)
    val h0 = dec.envelopeHash64(Multimodal.encodeWavPcm(16000, base))
    // exact positive-scale invariance (x2 stays within 16 bits)
    val louder = base.map(s => (s * 2).toShort)
    assert(dec.envelopeHash64(Multimodal.encodeWavPcm(16000, louder)) == h0,
      "amplitude scaling changed the envelope hash")
    // different content: far in Hamming space (32 effective bits)
    val other = Array.fill(330)((rnd.nextInt(8000) - 4000).toShort)
    val d = java.lang.Long.bitCount(
      h0 ^ dec.envelopeHash64(Multimodal.encodeWavPcm(16000, other)))
    assert(d > 5, s"unrelated clips too close: $d bits")
    // fewer samples than frames: loud failure, not a garbage hash
    intercept[IllegalArgumentException](
      dec.envelopeHash64(Multimodal.encodeWavPcm(16000, new Array[Short](20))))
  }

  test("aHash64: brightness-shift robust, sensitive to content, resizes larger images") {
    val dec = new Multimodal.PgmDecoder()
    val rnd = new scala.util.Random(11)
    val base = Array.fill(64)(rnd.nextInt(200)) // headroom: no clamping
    val img = Multimodal.encodePgm(8, 8, base)
    val h0 = dec.aHash64(img)
    // uniform brightness shift without clamping: identical hash
    val brighter = Multimodal.encodePgm(8, 8, base.map(_ + 30))
    assert(dec.aHash64(brighter) == h0, "brightness shift changed the hash")
    // different content: far away in Hamming space
    val other = Multimodal.encodePgm(8, 8, Array.fill(64)(rnd.nextInt(200)))
    val d = java.lang.Long.bitCount(h0 ^ dec.aHash64(other))
    assert(d > 10, s"unrelated images too close: $d bits")
    // a 16x16 image whose 2x2 blocks are constant resizes to the same 8x8
    val big = Array.tabulate(256) { i =>
      val (y, x) = (i / 16, i % 16); base((y / 2) * 8 + (x / 2))
    }
    assert(dec.aHash64(Multimodal.encodePgm(16, 16, big)) == h0,
      "nearest-neighbor resize path diverged")
  }

  test("imageTriage routes by header and rejected blobs NEVER reach ImageIO") {
    class CountingDecoder extends Multimodal.ImageIoDecoder {
      var n = 0
      override def rawStats(p: Array[Byte]): (Long, Long, Long, Long) = {
        n += 1; super.rawStats(p)
      }
    }
    val px = Array.tabulate(64)(i => i * 3 % 256)
    val jpeg = Multimodal.encodeJpeg(8, 8, px)
    val prog = Multimodal.encodeJpeg(8, 8, px, progressive = true)
    val png = Multimodal.encodeImage(8, 8, px, "png")
    val pgm = Multimodal.encodePgm(8, 8, px)
    val bad = "NOTANIMAGE".getBytes("US-ASCII")
    val trunc = jpeg.take(10)

    // routing verdicts
    assert(Multimodal.imageTriage(jpeg) ==
      Multimodal.ImageRoute("decode", "", 8, 8, progressive = false))
    assert(Multimodal.imageTriage(prog) ==
      Multimodal.ImageRoute("decode_progressive", "", 8, 8,
        progressive = true))
    assert(Multimodal.imageTriage(png).route == "decode")
    assert(Multimodal.imageTriage(pgm).route == "decode")
    assert(Multimodal.imageTriage(bad) ==
      Multimodal.ImageRoute("quarantine", "unknown format", -1, -1,
        progressive = false))
    assert(Multimodal.imageTriage(trunc).route == "quarantine")
    assert(Multimodal.imageTriage(trunc).reason == "truncated")
    // decompression-bomb fence: header dims authorize decode cost
    assert(Multimodal.imageTriage(png, maxPixels = 63) ==
      Multimodal.ImageRoute("quarantine", "too large", 8, 8,
        progressive = false))
    assert(Multimodal.imageTriage(jpeg, maxPixels = 63).reason ==
      "too large")

    // the decode-count gate: of the six blobs, only JPEG+progressive+PNG
    // may invoke ImageIO (PGM routes to the raster walk; bad magic and
    // the truncated header never decode at all)
    val counter = new CountingDecoder
    val results = Seq(jpeg, prog, png, pgm, bad, trunc)
      .map(b => Multimodal.triagedImageStats(b, decoder = counter))
    assert(counter.n == 3,
      s"ImageIO invoked ${counter.n} times; triage must gate it to 3")
    assert(results.count(_._2.isDefined) == 4) // jpeg, prog, png, pgm
    // PGM stats came from the raster walk, exactly
    val pgmStats = Multimodal.triagedImageStats(pgm, decoder = counter)._2.get
    assert(pgmStats._1 == 64 && pgmStats._2 == px.map(_.toLong).sum)
  }
}
