package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Gates for the Layer III codec: Huffman-table validity (the two
  * properties a wrong transcription essentially cannot satisfy), the
  * filterbank identities, and end-to-end encode → decode behavior. */
class Mp3Spec extends AnyFunSuite {

  // ---------------- Huffman transcription gates ----------------

  test("every shipped Huffman table is a COMPLETE prefix code (Kraft = 1)") {
    val all = Mp3Huff.tables.values.toSeq ++ Mp3Huff.count1Tables
    all.foreach { t =>
      val (scaled, maxLen) = t.kraftScaled
      assert(scaled == (1L << maxLen),
        s"table ${t.id}: Kraft sum ${scaled}/2^$maxLen != 1 — transcription broken")
      // prefix-freeness and no-duplicates are enforced by the tree builder
      // (it throws on construction) — reaching here means they hold
    }
    assert(Mp3Huff.tables.keySet == Set(1, 2, 3, 5, 6, 7, 8, 9))
  }

  test("Huffman encode → decode round-trips every symbol of every table") {
    Mp3Huff.tables.values.foreach { t =>
      val bw = new Mp3.BitWriter
      for (x <- 0 until t.xlen; y <- 0 until t.ylen) t.encodePair(bw, x, y)
      bw.padToByte()
      val br = new Mp3.BitReader(bw.toBytes)
      for (x <- 0 until t.xlen; y <- 0 until t.ylen)
        assert(t.decodePair(br) == (x, y), s"table ${t.id} symbol ($x,$y)")
    }
    Mp3Huff.count1Tables.foreach { t =>
      val bw = new Mp3.BitWriter
      for (p <- 0 until 16) t.encodeQuad(bw, p)
      bw.padToByte()
      val br = new Mp3.BitReader(bw.toBytes)
      for (p <- 0 until 16) assert(t.decodeQuad(br) == p, s"count1 quad $p")
    }
  }

  test("untranscribed/invalid table selects fail loudly by name") {
    val esc = intercept[IllegalArgumentException](Mp3Huff.bigTable(16))
    assert(esc.getMessage.contains("not transcribed"))
    assert(esc.getMessage.contains("linbits 1"))
    val big = intercept[IllegalArgumentException](Mp3Huff.bigTable(13))
    assert(big.getMessage.contains("not transcribed"))
    val rsvd = intercept[IllegalArgumentException](Mp3Huff.bigTable(4))
    assert(rsvd.getMessage.contains("reserved"))
  }

  // ---------------- end-to-end codec gates ----------------

  private def sine(n: Int, freq: Double, amp: Double, sr: Double = 44100.0,
      phase: Double = 0.0): Array[Double] =
    Array.tabulate(n)(i => amp * math.sin(2 * math.Pi * freq * i / sr + phase))

  /** Goertzel power of the DFT bin nearest `freq` over a window. */
  private def goertzelPower(x: Array[Double], lo: Int, len: Int,
      freq: Double, sr: Double = 44100.0): Double = {
    val k = math.rint(len * freq / sr)
    val w = 2 * math.Pi * k / len
    val coeff = 2 * math.cos(w)
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
    var i = 0
    while (i < len) {
      s0 = x(lo + i) + coeff * s1 - s2
      s2 = s1; s1 = s0
      i += 1
    }
    s1 * s1 + s2 * s2 - coeff * s1 * s2
  }

  private def totalPower(x: Array[Double], lo: Int, len: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < len) { s += x(lo + i) * x(lo + i); i += 1 }
    s * len / 2.0 // comparable scale to a single-bin Goertzel power
  }

  test("silence encodes to a valid stream and decodes to EXACT zeros") {
    val enc = Mp3.encodeMono(new Array[Double](2 * 1152))
    val dec = Mp3.decode(enc)
    assert(dec.sampleRate == 44100 && dec.channels == 1)
    assert(dec.frames == 2 * 1152)
    assert(dec.pcm(0).forall(_ == 0.0), "silence must decode to exact zeros")
  }

  test("a pure tone round-trips with its frequency dominant (Goertzel)") {
    val n = 8 * 1152
    val enc = Mp3.encodeMono(sine(n, 2000.0, 0.3))
    val dec = Mp3.decode(enc)
    assert(dec.frames == n)
    val pcm = dec.pcm(0)
    // steady-state interior (past filterbank + MDCT warm-up)
    val lo = 3000; val len = 4410
    val tone = goertzelPower(pcm, lo, len, 2000.0)
    val total = totalPower(pcm, lo, len)
    assert(tone / total > 0.8,
      s"tone power fraction ${tone / total} — decode chain is mangling the spectrum")
    // amplitude survives within quantization tolerance
    val rms = math.sqrt(pcm.slice(lo, lo + len).map(x => x * x).sum / len)
    val want = 0.3 / math.sqrt(2.0)
    assert(math.abs(rms / want - 1.0) < 0.3,
      s"rms $rms vs expected ~$want — gain is off")
  }

  test("stereo L/R channels decode independently (no crosstalk)") {
    val n = 8 * 1152
    val enc = Mp3.encode(Array(sine(n, 1000.0, 0.25), sine(n, 3000.0, 0.25)))
    val dec = Mp3.decode(enc)
    assert(dec.channels == 2 && dec.frames == n)
    val lo = 3000; val len = 4410
    for ((ch, own, other) <- Seq((0, 1000.0, 3000.0), (1, 3000.0, 1000.0))) {
      val pcm = dec.pcm(ch)
      val ownP = goertzelPower(pcm, lo, len, own)
      val otherP = goertzelPower(pcm, lo, len, other)
      assert(ownP > 20 * otherP,
        s"channel $ch: own-tone/other-tone power ${ownP / otherP} — crosstalk")
    }
  }

  test("MS joint stereo reconstructs L/R through the mid/side path") {
    val n = 8 * 1152
    val enc = Mp3.encode(Array(sine(n, 1000.0, 0.25), sine(n, 3000.0, 0.25)),
      jointMs = true)
    // header must actually claim joint stereo + MS
    assert((enc(3) & 0xC0) >> 6 == 1 && (enc(3) & 0x30) >> 4 == 2)
    val dec = Mp3.decode(enc)
    assert(dec.channels == 2 && dec.frames == n)
    val lo = 3000; val len = 4410
    for ((ch, own, other) <- Seq((0, 1000.0, 3000.0), (1, 3000.0, 1000.0))) {
      val ownP = goertzelPower(dec.pcm(ch), lo, len, own)
      val otherP = goertzelPower(dec.pcm(ch), lo, len, other)
      assert(ownP > 20 * otherP,
        s"MS channel $ch: own/other power ${ownP / otherP} — mid/side broken")
    }
  }

  test("intensity stereo pans the combined high band by tan(pos*pi/12)") {
    val n = 8 * 1152
    // common low tone in both channels (independent region), high tone in
    // L only; encoded with intensity from sfb 8 at position 4, so the
    // decoder must reconstruct L/R high-band amplitudes in ratio sqrt(3)
    val low = sine(n, 700.0, 0.2)
    val highL = sine(n, 3000.0, 0.24)
    val l = Array.tabulate(n)(i => low(i) + highL(i))
    val enc = Mp3.encode(Array(l, low.clone()), intensityFrom = 8,
      intensityPos = 4)
    // header: joint stereo, mode_ext = intensity only
    assert((enc(3) & 0xC0) >> 6 == 1 && (enc(3) & 0x30) >> 4 == 1)
    val dec = Mp3.decode(enc)
    val lo = 3000; val len = 4410
    // low band stays independent and equal
    val lowL = goertzelPower(dec.pcm(0), lo, len, 700.0)
    val lowR = goertzelPower(dec.pcm(1), lo, len, 700.0)
    assert(math.abs(lowL / lowR - 1.0) < 0.3, s"low band L/R $lowL/$lowR")
    // high band: power ratio = tan(4*pi/12)^2 = 3
    val hiL = goertzelPower(dec.pcm(0), lo, len, 3000.0)
    val hiR = goertzelPower(dec.pcm(1), lo, len, 3000.0)
    assert(hiL / hiR > 2.0 && hiL / hiR < 4.5,
      s"high-band L/R power ratio ${hiL / hiR}, want ~3 (pos 4)")
    // and the high band is genuinely present in BOTH channels
    assert(hiR > 0.05 * lowR, "right channel lost the intensity band")
  }

  test("short blocks (block_type 2) round-trip: IMDCT + reorder end to end") {
    val n = 8 * 1152
    val enc = Mp3.encodeMono(sine(n, 2000.0, 0.3)) // long-block reference
    val encS = Mp3.encode(Array(sine(n, 2000.0, 0.3)), shortBlocks = true)
    val dec = Mp3.decode(encS)
    assert(dec.frames == n)
    val lo = 3000; val len = 4410
    val tone = goertzelPower(dec.pcm(0), lo, len, 2000.0)
    val total = totalPower(dec.pcm(0), lo, len)
    assert(tone / total > 0.8,
      s"short-block tone fraction ${tone / total} — reorder/short-IMDCT broken")
    // rms parity with the long-block encode of the same content
    val rmsS = math.sqrt(dec.pcm(0).slice(lo, lo + len).map(v => v * v).sum / len)
    val rmsL = math.sqrt(Mp3.decode(enc).pcm(0).slice(lo, lo + len)
      .map(v => v * v).sum / len)
    assert(math.abs(rmsS / rmsL - 1.0) < 0.2, s"short rms $rmsS vs long $rmsL")
  }

  test("multi-frequency content round-trips with bounded error (SNR gate)") {
    val n = 8 * 1152
    val x = new Array[Double](n)
    for ((f, a) <- Seq((600.0, 0.15), (1700.0, 0.1), (4100.0, 0.08)))
      for (i <- 0 until n) x(i) += a * math.sin(2 * math.Pi * f * i / 44100.0)
    val dec = Mp3.decode(Mp3.encodeMono(x)).pcm(0)
    // codec delay: 481 (polyphase pair) + 576 (one-granule MDCT/IMDCT
    // TDAC offset) = 1057 samples; search around it for best alignment
    val lo = 2000; val len = 4000
    var best = -1e9
    for (d <- 1020 to 1100) {
      var se = 0.0; var sx = 0.0
      for (i <- lo until lo + len) {
        val e = x(i) - dec(i + d)
        se += e * e; sx += x(i) * x(i)
      }
      val snr = 10 * math.log10(sx / math.max(se, 1e-30))
      if (snr > best) best = snr
    }
    assert(best > 10.0, f"round-trip SNR $best%.1f dB — coarse 5-level " +
      "quantization should still clear 10 dB")
  }

  test("decode skips an ID3v2 prefix") {
    val enc = Mp3.encodeMono(sine(2 * 1152, 1000.0, 0.2))
    val tagBody = Array.tabulate[Byte](40)(i => (i * 3).toByte)
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 40) ++ tagBody
    val plain = Mp3.decode(enc)
    val tagged = Mp3.decode(id3 ++ enc)
    assert(tagged.frames == plain.frames)
    assert(tagged.pcm(0).sameElements(plain.pcm(0)))
  }

  test("lower bitrates produce shorter valid frames (tone still dominant)") {
    val n = 8 * 1152
    val enc320 = Mp3.encodeMono(sine(n, 1500.0, 0.2), bitrateIdx = 14)
    val enc128 = Mp3.encodeMono(sine(n, 1500.0, 0.2), bitrateIdx = 9)
    assert(enc128.length < enc320.length)
    val dec = Mp3.decode(enc128)
    val tone = goertzelPower(dec.pcm(0), 3000, 4410, 1500.0)
    val total = totalPower(dec.pcm(0), 3000, 4410)
    assert(tone / total > 0.8)
  }

  test("48 kHz and 32 kHz streams round-trip (the other two sfb tables)") {
    for (sr <- Seq(48000, 32000)) {
      val n = 8 * 1152
      // mid-subband tone (2.5 subband widths = 2.5*sr/64): a tone ON a
      // subband boundary splits across the filterbank crossover and the
      // 5-level quantizer turns the split into a depressed tone fraction
      // (measured 0.61 at 32 kHz with a 2000 Hz tone = exactly band 4's
      // edge) — that is fixture physics, not a table defect
      val freq = 2.5 * sr / 64.0
      val enc = Mp3.encode(Array(sine(n, freq, 0.3, sr = sr)),
        sampleRate = sr)
      // header sample-rate index must match
      assert(((enc(2) & 0x0C) >> 2) == Mp3.SampleRates.indexOf(sr))
      val dec = Mp3.decode(enc)
      assert(dec.sampleRate == sr && dec.frames == n)
      // len 4096 makes 2.5*sr/64 exactly DFT bin 160 (160/4096 = 2.5/64)
      // at every rate — off-bin leakage would depress the fraction
      val lo = 3000; val len = 4096
      val tone = goertzelPower(dec.pcm(0), lo, len, freq, sr = sr)
      val total = totalPower(dec.pcm(0), lo, len)
      assert(tone / total > 0.8,
        s"$sr Hz tone fraction ${tone / total} — sfb tables or frame " +
          "geometry broken at this rate")
    }
  }

  test("malformed payloads fail loudly") {
    intercept[IllegalArgumentException](Mp3.decode(Array[Byte](1, 2, 3, 4)))
    val enc = Mp3.encodeMono(new Array[Double](1152))
    intercept[IllegalArgumentException](Mp3.decode(enc.take(enc.length - 10)))
  }

  test("fuzz: mutated streams throw or succeed — never hang or escape") {
    // the decodeFeaturesSafe quarantine contract (the media-walker fuzz
    // convention): byte flips, truncations, and extensions of a valid
    // stream must either decode or raise a catchable exception — no
    // out-of-bounds escape, no unbounded loop
    val base = Mp3.encodeMono(sine(2 * 1152, 1100.0, 0.2))
    var s = 0x2545F4914F6CDD1DL
    def nextInt(bound: Int): Int = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (((s >>> 33) % bound).toInt + bound) % bound
    }
    var decoded = 0; var threw = 0
    for (trial <- 0 until 300) {
      val m = base.clone()
      val mutated: Array[Byte] = trial % 3 match {
        case 0 => // flip 1-4 bytes anywhere (header, side info, main data)
          for (_ <- 0 to nextInt(4)) {
            val p = nextInt(m.length)
            m(p) = (m(p) ^ (1 << nextInt(8))).toByte
          }
          m
        case 1 => m.take(nextInt(m.length)) // truncate
        case 2 => m ++ Array.fill(nextInt(64))(nextInt(256).toByte) // extend
      }
      try { Mp3.decode(mutated); decoded += 1 }
      catch {
        // IAE/ISE are the decode contract; an OOB/NPE escaping here is a
        // real bug and fails the suite
        case _: IllegalArgumentException | _: IllegalStateException =>
          threw += 1
      }
    }
    assert(decoded + threw == 300)
    assert(threw > 0, "no mutation ever threw — the fuzz is too gentle")
  }

  test("header walk (triage) and sample decode agree on stream geometry") {
    val n = 3 * 1152
    val enc = Mp3.encodeMono(sine(n, 800.0, 0.2))
    val (frames, _, sumBytes, samples, sr) = new Multimodal.Mp3HeaderDecoder().walk(enc)
    assert(frames == 3 && sr == 44100 && samples == n.toLong)
    assert(sumBytes == enc.length.toLong)
    assert(Mp3.decode(enc).frames == n)
  }

  test("envelope fingerprint: mp3 and wav encodings of one clip are near-dups") {
    // a clip with a strongly-shaped energy envelope (growing bursts)
    val n = 33 * 1330
    val x = Array.tabulate(n) { i =>
      val burst = i / 1330
      val amp = 0.02 + 0.9 * ((burst * 37) % 33) / 33.0
      amp * math.sin(2 * math.Pi * 700.0 * i / 44100.0)
    }
    val s16 = x.map(v => math.rint(v * 32767).toShort)
    val wavHash = new Multimodal.WavPcmDecoder()
      .envelopeHash64(Multimodal.encodeWavPcm(44100, s16))
    val mp3Hash = Mp3.envelopeHash64(Mp3.encodeMono(x))
    val hamming = java.lang.Long.bitCount(wavHash ^ mp3Hash)
    assert(hamming <= 6,
      s"mp3/wav fingerprints differ at Hamming $hamming — decode is unstable")
  }

  test("SampleDecoder features match WavPcmDecoder features on one clip") {
    val n = 4 * 1152
    val x = sine(n, 1200.0, 0.25)
    val mp3Feat = new Mp3.SampleDecoder().decode("mp3",
      Mp3.encodeMono(x))
    val wavFeat = new Multimodal.WavPcmDecoder().decode("wav",
      Multimodal.encodeWavPcm(44100,
        x.map(v => math.rint(v * 32767).toShort)))
    assert(mp3Feat.length == 4 && wavFeat.length == 4)
    assert(math.abs(mp3Feat(0) - wavFeat(0)) < 1e-6, "duration must match")
    assert(math.abs(mp3Feat(1) / wavFeat(1) - 1.0) < 0.3,
      s"rms ${mp3Feat(1)} vs ${wavFeat(1)}")
    assert(math.abs(mp3Feat(2) / wavFeat(2) - 1.0) < 0.3,
      s"zcr ${mp3Feat(2)} vs ${wavFeat(2)}")
  }
}
