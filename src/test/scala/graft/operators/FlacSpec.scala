package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class FlacSpec extends AnyFunSuite {

  /** Deterministic 16-bit test signal (LCG — no Random). */
  private def lcgSamples(n: Int, seed: Long = 0x9E3779B97F4A7C15L,
                         amp: Int = 20000): Array[Int] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33).toInt % amp)
    }
  }

  private def roundTrip(chans: Array[Array[Int]], bps: Int = 16,
                        blockSize: Int = 4096, sr: Int = 16000): Array[Byte] = {
    val enc = Flac.encode(sr, chans, bps, blockSize)
    val dec = Flac.decode(enc)
    assert(dec.sampleRate == sr)
    assert(dec.bps == bps)
    assert(dec.totalSamples == chans(0).length.toLong)
    assert(dec.md5Ok, "in-band MD5 must verify")
    assert(dec.channels.length == chans.length)
    chans.indices.foreach { c =>
      assert(dec.channels(c).sameElements(chans(c)), s"channel $c not lossless")
    }
    enc
  }

  test("mono round-trip is bit-exact across frame seams (short last block)") {
    roundTrip(Array(lcgSamples(10000)))             // 4096+4096+1808
    roundTrip(Array(lcgSamples(4096)))              // exactly one block
    roundTrip(Array(lcgSamples(1)))                 // single sample
    roundTrip(Array(lcgSamples(37)), blockSize = 16) // many tiny frames
  }

  test("constant signal takes the CONSTANT subframe: tiny stream, lossless") {
    val enc = roundTrip(Array(Array.fill(8192)(1234)))
    assert(enc.length < 120, s"constant 8192-sample stream was ${enc.length}B")
  }

  test("linear ramp compresses via fixed predictors") {
    val ramp = Array.tabulate(8192)(i => (i % 3000) - 1500)
    val enc = roundTrip(Array(ramp))
    assert(enc.length < 8192 * 2 / 4, s"ramp should beat 4:1, got ${enc.length}B")
  }

  test("full-range noise still round-trips (verbatim/escape fallback)") {
    var s = 42L
    val noise = Array.fill(5000) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 48).toInt - 32768
    }
    val enc = roundTrip(Array(noise))
    // incompressible input may not shrink, but must not blow up either
    assert(enc.length < 5000 * 2 + 400, s"noise stream was ${enc.length}B")
  }

  test("stereo round-trips under every profitable channel assignment") {
    val l = lcgSamples(6000)
    // near-identical right channel: drives the encoder to a side coding
    val rClose = l.zip(lcgSamples(6000, seed = 7L, amp = 40)).map { case (a, b) => a + b }
    roundTrip(Array(l, rClose))
    // independent channels
    roundTrip(Array(l, lcgSamples(6000, seed = 99L)))
    // identical channels (side = constant 0)
    roundTrip(Array(l, l.clone()))
    // mid/side-friendly: r = -l makes mid tiny
    roundTrip(Array(l, l.map(-_)))
  }

  test("correlated stereo beats independent coding") {
    val l = lcgSamples(6000)
    val r = l.map(_ + 3)
    val stereo = Flac.encode(16000, Array(l, r), 16, 4096)
    val indep = Flac.encode(16000, Array(l), 16, 4096).length +
      Flac.encode(16000, Array(r), 16, 4096).length
    assert(stereo.length < indep * 3 / 4,
      s"side coding should win clearly: $stereo.length vs $indep")
  }

  test("wasted bits: common trailing zeros round-trip") {
    val x = lcgSamples(4000, amp = 3000).map(_ * 8) // 3 wasted bits everywhere
    roundTrip(Array(x))
  }

  test("8-bit and 24-bit widths round-trip") {
    roundTrip(Array(lcgSamples(3000, amp = 120)), bps = 8)
    roundTrip(Array(lcgSamples(3000, amp = 4000000)), bps = 24)
  }

  test("corrupted frame byte fails the CRC check loudly") {
    val enc = Flac.encode(16000, Array(lcgSamples(2000)), 16, 4096)
    val bad = enc.clone()
    bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](Flac.decode(bad))
    assert(e.getMessage.contains("flac"), e.getMessage)
  }

  test("truncated stream fails loudly") {
    val enc = Flac.encode(16000, Array(lcgSamples(2000)), 16, 4096)
    intercept[IllegalArgumentException](
      Flac.decode(java.util.Arrays.copyOf(enc, enc.length - 3)))
  }

  test("tampered STREAMINFO MD5 is reported, and rawStats refuses it") {
    val enc = Flac.encode(16000, Array(lcgSamples(2000)), 16, 4096)
    // STREAMINFO md5 lives at bytes 4+4+18 .. +34 of the stream
    val bad = enc.clone()
    bad(4 + 4 + 18) = (bad(4 + 4 + 18) ^ 0x01).toByte
    assert(!Flac.decode(bad).md5Ok)
    intercept[IllegalArgumentException](Flac.rawStats(bad))
  }

  test("rawStats matches WavPcmDecoder.rawStats on identical PCM") {
    val xs = lcgSamples(7321)
    val flac = Flac.encodeFlacPcm(16000, xs.map(_.toShort))
    val wav = Multimodal.encodeWavPcm(16000, xs.map(_.toShort))
    assert(Flac.rawStats(flac) == new Multimodal.WavPcmDecoder().rawStats(wav))
  }

  test("FlacDecoder features match WavPcmDecoder features on identical PCM") {
    val xs = lcgSamples(5000)
    val flac = Flac.encodeFlacPcm(16000, xs.map(_.toShort))
    val wav = Multimodal.encodeWavPcm(16000, xs.map(_.toShort))
    val f = new Flac.FlacDecoder().decode("flac", flac)
    val w = new Multimodal.WavPcmDecoder().decode("wav", wav)
    f.zip(w).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6f, s"$a vs $b") }
  }

  // ------------------------------------------------------------------
  // Hand-crafted bitstream: proves the DECODER against spec arithmetic it
  // cannot have inherited from the encoder — an LPC subframe (which the
  // encoder never emits) with Rice2 residuals, blocksize code 6, and
  // hand-computed expected samples.
  // ------------------------------------------------------------------

  /** Minimal independent bit writer (MSB-first) for crafting streams. */
  private class W {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    private var acc = 0; private var nAcc = 0
    def bits(v: Long, n: Int): Unit = {
      var left = n
      while (left > 0) {
        val take = math.min(8 - nAcc, left)
        acc = (acc << take) | ((v >>> (left - take)) & ((1L << take) - 1)).toInt
        nAcc += take; left -= take
        if (nAcc == 8) { out += acc.toByte; acc = 0; nAcc = 0 }
      }
    }
    def unary(n: Int): Unit = { (0 until n).foreach(_ => bits(0, 1)); bits(1, 1) }
    def align(): Unit = if (nAcc != 0) bits(0, 8 - nAcc)
    def bytes: Array[Byte] = out.toArray
  }

  private def crc8Ref(b: Array[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= (x & 0xFF)
      (0 until 8).foreach(_ => c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF)
    }
    c
  }

  private def crc16Ref(b: Array[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= (x & 0xFF) << 8
      (0 until 8).foreach(_ => c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF else (c << 1) & 0xFFFF)
    }
    c
  }

  test("hand-crafted LPC + Rice2 frame decodes to hand-computed samples") {
    // LPC order 1, coeff 2, shift 1: x(n) = e(n) + floor(2*x(n-1) / 2)
    val warmup = 10
    val resid = Array(3, -1, 2, 0, 5, -4, 1)
    val expected = resid.scanLeft(warmup)((prev, e) => e + prev) // 10,13,12,14,14,19,15,16
    assert(expected.length == 8)

    val md5 = java.security.MessageDigest.getInstance("MD5")
    expected.foreach(v => md5.update(Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)))

    val w = new W
    w.bits(0x664C6143L, 32) // "fLaC"
    w.bits(0x80, 8); w.bits(34, 24) // last block, STREAMINFO
    w.bits(8, 16); w.bits(8, 16); w.bits(0, 24); w.bits(0, 24)
    w.bits(16000, 20); w.bits(0, 3); w.bits(15, 5); w.bits(8, 36)
    md5.digest().foreach(b => w.bits(b & 0xFFL, 8))

    val f = new W
    f.bits(0x3FFE, 14); f.bits(0, 1); f.bits(0, 1)
    f.bits(6, 4)  // blocksize code 6: 8-bit (bs-1) follows
    f.bits(0, 4)  // sample rate from STREAMINFO
    f.bits(0, 4)  // mono
    f.bits(4, 3)  // 16-bit
    f.bits(0, 1)
    f.bits(0, 8)  // frame number 0 (UTF-8 single byte)
    f.bits(7, 8)  // blocksize - 1
    f.align()
    f.bits(crc8Ref(f.bytes).toLong, 8)
    // subframe: pad 0, type LPC order 1 (0b100000), no wasted bits
    f.bits(0, 1); f.bits(32, 6); f.bits(0, 1)
    f.bits(warmup.toLong & 0xFFFF, 16) // warmup sample
    f.bits(2, 4)  // precision - 1 = 2 -> 3-bit coefficients
    f.bits(1, 5)  // shift = 1
    f.bits(2, 3)  // coefficient +2
    // residual: method 1 (Rice2), partition order 0, parameter 2
    f.bits(1, 2); f.bits(0, 4); f.bits(2, 5)
    resid.foreach { v =>
      val z = if (v >= 0) 2L * v else -2L * v - 1
      f.unary((z >>> 2).toInt); f.bits(z & 3, 2)
    }
    f.align()
    f.bits(crc16Ref(f.bytes).toLong, 16)

    val stream = w.bytes ++ f.bytes
    val dec = Flac.decode(stream)
    assert(dec.md5Ok, "crafted stream MD5 must verify")
    assert(dec.channels(0).sameElements(expected),
      s"got ${dec.channels(0).mkString(",")} want ${expected.mkString(",")}")
  }

  test("hand-crafted escape partition (raw residuals) decodes") {
    // fixed order 0 subframe, residual escape: 5-bit raw samples
    val vals = Array(-5, 3, 0, 7, -8, 1, 2, -1)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    vals.foreach(v => md5.update(Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)))

    val w = new W
    w.bits(0x664C6143L, 32)
    w.bits(0x80, 8); w.bits(34, 24)
    w.bits(8, 16); w.bits(8, 16); w.bits(0, 24); w.bits(0, 24)
    w.bits(16000, 20); w.bits(0, 3); w.bits(15, 5); w.bits(8, 36)
    md5.digest().foreach(b => w.bits(b & 0xFFL, 8))

    val f = new W
    f.bits(0x3FFE, 14); f.bits(0, 1); f.bits(0, 1)
    f.bits(6, 4); f.bits(0, 4); f.bits(0, 4); f.bits(4, 3); f.bits(0, 1)
    f.bits(0, 8); f.bits(7, 8)
    f.align(); f.bits(crc8Ref(f.bytes).toLong, 8)
    f.bits(0, 1); f.bits(8, 6); f.bits(0, 1) // FIXED order 0
    f.bits(0, 2); f.bits(0, 4)               // method 0, partition order 0
    f.bits(15, 4)                            // escape code
    f.bits(5, 5)                             // 5 raw bits per residual
    vals.foreach(v => f.bits(v.toLong & 0x1F, 5))
    f.align(); f.bits(crc16Ref(f.bytes).toLong, 16)

    val dec = Flac.decode(w.bytes ++ f.bytes)
    assert(dec.md5Ok)
    assert(dec.channels(0).sameElements(vals))
  }
}
