package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** A media asset row: opaque binary payload + typed metadata. */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                    meta_width: Int, meta_height: Int, meta_sample_rate: Int)

/** Decoded feature row produced by the (stubbed) decoder. */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                         checksum: Long, features: Array[Float])

/** [[MediaFeatures]] plus a quarantine column: `decode_error` is null for
  * good rows; failed rows carry the message and null features. */
case class MediaFeaturesSafe(media_id: Long, kind: String, n_bytes: Long,
                             checksum: Long, features: Array[Float],
                             decode_error: String)

/** Multimodal-column plumbing for image/audio/video payloads: binary columns
  * with typed metadata, batched per-partition decode → feature extraction.
  *
  * Real decoders: [[WavPcmDecoder]] (RIFF/16-bit PCM, plain byte walk),
  * [[PgmDecoder]] (netpbm P5, plain byte walk), [[ImageIoDecoder]]
  * (PNG/JPEG/BMP/GIF via the JDK's bundled `javax.imageio` readers — no
  * external codec dependency), [[graft.operators.Flac]] — a spec-complete
  * pure-JVM codec for the one COMPRESSED audio format whose spec is fully
  * algorithmic (lossless, so the q107 gate is exact) — and, since round 9,
  * [[graft.operators.Mp3]]: a Layer III SAMPLE decoder with the full
  * normative pipeline (reservoir, Huffman, requantize, IMDCT, polyphase)
  * whose validated-transcription boundaries are documented in its own
  * scaladoc. AAC/H264 sample decode stays behind [[StubDecoder]] (their
  * codebook data cannot be verified offline, and the JRE ships no such
  * codecs) — the stub produces deterministic pseudo-features from the
  * payload bytes until a [[DecoderProvider]] codec pack replaces it. Everything
  * Spark-side is real and tested — schema, batch shape (per-partition
  * iterator, so a decoder amortizes codec/model init per partition exactly
  * like a Pandas-UDF batch would), partitioning, and downstream feature
  * consumption (the features column feeds [[Ann]]).
  */
object Multimodal {

  /** Pluggable decoder: bytes → fixed-width feature vector. A production
    * impl would JNI/FFI into a codec + vision/audio model; init cost is
    * amortized per partition via mapPartitions. */
  trait Decoder extends Serializable {
    def featureDim: Int
    def decode(kind: String, payload: Array[Byte]): Array[Float]
  }

  /** Deterministic stand-in decoder: a cheap byte-histogram "embedding".
    * Stable across runs/executors — usable in tests and benchmarks.
    * Retirement path: a codec-pack jar implementing [[DecoderProvider]]
    * (ServiceLoader-discovered, [[DecoderProviders.routing]]) replaces this
    * per kind with a real compressed-sample decoder — no engine changes. */
  class StubDecoder(val featureDim: Int = 16) extends Decoder {
    def decode(kind: String, payload: Array[Byte]): Array[Float] = {
      val f = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) {
        f((payload(i) & 0xFF) % featureDim) += 1.0f
        i += 1
      }
      val n = math.max(payload.length, 1).toFloat
      var j = 0
      while (j < featureDim) { f(j) /= n; j += 1 }
      f
    }
  }

  /** REAL audio decoder for WAV / 16-bit PCM — the one mainstream media
    * container parseable with plain byte arithmetic, no codec library:
    * RIFF chunk walk → fmt (PCM, channels, sample rate) → data chunk →
    * channel-averaged samples. Features (fixed width 4):
    * `[duration_sec, rms, zero_crossing_rate, peak]`, amplitudes
    * normalized to [-1, 1]. Demonstrates that the [[decodeFeatures]]
    * plumbing runs an actual byte-level decoder end-to-end; of the
    * compressed formats, flac ([[Flac.FlacDecoder]]) and mp3
    * ([[Mp3.SampleDecoder]]) now sample-decode for real — only aac/h264
    * remain behind [[StubDecoder]], documented as requiring codecs this
    * container doesn't ship. Throws on malformed payloads — route by
    * `kind` upstream. */
  class WavPcmDecoder extends Decoder {
    val featureDim = 4

    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    def decode(kind: String, payload: Array[Byte]): Array[Float] = {
      require(payload.length >= 44 && tag(payload, 0) == "RIFF" &&
        tag(payload, 8) == "WAVE", "not a RIFF/WAVE payload")
      // chunk offset walks in Long: a corrupt size near 2^32 must overshoot
      // the payload and exit the loop, not wrap negative and stall it
      var off = 12L
      var channels = 0; var sampleRate = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      while (off + 8 <= payload.length && (dataOff < 0 || channels == 0)) {
        val o = off.toInt
        val id = tag(payload, o)
        val size = u32(payload, o + 4) // unsigned — never negative
        if (id == "fmt ") {
          require(u16(payload, o + 8) == 1, "only PCM (format 1) supported")
          channels = u16(payload, o + 10)
          sampleRate = u32(payload, o + 12).toInt
          bits = u16(payload, o + 22)
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
        } else if (id == "data") {
          dataOff = o + 8
          dataLen = math.min(size, (payload.length - dataOff).toLong).toInt
        }
        off += 8L + size + (size & 1L) // chunks pad to even length
      }
      require(channels > 0 && sampleRate > 0 && dataOff >= 0, "missing fmt/data chunk")
      val frames = dataLen / (2 * channels)
      var sumSq = 0.0; var peak = 0.0; var crossings = 0L; var prev = 0.0
      var i = 0
      while (i < frames) {
        var mix = 0.0
        var c = 0
        while (c < channels) {
          val o = dataOff + 2 * (i * channels + c)
          mix += ((payload(o) & 0xFF) | (payload(o + 1).toInt << 8)) / 32768.0
          c += 1
        }
        val x = mix / channels
        sumSq += x * x
        if (math.abs(x) > peak) peak = math.abs(x)
        if (i > 0 && ((prev < 0 && x >= 0) || (prev >= 0 && x < 0))) crossings += 1
        prev = x
        i += 1
      }
      val n = math.max(frames, 1)
      Array(
        frames.toFloat / sampleRate,
        math.sqrt(sumSq / n).toFloat,
        if (frames > 1) crossings.toFloat / (frames - 1) else 0.0f,
        peak.toFloat)
    }

    /** Exact integer statistics of a MONO payload's decoded samples:
      * (n, Σq, Σq², max q) — order-independent and overflow-safe for
      * ≤ ~8.5e9 samples at full scale, so a SQL oracle can recompute them
      * from the source values and any byte-level encode/decode defect
      * breaks the equality (the q52 round-trip gate). */
    def rawStats(payload: Array[Byte]): (Long, Long, Long, Long) = {
      require(payload.length >= 44 && tag(payload, 0) == "RIFF" &&
        tag(payload, 8) == "WAVE", "not a RIFF/WAVE payload")
      var off = 12L // Long walk: corrupt sizes overshoot instead of wrapping
      var dataOff = -1; var dataLen = 0; var channels = 0
      while (off + 8 <= payload.length && (dataOff < 0 || channels == 0)) {
        val o = off.toInt
        val id = tag(payload, o)
        val size = u32(payload, o + 4)
        if (id == "fmt ") channels = u16(payload, o + 10)
        else if (id == "data") {
          dataOff = o + 8
          dataLen = math.min(size, (payload.length - dataOff).toLong).toInt
        }
        off += 8L + size + (size & 1L)
      }
      require(channels == 1 && dataOff >= 0, "rawStats expects mono PCM")
      val frames = dataLen / 2
      var sumQ = 0L; var sumQ2 = 0L; var peak = Long.MinValue
      var i = 0
      while (i < frames) {
        val o = dataOff + 2 * i
        val q = ((payload(o) & 0xFF) | (payload(o + 1).toInt << 8)).toLong
        sumQ += q; sumQ2 += q * q
        if (q > peak) peak = q
        i += 1
      }
      (frames.toLong, sumQ, sumQ2, if (frames == 0) 0L else peak)
    }

    /** Energy-envelope transition hash (the dHash idea applied to audio:
      * split the clip into `frames` equal windows, bit k set iff window
      * k+1 has strictly more energy than window k). Exactly invariant to
      * positive amplitude scaling (energies scale together, comparisons
      * unchanged), so re-levelled copies of a clip collide at Hamming 0 —
      * feed to [[Dedup.hammingNearDupPairs]] for corpus-scale audio dedup.
      * Uses the first frames·⌊n/frames⌋ samples; requires ≥ `frames`
      * samples. Integer energies (Σq² per window) — no FP anywhere. */
    def envelopeHash64(payload: Array[Byte], frames: Int = 33): Long = {
      require(frames >= 2 && frames <= 65, "need 2..65 envelope frames")
      require(payload.length >= 44 && tag(payload, 0) == "RIFF" &&
        tag(payload, 8) == "WAVE", "not a RIFF/WAVE payload")
      var off = 12L
      var dataOff = -1; var dataLen = 0; var channels = 0
      while (off + 8 <= payload.length && (dataOff < 0 || channels == 0)) {
        val o = off.toInt
        val id = tag(payload, o)
        val size = u32(payload, o + 4)
        if (id == "fmt ") channels = u16(payload, o + 10)
        else if (id == "data") {
          dataOff = o + 8
          dataLen = math.min(size, (payload.length - dataOff).toLong).toInt
        }
        off += 8L + size + (size & 1L)
      }
      require(channels == 1 && dataOff >= 0, "envelopeHash64 expects mono PCM")
      val n = dataLen / 2
      val win = n / frames
      require(win >= 1, s"need >= $frames samples, got $n")
      val e = new Array[Long](frames)
      var k = 0
      while (k < frames) {
        var s = 0L
        var j = 0
        while (j < win) {
          val o = dataOff + 2 * (k * win + j)
          val q = ((payload(o) & 0xFF) | (payload(o + 1).toInt << 8)).toLong
          s += q * q
          j += 1
        }
        e(k) = s
        k += 1
      }
      var bits = 0L
      var i = 1
      while (i < frames) {
        if (e(i) > e(i - 1)) bits |= 1L << (i - 1)
        i += 1
      }
      bits
    }
  }

  /** [[WavPcmDecoder.envelopeHash64]]'s exact integer construction over
    * in-memory signed 16-bit samples — the shared core for decoders that
    * PRODUCE PCM rather than carry it (FLAC, MP3): Σq² per window,
    * strictly-increasing transition bits. Same windowing (first
    * frames·⌊n/frames⌋ samples), same comparisons, so an mp3 and a wav
    * encoding of the same clip hash to nearby (lossy) or identical
    * (lossless) fingerprints. */
  def envelopeHashSamples(samples: Array[Short], frames: Int = 33): Long = {
    require(frames >= 2 && frames <= 65, "need 2..65 envelope frames")
    val n = samples.length
    val win = n / frames
    require(win >= 1, s"need >= $frames samples, got $n")
    val e = new Array[Long](frames)
    var k = 0
    while (k < frames) {
      var s = 0L
      var j = 0
      while (j < win) {
        val q = samples(k * win + j).toLong
        s += q * q
        j += 1
      }
      e(k) = s
      k += 1
    }
    var bits = 0L
    var i = 1
    while (i < frames) {
      if (e(i) > e(i - 1)) bits |= 1L << (i - 1)
      i += 1
    }
    bits
  }

  /** Encode 16-bit mono PCM samples as a WAV payload (the synthesis half
    * of the round-trip gate: encode → [[WavPcmDecoder]] → exact stats). */
  def encodeWavPcm(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(1)
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2); bb.putShort(2)
    bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** REAL image decoder for binary PGM (netpbm P5) — like WAV, parseable
    * with plain bytes: ASCII header (`P5 <w> <h> <maxval>`, `#` comments)
    * then w·h gray samples. Features (fixed width 4):
    * `[width, height, mean, std]` with intensities normalized by maxval.
    * Compressed image formats (jpeg/png) stay behind [[StubDecoder]]. */
  class PgmDecoder extends Decoder {
    val featureDim = 4

    /** (width, height, maxval, pixel offset) from a P5 header. */
    private[operators] def header(b: Array[Byte]): (Int, Int, Int, Int) = {
      require(b.length > 2 && b(0) == 'P' && b(1) == '5', "not a P5 PGM payload")
      var off = 2
      val fields = new Array[Int](3)
      var got = 0
      while (got < 3) {
        while (off < b.length &&
          (Character.isWhitespace(b(off)) || b(off) == '#')) {
          if (b(off) == '#') while (off < b.length && b(off) != '\n') off += 1
          else off += 1
        }
        var v = 0
        require(off < b.length && b(off) >= '0' && b(off) <= '9', "bad PGM header")
        while (off < b.length && b(off) >= '0' && b(off) <= '9') {
          v = v * 10 + (b(off) - '0'); off += 1
        }
        fields(got) = v; got += 1
      }
      require(off < b.length && Character.isWhitespace(b(off)), "bad PGM header")
      off += 1 // exactly ONE whitespace byte before pixel data, per spec
      require(fields(2) > 0 && fields(2) < 256, "only 8-bit PGM supported")
      (fields(0), fields(1), fields(2), off)
    }

    def decode(kind: String, payload: Array[Byte]): Array[Float] = {
      val (w, h, maxval, off) = header(payload)
      // partial images fail loudly, matching WavPcmDecoder's contract
      require(payload.length - off >= w.toLong * h, "truncated PGM payload")
      val n = w * h
      var sum = 0.0; var sumSq = 0.0
      var i = 0
      while (i < n) {
        val x = (payload(off + i) & 0xFF).toDouble / maxval
        sum += x; sumSq += x * x
        i += 1
      }
      val m = if (n > 0) sum / n else 0.0
      val variance = if (n > 0) math.max(sumSq / n - m * m, 0.0) else 0.0
      Array(w.toFloat, h.toFloat, m.toFloat, math.sqrt(variance).toFloat)
    }

    /** Exact integer statistics of the RAW (unnormalized, 0..maxval) pixel
      * bytes: (n, Σp, Σp², max p) — order-independent and overflow-safe, the
      * PGM twin of [[WavPcmDecoder.rawStats]] for the q53 round-trip gate. */
    def rawStats(payload: Array[Byte]): (Long, Long, Long, Long) = {
      val (w, h, _, off) = header(payload)
      require(payload.length - off >= w.toLong * h, "truncated PGM payload")
      val n = w * h
      var sum = 0L; var sumSq = 0L; var mx = Long.MinValue
      var i = 0
      while (i < n) {
        val p = (payload(off + i) & 0xFF).toLong
        sum += p; sumSq += p * p
        if (p > mx) mx = p
        i += 1
      }
      (n.toLong, sum, sumSq, if (n == 0) 0L else mx)
    }

    /** 8×8 average-hash (aHash — the classic perceptual image fingerprint:
      * resize to 8×8, bit i set iff pixel i exceeds the floor of the 64
      * pixels' mean). Robust to uniform brightness shifts (pixels and mean
      * move together; only clamped pixels flip bits), so near-identical
      * images land within a small Hamming radius — feed the output to
      * [[Dedup.hammingNearDupPairs]] for corpus-scale image dedup. */
    def aHash64(payload: Array[Byte]): Long = {
      val small = resize(payload, 8, 8)
      val (_, _, _, off) = header(small)
      var sum = 0L
      var i = 0
      while (i < 64) { sum += (small(off + i) & 0xFF); i += 1 }
      val mean = sum / 64
      var bits = 0L
      i = 0
      while (i < 64) {
        if ((small(off + i) & 0xFF) > mean) bits |= (1L << i)
        i += 1
      }
      bits
    }

    /** Nearest-neighbor resize → a new P5 payload (the brief's "resize"
      * media transform, runnable inside the same mapPartitions batch). */
    def resize(payload: Array[Byte], ow: Int, oh: Int): Array[Byte] = {
      val (w, h, maxval, off) = header(payload)
      require(payload.length - off >= w.toLong * h, "truncated PGM payload")
      val head = s"P5\n$ow $oh\n$maxval\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](head.length + ow * oh)
      System.arraycopy(head, 0, out, 0, head.length)
      var y = 0
      while (y < oh) {
        val sy = (y.toLong * h / oh).toInt
        var x = 0
        while (x < ow) {
          val sx = (x.toLong * w / ow).toInt
          out(head.length + y * ow + x) = payload(off + sy * w + sx)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** javax.sound SPI providers resolved ONCE per JVM and invoked directly.
    * Every `AudioSystem.*` entry point re-runs ServiceLoader provider
    * discovery PER CALL, and that discovery's classloader lock serializes
    * executor threads — measured 13× at 32 threads on 16k small-clip
    * encode+decode rounds (0.12 s cached vs 1.60 s through AudioSystem),
    * which turned the q56 decode stage into a near-serial stage at scale.
    * The provider instances themselves are stateless and thread-safe. */
  private[operators] object AudioSpi {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
    import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter, FormatConversionProvider}
    import scala.jdk.CollectionConverters._
    // AudioSystem discovers via the thread-context classloader; do the
    // same (falling back to this class' loader) so third-party SPI jars
    // on the application classpath stay visible. The snapshot is taken
    // ONCE, at first use — providers added to the classpath later (not a
    // thing in a Spark executor) would need a JVM restart.
    private def load[T](cls: Class[T]): Vector[T] = {
      val cl = Option(Thread.currentThread().getContextClassLoader)
        .getOrElse(cls.getClassLoader)
      java.util.ServiceLoader.load(cls, cl).asScala.toVector
    }
    private lazy val readers = load(classOf[AudioFileReader])
    private lazy val writers = load(classOf[AudioFileWriter])
    private lazy val converters = load(classOf[FormatConversionProvider])

    def read(payload: Array[Byte]): AudioInputStream = {
      val it = readers.iterator
      while (it.hasNext) {
        try return it.next().getAudioInputStream(new java.io.ByteArrayInputStream(payload))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
      }
      throw new IllegalArgumentException("unrecognized audio payload")
    }

    def convert(target: AudioFormat, in: AudioInputStream): AudioInputStream =
      converters.find(_.isConversionSupported(target, in.getFormat)) match {
        case Some(c) => c.getAudioInputStream(target, in)
        case None => throw new IllegalArgumentException(
          s"no conversion from ${in.getFormat} to $target")
      }

    def write(in: AudioInputStream, tpe: AudioFileFormat.Type,
              out: java.io.OutputStream): Unit =
      writers.find(_.isFileTypeSupported(tpe, in)) match {
        case Some(w) => w.write(in, tpe, out); ()
        case None => throw new IllegalArgumentException(s"no writer for $tpe")
      }
  }

  /** Audio decoder backed by the JDK's bundled `javax.sound.sampled`
    * service providers: AIFF / AU / WAV containers, and — via the JRE's
    * G.711 codecs — µ-law/a-law COMPRESSED payloads, expanded to linear
    * 16-bit PCM through the cached [[AudioSpi]] provider chain.
    * Same feature contract as [[WavPcmDecoder]]
    * (`[duration_sec, rms, zero_crossing_rate, peak]`, amplitudes in
    * [-1, 1]); throws on unrecognized payloads. [[WavPcmDecoder]] remains
    * the zero-dependency byte-walk reference implementation the q52 gate
    * exercises; this one widens the container/codec matrix (q56 gates the
    * AIFF path end-to-end). */
  class AudioSystemDecoder extends Decoder {
    val featureDim = 4
    import javax.sound.sampled.AudioFormat

    /** Payload → mono-mixed normalized samples via the JDK providers. */
    private def samples(payload: Array[Byte]): (Array[Double], Float) = {
      val in0 = AudioSpi.read(payload)
      val f0 = in0.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        f0.getSampleRate, 16, f0.getChannels, f0.getChannels * 2,
        f0.getSampleRate, false)
      val in = if (f0.matches(target)) in0
               else AudioSpi.convert(target, in0)
      val bytes = in.readAllBytes()
      val ch = target.getChannels
      val frames = bytes.length / (2 * ch)
      val out = new Array[Double](frames)
      var i = 0
      while (i < frames) {
        var mix = 0.0
        var c = 0
        while (c < ch) {
          val o = 2 * (i * ch + c)
          mix += ((bytes(o) & 0xFF) | (bytes(o + 1).toInt << 8)) / 32768.0
          c += 1
        }
        out(i) = mix / ch
        i += 1
      }
      (out, target.getSampleRate)
    }

    def decode(kind: String, payload: Array[Byte]): Array[Float] = {
      val (xs, rate) = samples(payload)
      var sumSq = 0.0; var peak = 0.0; var crossings = 0L
      var i = 0
      while (i < xs.length) {
        val x = xs(i)
        sumSq += x * x
        if (math.abs(x) > peak) peak = math.abs(x)
        if (i > 0 && ((xs(i - 1) < 0 && x >= 0) || (xs(i - 1) >= 0 && x < 0)))
          crossings += 1
        i += 1
      }
      val n = math.max(xs.length, 1)
      Array(xs.length.toFloat / rate, math.sqrt(sumSq / n).toFloat,
        if (xs.length > 1) crossings.toFloat / (xs.length - 1) else 0.0f,
        peak.toFloat)
    }

    /** Exact integer stats of a MONO 16-bit payload's samples
      * (n, Σq, Σq², max q) — [[WavPcmDecoder.rawStats]]'s contract through
      * the JDK provider chain, for the q56 AIFF round-trip gate. */
    def rawStats(payload: Array[Byte]): (Long, Long, Long, Long) = {
      val (xs, _) = samples(payload)
      var sumQ = 0L; var sumQ2 = 0L; var peak = Long.MinValue
      var i = 0
      while (i < xs.length) {
        val q = math.round(xs(i) * 32768.0)
        sumQ += q; sumQ2 += q * q
        if (q > peak) peak = q
        i += 1
      }
      (xs.length.toLong, sumQ, sumQ2, if (xs.isEmpty) 0L else peak)
    }
  }

  /** Encode 16-bit mono PCM samples through a REAL JDK audio writer —
    * `javax.sound.sampled.AudioFileFormat.Type` AIFF (big-endian) or AU —
    * the synthesis half of the q56 round-trip gate and [[encodeWavPcm]]'s
    * provider-backed twin. */
  def encodeAudio(sampleRate: Int, samples: Array[Short],
                  fileType: String = "AIFF"): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
    val bigEndian = fileType != "WAVE"
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, bigEndian)
    val raw = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN
             else java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(raw.putShort)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw.array()), fmt, samples.length.toLong)
    val tpe = fileType match {
      case "AIFF" => AudioFileFormat.Type.AIFF
      case "AU"   => AudioFileFormat.Type.AU
      case "WAVE" => AudioFileFormat.Type.WAVE
      case other  => throw new IllegalArgumentException(s"unsupported type $other")
    }
    val bos = new java.io.ByteArrayOutputStream()
    AudioSpi.write(ais, tpe, bos) // cached providers — see AudioSpi
    bos.toByteArray
  }

  /** REAL compressed-image decoder backed by the JDK's bundled
    * `javax.imageio` readers — PNG, JPEG, BMP, GIF, and WBMP ship with
    * every JRE, so this adds NO external codec dependency and closes the
    * "compressed images stay stubbed" gap. Features (fixed width 4):
    * `[width, height, mean, std]` over 8-bit integer luma normalized by
    * 255 — the raw raster sample for single-band (gray) images, ITU-R
    * BT.601 integer luma `(77R + 150G + 29B + 128) >> 8` for color (the
    * raster path matters: `getRGB` on a gray image applies a colorspace
    * transform and would destroy the exactness the q55 round-trip gate
    * hashes). Throws on undecodable payloads, matching [[WavPcmDecoder]]'s
    * contract. Compressed audio/video stay behind [[StubDecoder]]. */
  class ImageIoDecoder extends Decoder {
    val featureDim = 4

    private def read(payload: Array[Byte]): java.awt.image.BufferedImage = {
      // no temp-file cache: per-record disk churn in a tight partition loop
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "undecodable image payload (no ImageIO reader matched)")
      img
    }

    /** Exact integer 8-bit luma stats (n, Σy, Σy², max y) — for LOSSLESS
      * formats (PNG/BMP) over gray sources these equal the source pixel
      * stats, so a SQL oracle can replay them from the raw values straight
      * through the deflate round-trip (the q55 gate); the PNG/JPEG twin of
      * [[PgmDecoder.rawStats]]. */
    def rawStats(payload: Array[Byte]): (Long, Long, Long, Long) =
      statsOf(read(payload))

    private def statsOf(img: java.awt.image.BufferedImage): (Long, Long, Long, Long) = {
      val w = img.getWidth; val h = img.getHeight
      val raster = img.getRaster
      val gray = raster.getNumBands == 1 && img.getColorModel.getPixelSize == 8
      var sum = 0L; var sumSq = 0L; var mx = Long.MinValue
      val rgbRow = if (gray) null else new Array[Int](w)
      val grayRow = if (gray) new Array[Int](w) else null
      var y = 0
      while (y < h) {
        if (gray) raster.getSamples(0, y, w, 1, 0, grayRow)
        else img.getRGB(0, y, w, 1, rgbRow, 0, w)
        var x = 0
        while (x < w) {
          val v =
            if (gray) grayRow(x).toLong
            else {
              val p = rgbRow(x)
              ((77 * ((p >> 16) & 0xFF) + 150 * ((p >> 8) & 0xFF) +
                29 * (p & 0xFF) + 128) >> 8).toLong
            }
          sum += v; sumSq += v * v
          if (v > mx) mx = v
          x += 1
        }
        y += 1
      }
      (w.toLong * h, sum, sumSq, if (w * h == 0) 0L else mx)
    }

    def decode(kind: String, payload: Array[Byte]): Array[Float] = {
      val img = read(payload)
      val (n, s1, s2, _) = statsOf(img)
      val m = if (n > 0) s1.toDouble / n / 255.0 else 0.0
      val ex2 = if (n > 0) s2.toDouble / n / (255.0 * 255.0) else 0.0
      Array(img.getWidth.toFloat, img.getHeight.toFloat, m.toFloat,
        math.sqrt(math.max(ex2 - m * m, 0.0)).toFloat)
    }
  }

  /** Encode 8-bit gray pixels (row-major, 0..255) through a REAL JDK image
    * writer (`"png"`, `"jpg"`, `"bmp"`, `"gif"`) — the synthesis half of
    * the q55 round-trip gate: PNG is lossless, so
    * `ImageIoDecoder.rawStats(encodeImage(..., "png"))` must equal the
    * source pixel stats through an actual deflate compress/decompress. */
  def encodeImage(w: Int, h: Int, pixels: Array[Int], format: String): Array[Byte] = {
    require(pixels.length == w * h, "pixels must be w*h")
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSamples(0, 0, w, h, 0, pixels)
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos),
      s"no ImageIO writer for format '$format'")
    bos.toByteArray
  }

  /** Encode 8-bit gray pixels as JPEG at an EXPLICIT compression quality
    * (`ImageWriteParam.MODE_EXPLICIT`) — the q55 lossy gate pins the
    * encoder setting rather than riding on a JRE vendor's default quality,
    * whose quantization tables (and thus the decoded means the gate
    * bounds) are vendor/version-specific. */
  def encodeJpeg(w: Int, h: Int, pixels: Array[Int],
                 quality: Float = 0.9f,
                 progressive: Boolean = false): Array[Byte] = {
    require(pixels.length == w * h, "pixels must be w*h")
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSamples(0, 0, w, h, 0, pixels)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    if (progressive) // real progressive scan script (SOF2), not baseline
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Encode 8-bit gray pixels (row-major, 0..255) as a binary-PGM (P5)
    * payload — the synthesis half of the q53 round-trip gate. */
  def encodePgm(w: Int, h: Int, pixels: Array[Int], maxval: Int = 255): Array[Byte] = {
    require(pixels.length == w * h, "pixels must be w*h")
    val head = s"P5\n$w $h\n$maxval\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](head.length + pixels.length)
    System.arraycopy(head, 0, out, 0, head.length)
    var i = 0
    while (i < pixels.length) {
      out(head.length + i) = pixels(i).toByte
      i += 1
    }
    out
  }

  /** MP3 (MPEG-1/2 Audio Layer III) frame-HEADER walk — container metadata
    * WITHOUT audio decode. The JRE ships no MP3 codec, but none is needed
    * for the first stage of a 100 TB media pipeline: filtering/routing by
    * duration, bitrate, and sample rate only requires walking the public
    * frame-header layout (11-bit sync, version/layer bits, bitrate and
    * sample-rate table indices, padding bit) and summing per-frame sizes —
    * `frameBytes = 144000·kbps/sampleRate + padding` for MPEG-1 Layer III.
    * Handles VBR streams exactly (every frame header is visited, not just
    * the first), skips a leading ID3v2 tag (syncsafe size) and a trailing
    * 128-byte ID3v1 tag, and throws on junk/truncation like the other
    * decoders (route untrusted payloads via [[decodeFeaturesSafe]]).
    * Features (fixed width 4): `[duration_sec, mean_kbps, sample_rate,
    * n_frames]`. Audio SAMPLE decode (Huffman/MDCT) stays behind
    * [[StubDecoder]] — that genuinely needs a codec. */
  /** MPEG-1 Layer III bitrate table (kbps, index 1..14) — shared by the
    * walker and the synthesis half so the q58 round-trip can't be satisfied
    * by two diverged copies. */
  private val Mp3KbpsV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
    192, 224, 256, 320)

  class Mp3HeaderDecoder extends Decoder {
    val featureDim = 4

    private val kbpsV1 = Mp3KbpsV1
    private val kbpsV2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
      128, 144, 160)
    private val srV1 = Array(44100, 48000, 32000)

    /** Offset of the first byte past an ID3v2 prefix (0 if none).
      * ID3v2: "ID3" ver(2) flags(1) syncsafe-size(4); footer flag adds 10. */
    private def id3End(payload: Array[Byte]): Long =
      if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' &&
          payload(2) == '3') {
        val size = ((payload(6) & 0x7FL) << 21) | ((payload(7) & 0x7FL) << 14) |
          ((payload(8) & 0x7FL) << 7) | (payload(9) & 0x7FL)
        10L + size + (if ((payload(5) & 0x10) != 0) 10L else 0L)
      } else 0L

    private def u32be(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
        ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    private def tag4(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** O(1) VBR duration: (frame count, audio byte total) from a Xing/Info
      * or VBRI header in the FIRST frame, without walking the stream — the
      * triage path when an encoder wrote a TOC (every mainstream VBR
      * encoder does). Layouts are public: Xing/Info sits right after the
      * first frame's side info (MPEG1: 17 bytes mono / 32 otherwise;
      * MPEG2/2.5: 9 / 17), `flags(u32) [frames u32 if flags&1] [bytes u32
      * if flags&2]`; VBRI sits at a FIXED 32 bytes past the header,
      * `version(2) delay(2) quality(2) bytes(u32) frames(u32)`. Counts
      * exclude the TOC frame itself (the encoder convention — it carries
      * no audio). None when the stream has no TOC (CBR without Info, or
      * not an MP3 frame at all): fall back to [[walk]]. */
    def vbrInfo(payload: Array[Byte]): Option[(Long, Long)] = {
      val start = id3End(payload)
      if (start + 4 > payload.length) return None
      val o = start.toInt
      val b1 = payload(o) & 0xFF; val b2 = payload(o + 1) & 0xFF
      val b3p = payload(o + 3) & 0xFF
      if (b1 != 0xFF || (b2 & 0xE0) != 0xE0) return None
      val version = (b2 >> 3) & 3
      if (version == 1) return None
      val mono = ((b3p >> 6) & 3) == 3
      val sideInfo =
        if (version == 3) { if (mono) 17 else 32 }
        else { if (mono) 9 else 17 }
      val xingOff = o + 4 + sideInfo
      if (xingOff + 8 <= payload.length &&
          (tag4(payload, xingOff) == "Xing" || tag4(payload, xingOff) == "Info")) {
        val flags = u32be(payload, xingOff + 4)
        var p = xingOff + 8
        var frames = -1L; var bytes = -1L
        if ((flags & 1L) != 0 && p + 4 <= payload.length) {
          frames = u32be(payload, p); p += 4
        }
        if ((flags & 2L) != 0 && p + 4 <= payload.length) bytes = u32be(payload, p)
        if (frames >= 0 && bytes >= 0) return Some((frames, bytes))
      }
      val vbriOff = o + 4 + 32
      if (vbriOff + 18 <= payload.length && tag4(payload, vbriOff) == "VBRI") {
        val bytes = u32be(payload, vbriOff + 10)
        val frames = u32be(payload, vbriOff + 14)
        return Some((frames, bytes))
      }
      None
    }

    /** (n_frames, Σkbps, Σframe_bytes, Σsamples, sample_rate). Exact
      * integers — the q58 oracle replays the per-frame length arithmetic
      * from the raw table. */
    def walk(payload: Array[Byte]): (Long, Long, Long, Long, Int) = {
      var off = id3End(payload)
      var frames = 0L; var sumKbps = 0L; var sumBytes = 0L; var sumSamples = 0L
      var sampleRate = 0
      var done = false
      while (!done && off < payload.length) {
        val o = off.toInt
        if (payload.length - off == 128 && payload(o) == 'T' &&
            payload(o + 1) == 'A' && payload(o + 2) == 'G') {
          done = true // trailing ID3v1 tag
        } else {
          require(off + 4 <= payload.length, "truncated MP3 frame header")
          val b1 = payload(o) & 0xFF; val b2 = payload(o + 1) & 0xFF
          val b3 = payload(o + 2) & 0xFF
          require(b1 == 0xFF && (b2 & 0xE0) == 0xE0, "lost MP3 frame sync")
          val version = (b2 >> 3) & 3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
          require(version != 1, "reserved MPEG version")
          require(((b2 >> 1) & 3) == 1, "only Layer III supported")
          val bi = (b3 >> 4) & 15
          require(bi >= 1 && bi <= 14, "free/bad bitrate index")
          val si = (b3 >> 2) & 3
          require(si != 3, "reserved sample-rate index")
          val pad = (b3 >> 1) & 1
          val v1 = version == 3
          val kbps = if (v1) kbpsV1(bi) else kbpsV2(bi)
          val sr = srV1(si) >> (if (v1) 0 else if (version == 2) 1 else 2)
          require(sampleRate == 0 || sr == sampleRate,
            "sample rate changed mid-stream")
          sampleRate = sr
          val len = (if (v1) 144000L else 72000L) * kbps / sr + pad
          require(off + len <= payload.length, "truncated MP3 frame")
          frames += 1; sumKbps += kbps; sumBytes += len
          sumSamples += (if (v1) 1152L else 576L)
          off += len
        }
      }
      require(frames > 0, "no MP3 frames found")
      (frames, sumKbps, sumBytes, sumSamples, sampleRate)
    }

    def decode(kind: String, payload: Array[Byte]): Array[Float] = {
      val (frames, sumKbps, _, samples, sr) = walk(payload)
      Array(samples.toFloat / sr, sumKbps.toFloat / frames, sr.toFloat,
        frames.toFloat)
    }
  }

  /** Synthesize a structurally-valid MPEG-1 Layer III stream from
    * per-frame (bitrateIndex 1..14, padding 0|1) pairs at 44.1 kHz, with a
    * deterministic ID3v2 prefix (exercises the skip path) and filler frame
    * bodies — the synthesis half of the q58 gate. The parser never reads
    * sample data, so structural validity (headers + exact frame lengths)
    * is what's under test, mirroring how a real pipeline triages media
    * before paying for decode. */
  def encodeMp3Frames(frames: Array[(Int, Int)],
                      xingHeader: Boolean = false): Array[Byte] = {
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 12,
      'T', 'X', 'X', 'X', 0, 0, 0, 2, 0, 0, 0, 'g') // 10 hdr + 12 body
    val lens = frames.map { case (bi, pad) =>
      require(bi >= 1 && bi <= 14 && (pad == 0 || pad == 1), "bad frame spec")
      (144000L * Mp3KbpsV1(bi) / 44100 + pad).toInt
    }
    // optional leading Xing TOC frame (bi=9/128kbps, mono → side info 17):
    // a REAL frame whose body carries "Xing" + flags + frame/byte counts of
    // the AUDIO frames (the encoder convention: the TOC frame itself is
    // excluded) — the O(1)-duration half of the q58 gate
    val xingLen = if (xingHeader) (144000L * Mp3KbpsV1(9) / 44100).toInt else 0
    val out = new Array[Byte](id3.length + xingLen + lens.sum)
    System.arraycopy(id3, 0, out, 0, id3.length)
    var off = id3.length
    if (xingHeader) {
      out(off) = 0xFF.toByte
      out(off + 1) = 0xFB.toByte // sync|MPEG1|LayerIII|no-CRC
      out(off + 2) = (9 << 4).toByte // bi=9, no padding, sr index 0
      out(off + 3) = 0xC0.toByte // single channel → side info 17 bytes
      val x = off + 4 + 17
      out(x) = 'X'; out(x + 1) = 'i'; out(x + 2) = 'n'; out(x + 3) = 'g'
      def putU32(o: Int, v: Long): Unit = {
        out(o) = (v >> 24).toByte; out(o + 1) = (v >> 16).toByte
        out(o + 2) = (v >> 8).toByte; out(o + 3) = v.toByte
      }
      putU32(x + 4, 0x3L) // flags: frames + bytes present
      putU32(x + 8, frames.length.toLong)
      putU32(x + 12, lens.map(_.toLong).sum)
      off += xingLen
    }
    var i = 0
    while (i < frames.length) {
      val (bi, pad) = frames(i)
      out(off) = 0xFF.toByte
      out(off + 1) = 0xFB.toByte // sync|MPEG1|LayerIII|no-CRC
      out(off + 2) = ((bi << 4) | pad << 1).toByte // sr index 0 = 44100
      out(off + 3) = 0xC0.toByte // single channel
      var j = 4 // deterministic filler "audio" bytes
      while (j < lens(i)) { out(off + j) = ((i * 31 + j) & 0x7F).toByte; j += 1 }
      off += lens(i)
      i += 1
    }
    out
  }

  /** The 13-entry ADTS sampling-frequency table (index 0..12, ISO/IEC
    * 14496-3) — shared by the walker and the synthesis half so the q154
    * round-trip can't be satisfied by two diverged copies. */
  private val AdtsSampleRates = Array(96000, 88200, 64000, 48000, 44100,
    32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** ADTS (the MPEG-4 AAC transport framing, ISO/IEC 14496-3 §1.A.3)
    * header walk — AAC audio triage WITHOUT a sample decoder, the
    * [[Mp3HeaderDecoder]]/[[Mp4BoxDecoder]] shape for the third major
    * compressed-audio framing a crawl sees: syncword-framed fixed
    * headers carry profile (audio object type), sampling-frequency
    * index, channel configuration, CRC presence, the 13-bit whole-frame
    * length, and the raw-data-block count (1024 samples each), so a
    * 100 TB pipeline can compute duration/bitrate/channel columns and
    * route/filter mixed audio corpora BEFORE paying for sample decode.
    * AAC SAMPLE decode itself stays behind [[StubDecoder]] /
    * [[DecoderProvider]] — that genuinely needs a codec; frame TRIAGE
    * does not. Malformed payloads throw (the quarantine path:
    * [[decodeFeaturesSafe]]-style callers catch per row).
    * Features (fixed width 4): `[duration_sec, sample_rate, channels,
    * n_frames]`. */
  class AdtsHeaderDecoder extends Decoder {
    val featureDim = 4

    /** Exact integer stream stats: frame count, total samples
      * (1024 × raw blocks), sample rate, channel config, profile
      * (audio object type, 1-based: 2 = AAC-LC), Σ whole-frame bytes,
      * and how many frames carry a CRC. */
    case class AdtsMeta(frames: Long, samples: Long, sampleRate: Int,
                        channels: Int, profile: Int, sumBytes: Long,
                        crcFrames: Long)

    /** Offset of the first byte past an ID3v2 prefix (0 if none) — ADTS
      * files in the wild carry the same tag prefix MP3s do. */
    private def id3End(payload: Array[Byte]): Long =
      if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' &&
          payload(2) == '3') {
        val size = ((payload(6) & 0x7FL) << 21) | ((payload(7) & 0x7FL) << 14) |
          ((payload(8) & 0x7FL) << 7) | (payload(9) & 0x7FL)
        10L + size + (if ((payload(5) & 0x10) != 0) 10L else 0L)
      } else 0L

    def walk(payload: Array[Byte]): AdtsMeta = {
      var off = id3End(payload)
      var frames = 0L; var samples = 0L; var sumBytes = 0L; var crcFrames = 0L
      var sampleRate = 0; var channels = 0; var profile = 0
      while (off < payload.length) {
        val o = off.toInt
        require(off + 7 <= payload.length, "truncated ADTS header")
        val b1 = payload(o) & 0xFF; val b2 = payload(o + 1) & 0xFF
        val b3 = payload(o + 2) & 0xFF; val b4 = payload(o + 3) & 0xFF
        val b5 = payload(o + 4) & 0xFF; val b6 = payload(o + 5) & 0xFF
        val b7 = payload(o + 6) & 0xFF
        require(b1 == 0xFF && (b2 & 0xF0) == 0xF0, "lost ADTS frame sync")
        require(((b2 >> 1) & 3) == 0, "ADTS layer bits must be 0")
        val protAbsent = b2 & 1
        val prof = ((b3 >> 6) & 3) + 1 // 2-bit field stores AOT - 1
        val srIdx = (b3 >> 2) & 15
        require(srIdx <= 12, "reserved ADTS sampling-frequency index")
        val sr = AdtsSampleRates(srIdx)
        val ch = ((b3 & 1) << 2) | ((b4 >> 6) & 3)
        require(ch >= 1, "channel configuration 0 (in-band PCE) unsupported")
        val frameLen = ((b4 & 3) << 11) | (b5 << 3) | ((b6 >> 5) & 7)
        val headerLen = if (protAbsent == 1) 7 else 9
        require(frameLen >= headerLen,
          "ADTS frame length smaller than its own header")
        require(off + frameLen <= payload.length, "truncated ADTS frame")
        val blocks = (b7 & 3) + 1
        require(sampleRate == 0 || sr == sampleRate,
          "sample rate changed mid-stream")
        require(channels == 0 || ch == channels,
          "channel configuration changed mid-stream")
        require(profile == 0 || prof == profile, "profile changed mid-stream")
        sampleRate = sr; channels = ch; profile = prof
        frames += 1; samples += 1024L * blocks; sumBytes += frameLen
        crcFrames += (1 - protAbsent)
        off += frameLen
      }
      require(frames > 0, "no ADTS frames found")
      AdtsMeta(frames, samples, sampleRate, channels, profile, sumBytes,
        crcFrames)
    }

    def decode(kind: String, payload: Array[Byte]): Array[Float] = {
      val m = walk(payload)
      Array(m.samples.toFloat / m.sampleRate, m.sampleRate.toFloat,
        m.channels.toFloat, m.frames.toFloat)
    }
  }

  /** Synthesize a structurally-valid ADTS stream from per-frame
    * (payloadBytes, withCrc 0|1) pairs — the synthesis half of the q154
    * gate: real 7/9-byte headers (syncword, MPEG-4 id, profile-1 bits,
    * sampling-frequency index, channel config, 13-bit frame length,
    * 0x7FF buffer fullness, single raw data block), a deterministic
    * ID3v2 prefix (exercises the skip path), deterministic CRC
    * placeholder and filler payload bytes — the walker never reads
    * them; structural validity is what's under test. */
  def encodeAdtsFrames(frames: Array[(Int, Int)], srIdx: Int = 4,
                       channels: Int = 2, profile: Int = 2): Array[Byte] = {
    require(srIdx >= 0 && srIdx <= 12, s"bad sampling-frequency index $srIdx")
    require(channels >= 1 && channels <= 7, s"bad channel config $channels")
    require(profile >= 1 && profile <= 4, s"2-bit profile field: $profile")
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 12,
      'T', 'X', 'X', 'X', 0, 0, 0, 2, 0, 0, 0, 'g') // 10 hdr + 12 body
    val lens = frames.map { case (payload, crc) =>
      require(payload >= 0 && (crc == 0 || crc == 1), "bad frame spec")
      val len = payload + (if (crc == 1) 9 else 7)
      require(len < (1 << 13), s"frame length $len exceeds the 13-bit field")
      len
    }
    val out = new Array[Byte](id3.length + lens.sum)
    System.arraycopy(id3, 0, out, 0, id3.length)
    var off = id3.length
    var i = 0
    while (i < frames.length) {
      val crc = frames(i)._2
      val len = lens(i)
      out(off) = 0xFF.toByte
      out(off + 1) = (0xF0 | (1 - crc)).toByte // MPEG-4, layer 0, prot_absent
      out(off + 2) = (((profile - 1) << 6) | (srIdx << 2) |
        ((channels >> 2) & 1)).toByte
      out(off + 3) = (((channels & 3) << 6) | ((len >> 11) & 3)).toByte
      out(off + 4) = ((len >> 3) & 0xFF).toByte
      out(off + 5) = (((len & 7) << 5) | 0x1F).toByte // fullness hi (0x7FF)
      out(off + 6) = 0xFC.toByte // fullness lo | one raw data block
      var j = 7
      if (crc == 1) { // deterministic CRC placeholder (not verified on walk)
        out(off + 7) = 0xBE.toByte; out(off + 8) = 0xEF.toByte; j = 9
      }
      while (j < len) { out(off + j) = ((i * 37 + j) & 0x7F).toByte; j += 1 }
      off += len
      i += 1
    }
    out
  }

  /** MP4 / ISO base-media (ISO/IEC 14496-12) box walk — VIDEO container
    * metadata WITHOUT an h264/aac decoder: movie timescale + duration
    * (`moov/mvhd`), per-track dimensions (`trak/tkhd`, 16.16 fixed point),
    * and sample-entry codec fourccs (`stbl/stsd`), via the public
    * `[u32 size][4cc type]` box layout (64-bit `largesize` and
    * size-0-to-end supported, unknown boxes skipped). Like
    * [[Mp3HeaderDecoder]], this is the triage stage a 100 TB pipeline runs
    * BEFORE paying for decode — filter by duration/resolution/codec, route
    * the survivors. Throws on malformed payloads. Features (fixed width
    * 4): `[duration_sec, video_width, video_height, n_tracks]`. */
  class Mp4BoxDecoder extends Decoder {
    val featureDim = 4

    /** Movie metadata plus per-track sample-table stats when the trak
      * carries mdhd/stts/stsz (empty/zero entries otherwise): media
      * timescale, sample (frame) count, total duration in media units, and
      * total sample bytes — enough for per-track frame rates and bitrates
      * WITHOUT touching sample data. */
    case class Mp4Meta(timescale: Long, duration: Long, nTracks: Int,
                       videoW: Long, videoH: Long, codecs: Seq[String],
                       trackTimescales: Seq[Long] = Nil,
                       trackSamples: Seq[Long] = Nil,
                       trackDurUnits: Seq[Long] = Nil,
                       trackBytes: Seq[Long] = Nil)

    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
        ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    private def u64(b: Array[Byte], o: Int): Long =
      (u32(b, o) << 32) | u32(b, o + 4)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private val containers = Set("moov", "trak", "mdia", "minf", "stbl")

    def walk(payload: Array[Byte]): Mp4Meta = {
      var timescale = 0L; var duration = -1L; var nTracks = 0
      var videoW = 0L; var videoH = 0L
      val codecs = scala.collection.mutable.ArrayBuffer.empty[String]
      // per-track sample-table accumulators, indexed by trak order (boxes
      // walk depth-first, so "current track" = the last trak entered)
      val tkTimescale = scala.collection.mutable.ArrayBuffer.empty[Long]
      val tkSamples = scala.collection.mutable.ArrayBuffer.empty[Long]
      val tkDur = scala.collection.mutable.ArrayBuffer.empty[Long]
      val tkBytes = scala.collection.mutable.ArrayBuffer.empty[Long]

      def boxes(start: Long, end: Long): Unit = {
        var off = start
        while (off < end) {
          require(off + 8 <= end, "truncated MP4 box header")
          val o = off.toInt
          val size0 = u32(payload, o)
          val tpe = tag(payload, o + 4)
          val (bodyOff, size) =
            if (size0 == 1) {
              require(off + 16 <= end, "truncated largesize box")
              (off + 16, u64(payload, o + 8))
            } else if (size0 == 0) (off + 8, end - off)
            else (off + 8, size0)
          require(size >= bodyOff - off && off + size <= end,
            s"bad box size for '$tpe'")
          val bodyEnd = off + size
          tpe match {
            case t if containers(t) =>
              if (t == "trak") {
                nTracks += 1
                tkTimescale += 0L; tkSamples += 0L; tkDur += 0L; tkBytes += 0L
              }
              boxes(bodyOff, bodyEnd)
            case "mdhd" if nTracks > 0 =>
              val b = bodyOff.toInt
              require(bodyEnd - bodyOff >= 1, "truncated mdhd")
              val v = payload(b) & 0xFF
              require(bodyEnd - bodyOff >= (if (v == 1) 24 else 16),
                "mdhd box too small for its version")
              tkTimescale(nTracks - 1) =
                if (v == 1) u32(payload, b + 20) else u32(payload, b + 12)
            case "stts" if nTracks > 0 =>
              val b = bodyOff.toInt
              require(bodyEnd - bodyOff >= 8, "stts box too small")
              val entries = u32(payload, b + 4)
              var eo = b + 8
              var i = 0L
              var n = 0L; var dur = 0L
              while (i < entries) {
                require(eo + 8 <= bodyEnd, "truncated stts entry")
                val cnt = u32(payload, eo); val delta = u32(payload, eo + 4)
                n += cnt; dur += cnt * delta
                eo += 8; i += 1
              }
              tkSamples(nTracks - 1) = n
              tkDur(nTracks - 1) = dur
            case "stsz" if nTracks > 0 =>
              val b = bodyOff.toInt
              require(bodyEnd - bodyOff >= 12, "stsz box too small")
              val uniform = u32(payload, b + 4)
              val cnt = u32(payload, b + 8)
              if (uniform != 0) tkBytes(nTracks - 1) = uniform * cnt
              else {
                var eo = b + 12
                var i = 0L
                var total = 0L
                while (i < cnt) {
                  require(eo + 4 <= bodyEnd, "truncated stsz entry")
                  total += u32(payload, eo)
                  eo += 4; i += 1
                }
                tkBytes(nTracks - 1) = total
              }
            case "mvhd" =>
              val b = bodyOff.toInt
              require(bodyEnd - bodyOff >= 1, "truncated mvhd")
              val v = payload(b) & 0xFF
              // fields must fit INSIDE the declared box, not merely the
              // payload — an undersized-but-valid-size box would otherwise
              // silently read the next box's bytes as metadata
              require(bodyEnd - bodyOff >= (if (v == 1) 32 else 20),
                "mvhd box too small for its version")
              if (v == 1) { timescale = u32(payload, b + 20); duration = u64(payload, b + 24) }
              else { timescale = u32(payload, b + 12); duration = u32(payload, b + 16) }
            case "tkhd" =>
              val b = bodyOff.toInt
              require(bodyEnd - bodyOff >= 1, "truncated tkhd")
              val wOff = b + (if ((payload(b) & 0xFF) == 1) 88 else 76)
              require(bodyEnd >= wOff + 8, "tkhd box too small for its version")
              val w = u32(payload, wOff) >> 16 // 16.16 fixed → integer part
              val h = u32(payload, wOff + 4) >> 16
              if (w > 0 && videoW == 0) { videoW = w; videoH = h }
            case "stsd" =>
              val b = bodyOff.toInt
              require(bodyEnd - bodyOff >= 8, "stsd box too small")
              val entries = u32(payload, b + 4)
              var eo = b + 8
              var i = 0L
              while (i < entries) {
                require(eo + 8 <= bodyEnd, "truncated stsd entry")
                codecs += tag(payload, eo + 4)
                val esize = u32(payload, eo)
                require(esize >= 8, "bad stsd entry size") // 0 would stall the walk
                eo += esize.toInt
                i += 1
              }
            case _ => // unknown box: skip
          }
          off = bodyEnd
        }
      }
      boxes(0L, payload.length.toLong)
      require(timescale > 0 && duration >= 0, "missing moov/mvhd")
      Mp4Meta(timescale, duration, nTracks, videoW, videoH, codecs.toSeq,
        tkTimescale.toSeq, tkSamples.toSeq, tkDur.toSeq, tkBytes.toSeq)
    }

    def decode(kind: String, payload: Array[Byte]): Array[Float] = {
      val m = walk(payload)
      Array(m.duration.toFloat / m.timescale, m.videoW.toFloat,
        m.videoH.toFloat, m.nTracks.toFloat)
    }
  }

  /** Synthesize a minimal-but-valid ISO-BMFF payload (`ftyp` + `free` junk
    * box + `moov(mvhd, trak(tkhd, mdia(minf(stbl(stsd)))))…`) from movie
    * metadata — the synthesis half of the q59 gate. Tracks are
    * (width, height, fourcc); width/height land in `tkhd` as 16.16 fixed
    * point. The box walker never reads sample data (there is none), so
    * structural validity of the box tree is what's under test. */
  /** `sampleTables(i)` (optional per track) = (media timescale, sample
    * delta, sample count, uniform sample size): emits mdhd + single-entry
    * stts + uniform stsz in that trak — the synthesis half of the q59
    * per-track rate gate. */
  def encodeMp4Meta(timescale: Long, duration: Long,
                    tracks: Seq[(Int, Int, String)],
                    sampleTables: Seq[(Long, Long, Long, Long)] = Nil): Array[Byte] = {
    // version-0 boxes store these as u32 — reject instead of silently
    // wrapping in .toInt below
    require(timescale > 0 && timescale <= 0xFFFFFFFFL, s"timescale $timescale not u32")
    require(duration >= 0 && duration <= 0xFFFFFFFFL, s"duration $duration not u32")
    // the sample-table fields (and the derived n·delta media duration) land
    // in version-0 stts/stsz/mdhd u32 slots — same reject-don't-wrap rule.
    // n,delta < 2³² each bounds n·delta < 2⁶⁴, so a wrapped product is
    // either negative or > u32 — both caught.
    sampleTables.foreach { case (mdTs, delta, n, size) =>
      require(mdTs > 0 && mdTs <= 0xFFFFFFFFL, s"media timescale $mdTs not u32")
      require(delta >= 0 && delta <= 0xFFFFFFFFL, s"sample delta $delta not u32")
      require(n >= 0 && n <= 0xFFFFFFFFL, s"sample count $n not u32")
      require(size >= 0 && size <= 0xFFFFFFFFL, s"sample size $size not u32")
      require(n * delta >= 0 && n * delta <= 0xFFFFFFFFL,
        s"media duration $n*$delta not u32")
    }
    def box(tpe: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length)
      bb.put(tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.put(body)
      bb.array()
    }
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0) // version 0 + flags
      bb.putInt(0); bb.putInt(0) // creation/modification
      bb.putInt(timescale.toInt); bb.putInt(duration.toInt)
      bb.putInt(0x00010000); bb.putShort(0x0100.toShort) // rate 1.0, volume
      bb.position(bb.position() + 10) // reserved
      Array(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(bb.putInt) // unity matrix
      bb.position(bb.position() + 24) // pre_defined
      bb.putInt(tracks.length + 1) // next_track_ID
      box("mvhd", bb.array())
    }
    val traks = tracks.zipWithIndex.map { case ((w, h, fourcc), i) =>
      val tk = {
        val bb = java.nio.ByteBuffer.allocate(84)
        bb.putInt(7) // version 0, flags enabled|in-movie|in-preview
        bb.putInt(0); bb.putInt(0) // creation/modification
        bb.putInt(i + 1); bb.putInt(0) // track_ID, reserved
        bb.putInt(duration.toInt)
        bb.position(bb.position() + 8) // reserved
        bb.putShort(0); bb.putShort(0) // layer, alternate_group
        bb.putShort(0); bb.putShort(0) // volume, reserved
        Array(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .foreach(bb.putInt)
        bb.putInt(w << 16); bb.putInt(h << 16) // 16.16 fixed
        box("tkhd", bb.array())
      }
      val entry = {
        val bb = java.nio.ByteBuffer.allocate(16)
        bb.putInt(16)
        bb.put(fourcc.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        bb.array() // 6 reserved + data_ref_index stay zero
      }
      val stsd = {
        val bb = java.nio.ByteBuffer.allocate(8 + entry.length)
        bb.putInt(0); bb.putInt(1) // version/flags, entry_count
        bb.put(entry)
        box("stsd", bb.array())
      }
      val table = sampleTables.lift(i)
      val mdhd = table.map { case (mdTs, delta, n, _) =>
        require(mdTs > 0 && mdTs <= 0xFFFFFFFFL, s"media timescale $mdTs not u32")
        val bb = java.nio.ByteBuffer.allocate(24) // version-0 mdhd
        bb.putInt(0) // version + flags
        bb.putInt(0); bb.putInt(0) // creation/modification
        bb.putInt(mdTs.toInt)
        bb.putInt((n * delta).toInt) // media duration
        bb.putShort(0x55C4.toShort); bb.putShort(0) // language "und", pre_defined
        box("mdhd", bb.array())
      }.getOrElse(Array.emptyByteArray)
      val sampleBoxes = table.map { case (_, delta, n, size) =>
        val stts = {
          val bb = java.nio.ByteBuffer.allocate(16)
          bb.putInt(0); bb.putInt(1) // version/flags, entry_count
          bb.putInt(n.toInt); bb.putInt(delta.toInt)
          box("stts", bb.array())
        }
        val stsz = {
          val bb = java.nio.ByteBuffer.allocate(12)
          bb.putInt(0); bb.putInt(size.toInt) // uniform sample size
          bb.putInt(n.toInt)
          box("stsz", bb.array())
        }
        stts ++ stsz
      }.getOrElse(Array.emptyByteArray)
      box("trak", tk ++
        box("mdia", mdhd ++ box("minf", box("stbl", stsd ++ sampleBoxes))))
    }
    val ftyp = box("ftyp",
      "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        Array[Byte](0, 0, 0, 0))
    val free = box("free", Array.tabulate[Byte](12)(i => (i * 7).toByte))
    ftyp ++ free ++ box("moov", mvhd ++ traks.flatten.toArray)
  }

  /** Kind-routing decoder: dispatch each row's payload to the decoder
    * registered for its `kind`, falling back to `fallback` for unrouted
    * kinds — so a MIXED media table decodes in ONE [[decodeFeatures]] pass
    * instead of requiring an upstream split (each member decoder still
    * throws on payloads malformed FOR ITS KIND). Feature vectors are
    * zero-padded to the widest member dim so downstream consumers (e.g.
    * [[Ann]]) see one fixed width. */
  class RoutingDecoder(routes: Map[String, Decoder], fallback: Decoder)
      extends Decoder {
    val featureDim: Int = (routes.values.map(_.featureDim).toSeq :+
      fallback.featureDim).max
    def decode(kind: String, payload: Array[Byte]): Array[Float] = {
      val f = routes.getOrElse(kind, fallback).decode(kind, payload)
      if (f.length == featureDim) f else java.util.Arrays.copyOf(f, featureDim)
    }
  }

  /** Wrap documents as fake media assets (payload = utf-8 bytes) — the
    * fixture stand-in for a real image/audio table. */
  def syntheticMedia(documents: DataFrame): Dataset[MediaRow] = {
    val enc = Encoders.product[MediaRow]
    documents.select(
      col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video")).as("kind"),
      col("text").cast("binary").as("payload"),
      lit(640).as("meta_width"), lit(480).as("meta_height"),
      lit(16000).as("meta_sample_rate")).as(enc)
  }

  /** Batched decode: one decoder instance per partition (the batch shape a
    * real codec needs), streaming the iterator — no partition-sized
    * materialization. */
  def decodeFeatures(media: Dataset[MediaRow], decoder: Decoder): Dataset[MediaFeatures] = {
    val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      // per-partition decoder init happens here (amortized like a
      // pandas-UDF batch init)
      it.map { m =>
        val feats = decoder.decode(m.kind, m.payload)
        var crc = 1469598103934665603L // FNV-1a 64
        var i = 0
        while (i < m.payload.length) {
          crc ^= (m.payload(i) & 0xFFL); crc *= 1099511628211L; i += 1
        }
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, crc, feats)
      }
    }(enc)
  }

  /** Fault-tolerant batched decode — the INGEST shape at scale: a malformed
    * payload yields (null features, error message) instead of failing the
    * task, because at 100 TB one corrupt record among billions must not
    * kill a 400k-task job. Strict [[decodeFeatures]] stays the right call
    * for trusted payloads (fail fast, loudly — the decoders' documented
    * contract); this is the quarantine path: route
    * `decode_error IS NOT NULL` to a dead-letter sink and keep going.
    * Only decode failures are caught — OOM/interrupts still propagate. */
  def decodeFeaturesSafe(media: Dataset[MediaRow],
                         decoder: Decoder): Dataset[MediaFeaturesSafe] = {
    val enc = Encoders.product[MediaFeaturesSafe]
    media.mapPartitions { it =>
      it.map { m =>
        var crc = 1469598103934665603L // FNV-1a 64
        var i = 0
        while (i < m.payload.length) {
          crc ^= (m.payload(i) & 0xFFL); crc *= 1099511628211L; i += 1
        }
        try {
          val feats = decoder.decode(m.kind, m.payload)
          MediaFeaturesSafe(m.media_id, m.kind, m.payload.length.toLong, crc,
            feats, null)
        } catch {
          case e @ (_: IllegalArgumentException | _: java.io.IOException |
                    _: IndexOutOfBoundsException) =>
            MediaFeaturesSafe(m.media_id, m.kind, m.payload.length.toLong, crc,
              null, s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }(enc)
  }

  /** Frame/sample selection on a (conceptual) time axis: keep every k-th
    * frame index in [0, nFrames) as explode output — the partition-friendly
    * frame-sampling shape (the decode of each sampled frame is stubbed). */
  def sampleFrames(media: Dataset[MediaRow], nFrames: Int, stride: Int): DataFrame =
    media.toDF().select(col("media_id"), col("kind"),
        explode(sequence(lit(0), lit(nFrames - 1), lit(stride))).as("frame_idx"))
      .withColumn("frame_key", concat_ws(":", col("media_id"), col("frame_idx")))

  /** One routing verdict of [[imageTriage]]: `route` is "decode"
    * (baseline path), "decode_progressive" (progressive JPEGs — a real
    * pipeline pools them separately: multi-scan decode holds the whole
    * image in memory), or "quarantine" (`reason` says why — never sent
    * to a pixel decoder). `width`/`height` are the HEADER dimensions
    * (-1 when unreadable). */
  final case class ImageRoute(route: String, reason: String,
                              width: Int, height: Int,
                              progressive: Boolean)

  /** Default pixel ceiling for [[imageTriage]]: 64 MPx — past any
    * sane training image; a decompression-bomb fence, not a quality
    * judgment (a 64 MPx 8-bit gray raster is already 64 MB per task). */
  val DefaultMaxPixels: Long = 64L * 1024 * 1024

  /** Pre-decode image triage — the [[Jpeg.meta]] consumer that routes
    * blobs BEFORE any pixel decode (the 100 TB point: a corrupt or
    * hostile blob must cost a header walk, not an ImageIO decode;
    * decode cost is authorized by the header, never discovered by
    * decoding):
    *
    *  - JPEG magic → [[Jpeg.meta]]'s bounded segment walk: malformed
    *    headers quarantine with the walk's reason; progressive streams
    *    route to the progressive pool; dimensions fence against
    *    `maxPixels` (also catches missing-SOF streams — w/h unseen).
    *  - PNG signature → IHDR peek (width/height at fixed offsets, the
    *    first chunk by spec) with the same pixel fence.
    *  - P5 PGM → the [[PgmDecoder]] header parse (total here: parse
    *    failures quarantine instead of throwing).
    *  - anything else → quarantine "unknown format" (the allowlist
    *    stance: decoders are attack surface, unknown bytes don't get
    *    to pick one via content sniffing).
    *
    * Pure per-blob local work — compose inside the same typed map as
    * the decode (see [[triagedImageStats]]); zero extra passes. */
  def imageTriage(payload: Array[Byte],
                  maxPixels: Long = DefaultMaxPixels): ImageRoute = {
    val b = if (payload == null) Array.empty[Byte] else payload
    def fence(w: Int, h: Int, progressive: Boolean): ImageRoute =
      if (w <= 0 || h <= 0)
        ImageRoute("quarantine", "no dimensions", w, h, progressive)
      else if (w.toLong * h > maxPixels)
        ImageRoute("quarantine", "too large", w, h, progressive)
      else if (progressive)
        ImageRoute("decode_progressive", "", w, h, progressive = true)
      else ImageRoute("decode", "", w, h, progressive = false)
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
      val m = Jpeg.meta(b)
      if (m.error != null && m.error.nonEmpty)
        ImageRoute("quarantine", m.error, m.width, m.height, m.progressive)
      else fence(m.width, m.height, m.progressive)
    } else if (b.length >= 24 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' &&
               b(2) == 'N' && b(3) == 'G' && b(12) == 'I' && b(13) == 'H' &&
               b(14) == 'D' && b(15) == 'R') {
      def be32(i: Int): Long =
        ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
          ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
      val w = be32(16); val h = be32(20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue)
        ImageRoute("quarantine", "no dimensions", -1, -1, progressive = false)
      else fence(w.toInt, h.toInt, progressive = false)
    } else if (b.length >= 2 && b(0) == 'P' && b(1) == '5') {
      try {
        val (w, h, _, _) = new PgmDecoder().header(b)
        fence(w, h, progressive = false)
      } catch {
        case e: IllegalArgumentException =>
          ImageRoute("quarantine",
            Option(e.getMessage).getOrElse("bad PGM header")
              .stripPrefix("requirement failed: "),
            -1, -1, progressive = false)
      }
    } else ImageRoute("quarantine", "unknown format", -1, -1,
      progressive = false)
  }

  /** Triage-gated pixel statistics: [[imageTriage]] first, and ONLY
    * routed blobs reach a pixel decoder (quarantined blobs return None —
    * spec-gated by a counting decoder: the rejected class never invokes
    * ImageIO). Routed P5 blobs use the [[PgmDecoder]] raster walk (the
    * JDK ships no PGM ImageIO reader); JPEG/PNG use `decoder`. The
    * q93-class dedup and the q175 mixed-corpus routing run this per
    * blob inside one typed map. */
  def triagedImageStats(payload: Array[Byte],
                        maxPixels: Long = DefaultMaxPixels,
                        decoder: ImageIoDecoder = new ImageIoDecoder())
      : (ImageRoute, Option[(Long, Long, Long, Long)]) = {
    val r = imageTriage(payload, maxPixels)
    if (r.route == "quarantine") (r, None)
    else if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '5')
      (r, Some(new PgmDecoder().rawStats(payload)))
    else (r, Some(decoder.rawStats(payload)))
  }
}
