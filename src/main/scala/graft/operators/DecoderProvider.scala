package graft.operators

/** SPI seam for EXTERNAL compressed-media codec packs.
  *
  * The engine ships real byte-level decoders for every format the JRE can
  * handle without codec libraries (WAV/PCM, PGM, PNG/JPEG/BMP/GIF via
  * ImageIO, AIFF/AU, G.711), pure-JVM codecs for flac
  * ([[graft.operators.Flac.FlacDecoder]]) and mp3 Layer III
  * ([[graft.operators.Mp3.SampleDecoder]], within its documented Huffman
  * boundary), and metadata-first triage for MP3/MP4/ADTS-AAC; only the remaining
  * compressed SAMPLE decodes (aac/h264 payload → features) genuinely
  * need an FFI codec dependency this container doesn't ship and sit
  * behind [[Multimodal.StubDecoder]]. This interface is that stub's
  * retirement path: implement it in a codec-pack jar, declare the impl in
  * `META-INF/services/graft.operators.DecoderProvider`, drop the jar on
  * the classpath — [[DecoderProviders.routing]] then routes those kinds to
  * the pack with NO engine changes (MultimodalSpec proves the seam with a
  * test-only provider).
  */
trait DecoderProvider {
  /** Media kinds this provider decodes (the routing keys, e.g.
    * "mp3-sample"). */
  def kinds: Seq[String]

  /** The decoder instance — must be Serializable (it ships to executors
    * inside the routing decoder; per-partition init belongs in the
    * decoder's own lazy state, the [[Multimodal.decodeFeatures]] batch
    * contract). */
  def decoder: Multimodal.Decoder
}

object DecoderProviders {

  /** ServiceLoader sweep, ONCE per JVM (the AudioSpi lesson: ServiceLoader
    * discovery per call takes a global lock — at 32 executor threads that
    * serialized whole stages). Discovery runs on the driver; the resolved
    * decoders serialize to executors inside the routing table. */
  lazy val discovered: Map[String, Multimodal.Decoder] = {
    import scala.jdk.CollectionConverters._
    val loader = Option(Thread.currentThread().getContextClassLoader)
      .getOrElse(classOf[DecoderProvider].getClassLoader)
    java.util.ServiceLoader.load(classOf[DecoderProvider], loader)
      .iterator().asScala
      .flatMap(p => p.kinds.map(k => k -> p.decoder))
      .toMap
  }

  /** A [[Multimodal.RoutingDecoder]] over `builtin` routes plus every
    * discovered codec-pack route. On a kind collision the PACK wins — the
    * point of installing one is replacing a stub/triage route with a real
    * sample decoder. */
  def routing(builtin: Map[String, Multimodal.Decoder],
              fallback: Multimodal.Decoder): Multimodal.RoutingDecoder =
    new Multimodal.RoutingDecoder(builtin ++ discovered, fallback)

  /** The SHIPPED builtin routes — every kind the engine sample-decodes
    * with no external codec pack. `mp3` routes to the real
    * [[graft.operators.Mp3.SampleDecoder]] (within its documented
    * Huffman-table boundary — unsupported tables throw, so pair this
    * with [[Multimodal.decodeFeaturesSafe]] on third-party corpora);
    * only aac/h264 fall through to the routing fallback. */
  def builtinRoutes: Map[String, Multimodal.Decoder] = Map(
    "wav" -> new Multimodal.WavPcmDecoder,
    "pgm" -> new Multimodal.PgmDecoder,
    "flac" -> new Flac.FlacDecoder,
    "mp3" -> new Mp3.SampleDecoder)

  /** [[routing]] over [[builtinRoutes]] plus discovered codec packs —
    * the default production decoder for a mixed media table. */
  def defaultRouting(fallback: Multimodal.Decoder =
      new Multimodal.StubDecoder()): Multimodal.RoutingDecoder =
    routing(builtinRoutes, fallback)
}
