package graft.operators

/** Test-only codec pack proving the [[DecoderProvider]] seam: registered
  * via META-INF/services on the TEST classpath only, decodes the
  * "mp3-sample" kind with a deterministic recognizable vector. */
class FakeMp3SampleProvider extends DecoderProvider {
  override def kinds: Seq[String] = Seq("mp3-sample")
  override def decoder: Multimodal.Decoder = new Multimodal.Decoder {
    val featureDim = 3
    def decode(kind: String, payload: Array[Byte]): Array[Float] =
      Array(42.0f, payload.length.toFloat, kind.length.toFloat)
  }
}
