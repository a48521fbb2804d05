package graft.operators

/** JPEG/EXIF header TRIAGE — the image twin of the ADTS (q154) and MP4
  * (q59) walks: a 100 TB image corpus filters and routes on dimensions,
  * baseline-vs-progressive coding, and EXIF orientation BEFORE paying a
  * pixel decode (which [[Multimodal]]'s imageio path fronts for phash).
  * Everything here is a bounded header walk over the leading bytes of
  * each blob — scan-speed, no codec, total on malformed input.
  *
  * Format facts used (all public: ITU-T T.81 / ISO 10918-1 for the
  * segment layer, the TIFF 6.0 + Exif 2.x specs for APP1):
  *
  *  - a JPEG stream is `FFD8` (SOI) then marker segments `FF xx` +
  *    2-byte big-endian length (length includes itself, not the
  *    marker); `FF` fill bytes before a marker are legal padding;
  *  - frame headers SOF0-15 (`FFC0`-`FFCF` minus C4/C8/CC) carry
  *    [precision, height:2, width:2, ncomp]; markers C2/C6/CA/CE are
  *    the PROGRESSIVE coding modes;
  *  - scan data follows SOS (`FFDA`); triage stops there — dimensions
  *    and metadata segments precede the first scan by construction;
  *  - EXIF rides in APP1 (`FFE1`) as `Exif\0\0` + a TIFF body: byte
  *    order `II`/`MM`, magic 42, IFD0 offset; IFD0 is a count plus
  *    12-byte entries [tag:2, type:2, count:4, value:4]; ORIENTATION is
  *    tag 0x0112, a SHORT (1-8) stored in the value field's leading
  *    bytes in the TIFF's own byte order.
  *
  * The q168 oracle replays dimensions, the progressive flag, both
  * byte-order orientation plants, the no-EXIF default, and the
  * bad-magic / truncation quarantine classes closed-form. Real pixel
  * decode stays where it was ([[Multimodal]] imageio / the
  * [[DecoderProvider]] SPI); triage no longer touches it.
  */
object Jpeg {

  /** Parsed triage row. `orientation` 0 = no (valid) EXIF orientation;
    * `error` null = clean parse. Failed parses carry -1 dims. */
  final case class Meta(width: Int, height: Int, progressive: Boolean,
                        orientation: Int, hasExif: Boolean,
                        nSegments: Int, error: String)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def u16be(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  private def fail(msg: String, segs: Int): Meta =
    Meta(-1, -1, progressive = false, 0, hasExif = false, segs, msg)

  /** Is `m` a SOF marker (C0-CF minus the C4/C8/CC non-frame codes)? */
  private def isSof(m: Int): Boolean =
    m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC

  /** Walk the segment layer of one JPEG blob. Total: never throws. */
  def meta(bytes: Array[Byte]): Meta = {
    val b = if (bytes == null) Array.empty[Byte] else bytes
    if (b.length < 2 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8)
      return fail("bad magic", 0)
    var i = 2
    var segs = 0
    var width = -1
    var height = -1
    var progressive = false
    var orientation = 0
    var hasExif = false
    while (i + 1 < b.length) {
      if (u8(b, i) != 0xFF) return fail("lost sync", segs)
      while (i + 1 < b.length && u8(b, i + 1) == 0xFF) i += 1 // fill bytes
      if (i + 1 >= b.length) return fail("truncated", segs)
      val m = u8(b, i + 1)
      if (m == 0xD9) { // EOI with no scan: header-only stream is fine
        return finish(width, height, progressive, orientation, hasExif, segs)
      } else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
        i += 2 // standalone markers carry no length
      } else {
        if (i + 3 >= b.length) return fail("truncated", segs)
        val len = u16be(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return fail("truncated", segs)
        segs += 1
        if (isSof(m)) {
          if (len < 7) return fail("truncated", segs)
          height = u16be(b, i + 5)
          width = u16be(b, i + 7)
          progressive = m == 0xC2 || m == 0xC6 || m == 0xCA || m == 0xCE
        } else if (m == 0xE1 && len >= 8 &&
                   b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
                   b(i + 7) == 'f' && len >= 10 &&
                   b(i + 8) == 0 && b(i + 9) == 0) {
          val o = exifOrientation(b, i + 10, i + 2 + len)
          if (o >= 0) { hasExif = true; orientation = o }
        } else if (m == 0xDA) {
          // scan data: triage never reads past the first SOS
          return finish(width, height, progressive, orientation, hasExif, segs)
        }
        i += 2 + len
      }
    }
    fail("truncated", segs)
  }

  private def finish(w: Int, h: Int, prog: Boolean, ori: Int,
                     exif: Boolean, segs: Int): Meta =
    if (w < 0) fail("no frame header", segs)
    else Meta(w, h, prog, ori, exif, segs, null)

  /** Orientation from the TIFF body in b[tiff, end): -1 when absent or
    * malformed (bad byte order, IFD out of bounds, non-SHORT tag). */
  private def exifOrientation(b: Array[Byte], tiff: Int, end: Int): Int = {
    if (tiff + 8 > end) return -1
    val little =
      if (b(tiff) == 'I' && b(tiff + 1) == 'I') true
      else if (b(tiff) == 'M' && b(tiff + 1) == 'M') false
      else return -1
    def rd16(i: Int): Int =
      if (little) u8(b, i) | (u8(b, i + 1) << 8) else u16be(b, i)
    def rd32(i: Int): Long =
      if (little)
        (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
         (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24))
      else
        ((u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
         (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong)
    if (rd16(tiff + 2) != 42) return -1
    val ifd0 = rd32(tiff + 4)
    val p0 = tiff + ifd0
    if (ifd0 < 0 || p0 + 2 > end) return -1
    val n = rd16(p0.toInt)
    var k = 0
    var ori = 0 // present-but-no-orientation-tag: report 0, not absent
    while (k < n) {
      val ep = p0.toInt + 2 + 12 * k
      if (ep + 12 > end) return -1
      val tag = rd16(ep)
      if (tag == 0x0112) {
        if (rd16(ep + 2) != 3 || rd32(ep + 4) != 1L) return -1
        ori = rd16(ep + 8) // SHORT rides the value field's leading bytes
      }
      k += 1
    }
    ori
  }

  // ------------------------------------------------------------------
  // fixture encoder
  // ------------------------------------------------------------------

  /** Build a structurally-valid JPEG header stream for fixtures/tests:
    * SOI, optional APP1/EXIF (chosen byte order + orientation), a
    * comment segment (walk exercise), SOF0 (baseline) or SOF2
    * (progressive) with the given dims, SOS, a little non-`FF` entropy
    * filler, EOI. The triage walk above and this builder are
    * independent derivations of the same public format facts — the
    * q52/q53/q154 roundtrip convention. */
  def encode(width: Int, height: Int, progressive: Boolean,
             orientation: Int, exifLittleEndian: Boolean,
             withExif: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xFF)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    w8(0xFF); w8(0xD8) // SOI
    if (withExif) {
      w8(0xFF); w8(0xE1)
      w16(2 + 6 + 26) // len + Exif\0\0 + TIFF(8) + IFD(2 + 12 + 4)
      out.write("Exif".getBytes("US-ASCII")); w8(0); w8(0)
      def t16(v: Int): Unit =
        if (exifLittleEndian) { w8(v); w8(v >> 8) } else w16(v)
      def t32(v: Int): Unit =
        if (exifLittleEndian) { w8(v); w8(v >> 8); w8(v >> 16); w8(v >> 24) }
        else { w8(v >> 24); w8(v >> 16); w8(v >> 8); w8(v) }
      if (exifLittleEndian) { w8('I'); w8('I') } else { w8('M'); w8('M') }
      t16(42); t32(8) // magic, IFD0 at byte 8 of the TIFF body
      t16(1) // one entry
      t16(0x0112); t16(3); t32(1); t16(orientation); t16(0) // SHORT value
      t32(0) // no next IFD
    }
    val comment = "graft fixture".getBytes("US-ASCII")
    w8(0xFF); w8(0xFE); w16(2 + comment.length); out.write(comment)
    w8(0xFF); w8(if (progressive) 0xC2 else 0xC0)
    w16(11); w8(8); w16(height); w16(width); w8(1) // 1 grayscale component
    w8(1); w8(0x11); w8(0) // comp id, 1x1 sampling, q-table 0
    w8(0xFF); w8(0xDA); w16(8); w8(1); w8(1); w8(0) // SOS, 1 component
    w8(0); w8(63); w8(0) // spectral selection (baseline values)
    var k = 0
    while (k < 16) { w8((width * 31 + height * 7 + k) & 0x7F); k += 1 }
    w8(0xFF); w8(0xD9) // EOI
    out.toByteArray
  }
}
