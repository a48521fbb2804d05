package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Gates for the JPEG/EXIF header triage: the segment walk (fill bytes,
  * standalone markers, SOS stop), SOF dims + progressive flag, EXIF
  * orientation in BOTH TIFF byte orders, the no-EXIF default, and
  * totality on the quarantine classes. Pure JVM — no Spark session. */
class JpegSpec extends AnyFunSuite {

  test("encode→meta round trip: dims, progressive, orientation, both " +
       "TIFF byte orders") {
    for {
      le <- Seq(true, false)
      prog <- Seq(true, false)
      ori <- 1 to 8
    } {
      val m = Jpeg.meta(Jpeg.encode(640, 480, prog, ori, le, withExif = true))
      assert(m.error == null, s"le=$le prog=$prog ori=$ori: ${m.error}")
      assert((m.width, m.height) == ((640, 480)))
      assert(m.progressive == prog)
      assert(m.orientation == ori && m.hasExif)
      assert(m.nSegments == 4) // APP1 + COM + SOF + SOS
    }
  }

  test("no APP1 → orientation 0, hasExif false; dims still parse") {
    val m = Jpeg.meta(Jpeg.encode(33, 77, progressive = false,
      orientation = 5, exifLittleEndian = true, withExif = false))
    assert(m.error == null && m.orientation == 0 && !m.hasExif)
    assert((m.width, m.height) == ((33, 77)) && m.nSegments == 3)
  }

  test("quarantine classes: bad magic, truncation, lost sync — total, " +
       "masked dims") {
    val bad = Jpeg.meta("NOTAJPEG".getBytes("US-ASCII"))
    assert(bad.error == "bad magic" && bad.width == -1 && bad.nSegments == 0)
    val full = Jpeg.encode(100, 50, progressive = false, orientation = 3,
      exifLittleEndian = false, withExif = true)
    val trunc = Jpeg.meta(full.take(full.length - 24)) // cut mid-SOS
    assert(trunc.error == "truncated" && trunc.width == -1)
    val sync = full.clone()
    sync(2) = 0x00 // the APP1 marker's FF becomes garbage
    assert(Jpeg.meta(sync).error == "lost sync")
    assert(Jpeg.meta(null).error == "bad magic")
    assert(Jpeg.meta(Array[Byte](0xFF.toByte, 0xD8.toByte)).error
      == "truncated")
  }

  test("malformed EXIF degrades to no-orientation, not a parse failure") {
    val full = Jpeg.encode(10, 10, progressive = false, orientation = 6,
      exifLittleEndian = true, withExif = true)
    // corrupt the TIFF byte-order mark ('II' -> 'XX'): dims must survive
    val i = full.indexOfSlice("Exif".getBytes("US-ASCII")) + 6
    val broken = full.clone()
    broken(i) = 'X'.toByte; broken(i + 1) = 'X'.toByte
    val m = Jpeg.meta(broken)
    assert(m.error == null && !m.hasExif && m.orientation == 0)
    assert((m.width, m.height) == ((10, 10)))
  }

  test("fill bytes before a marker are legal padding") {
    val full = Jpeg.encode(20, 30, progressive = true, orientation = 2,
      exifLittleEndian = false, withExif = false)
    // splice an extra FF fill byte before the COM marker (after SOI)
    val padded = full.patch(2, Seq(0xFF.toByte), 0)
    val m = Jpeg.meta(padded.toArray)
    assert(m.error == null && (m.width, m.height) == ((20, 30)))
    assert(m.progressive)
  }
}
