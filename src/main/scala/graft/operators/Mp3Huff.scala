package graft.operators

/** Layer III Huffman codebooks (ISO/IEC 11172-3 Table B.7) — the transcribed,
  * VALIDATED subset.
  *
  * Every table here is checked by Mp3Spec to be a complete prefix code:
  * Kraft sum over 2^-hlen exactly 1, no codeword a prefix of another, no
  * duplicates. Those two properties jointly pin a transcription hard — a
  * mis-remembered table essentially cannot pass them by accident (the
  * transcriptions of tables 10-12 attempted during development failed
  * them and were therefore NOT shipped).
  *
  * Coverage: tables 0 (all-zero), 1, 2, 3, 5, 6, 7, 8, 9 (big-values pairs
  * with |value| <= 5, no linbits) and both count1 quad tables. The large
  * codebooks 10, 11, 12, 13, 15 and the ESC pair 16/24 (shared by 17-23 and
  * 25-31 with per-table linbits 1,2,3,4,6,8,10,13 / 4,5,6,7,8,9,11,13) are
  * normative DATA this offline build cannot verify a transcription of;
  * selecting one throws a named error instead of decoding garbage. Each is
  * a pure data drop-in here once transcribed from the spec document — the
  * decode/encode machinery below is table-agnostic.
  */
object Mp3Huff {

  /** One codebook: symbol i = x * ylen + y has codeword hcod(i) of
    * hlen(i) bits (MSB-first). */
  final class HuffTable(val id: Int, val xlen: Int, val ylen: Int,
      val linbits: Int, val hlen: Array[Int], val hcod: Array[Int])
      extends Serializable {
    require(hlen.length == xlen * ylen && hcod.length == xlen * ylen,
      s"table $id: bad entry count")

    // decode tree in parallel arrays: child pointers, -1 = absent,
    // value >= 0 at leaves
    private val left = new scala.collection.mutable.ArrayBuffer[Int]()
    private val right = new scala.collection.mutable.ArrayBuffer[Int]()
    private val value = new scala.collection.mutable.ArrayBuffer[Int]()
    private def newNode(): Int = {
      left += -1; right += -1; value += -1; left.length - 1
    }
    newNode() // root
    locally {
      var s = 0
      while (s < hlen.length) {
        var node = 0
        var b = hlen(s) - 1
        while (b >= 0) {
          val bit = (hcod(s) >>> b) & 1
          val childs = if (bit == 0) left else right
          require(value(node) < 0, s"table $id: codeword under a leaf")
          if (childs(node) < 0) childs(node) = newNode()
          node = childs(node)
          b -= 1
        }
        require(value(node) < 0 && left(node) < 0 && right(node) < 0,
          s"table $id: duplicate/prefix codeword for symbol $s")
        value(node) = s
        s += 1
      }
    }

    private def walk(br: Mp3.BitReader): Int = {
      var node = 0
      while (value(node) < 0) {
        node = if (br.readBit() == 0) left(node) else right(node)
        require(node >= 0, s"table $id: invalid codeword in stream")
      }
      value(node)
    }

    def decodePair(br: Mp3.BitReader): (Int, Int) = {
      val s = walk(br)
      (s / ylen, s % ylen)
    }

    def decodeQuad(br: Mp3.BitReader): Int = walk(br)

    def encodePair(bw: Mp3.BitWriter, x: Int, y: Int): Unit = {
      require(x >= 0 && x < xlen && y >= 0 && y < ylen,
        s"table $id cannot encode ($x,$y)")
      val s = x * ylen + y
      bw.write(hcod(s), hlen(s))
    }

    def encodeQuad(bw: Mp3.BitWriter, pattern: Int): Unit = {
      require(pattern >= 0 && pattern < 16, "quad pattern 0..15")
      bw.write(hcod(pattern), hlen(pattern))
    }

    /** Kraft sum * 2^maxLen (exact integer) — the spec gates this == 2^maxLen. */
    def kraftScaled: (Long, Int) = {
      val maxLen = hlen.max
      (hlen.map(l => 1L << (maxLen - l)).sum, maxLen)
    }
  }

  private def t(id: Int, xlen: Int, ylen: Int, hlen: Array[Int],
      hcod: Array[Int]): (Int, HuffTable) =
    id -> new HuffTable(id, xlen, ylen, 0, hlen, hcod)

  /** Big-values tables, keyed by table_select. */
  val tables: Map[Int, HuffTable] = Map(
    t(1, 2, 2,
      Array(1, 3, 2, 3),
      Array(0x1, 0x1, 0x1, 0x0)),
    t(2, 3, 3,
      Array(1, 3, 6, 3, 3, 5, 5, 5, 6),
      Array(0x1, 0x2, 0x1, 0x3, 0x1, 0x1, 0x3, 0x2, 0x0)),
    t(3, 3, 3,
      Array(2, 2, 6, 3, 2, 5, 5, 5, 6),
      Array(0x3, 0x2, 0x1, 0x1, 0x1, 0x1, 0x3, 0x2, 0x0)),
    t(5, 4, 4,
      Array(1, 3, 6, 7, 3, 3, 6, 7, 6, 6, 7, 8, 7, 6, 7, 8),
      Array(0x1, 0x2, 0x6, 0x5, 0x3, 0x1, 0x4, 0x4, 0x7, 0x5, 0x7, 0x1,
        0x6, 0x1, 0x1, 0x0)),
    t(6, 4, 4,
      Array(3, 3, 5, 7, 3, 2, 4, 5, 4, 4, 5, 6, 6, 5, 6, 7),
      Array(0x7, 0x3, 0x5, 0x1, 0x6, 0x2, 0x3, 0x2, 0x5, 0x4, 0x4, 0x1,
        0x3, 0x3, 0x2, 0x0)),
    t(7, 6, 6,
      Array(1, 3, 6, 8, 8, 9, 3, 4, 6, 7, 7, 8, 6, 5, 7, 8, 8, 9,
        7, 7, 8, 9, 9, 9, 7, 7, 8, 9, 9, 10, 8, 8, 9, 10, 10, 10),
      Array(0x1, 0x2, 0xa, 0x13, 0x10, 0xa, 0x3, 0x3, 0x7, 0xa, 0x5, 0x3,
        0xb, 0x4, 0xd, 0x11, 0x8, 0x4, 0xc, 0xb, 0x12, 0xf, 0xb, 0x2,
        0x7, 0x6, 0x9, 0xe, 0x3, 0x1, 0x6, 0x4, 0x5, 0x3, 0x2, 0x0)),
    t(8, 6, 6,
      Array(2, 3, 6, 8, 8, 9, 3, 2, 4, 8, 8, 8, 6, 4, 6, 8, 8, 9,
        8, 8, 8, 9, 9, 10, 8, 7, 8, 9, 10, 10, 9, 8, 9, 9, 11, 11),
      Array(0x3, 0x4, 0x6, 0x12, 0xc, 0x5, 0x5, 0x1, 0x2, 0x10, 0x9, 0x3,
        0x7, 0x3, 0x5, 0xe, 0x7, 0x3, 0x13, 0x11, 0xf, 0xd, 0xa, 0x4,
        0xd, 0x5, 0x8, 0xb, 0x5, 0x1, 0xc, 0x4, 0x4, 0x1, 0x1, 0x0)),
    t(9, 6, 6,
      Array(3, 3, 5, 6, 8, 9, 3, 3, 4, 5, 6, 8, 4, 4, 5, 6, 7, 8,
        6, 5, 6, 7, 7, 8, 7, 6, 7, 7, 8, 9, 8, 7, 8, 8, 9, 9),
      Array(0x7, 0x5, 0x9, 0xe, 0xf, 0x7, 0x6, 0x4, 0x5, 0x5, 0x6, 0x7,
        0x7, 0x6, 0x8, 0x8, 0x8, 0x5, 0xf, 0x6, 0x9, 0xa, 0x5, 0x1,
        0xb, 0x7, 0x9, 0x6, 0x4, 0x1, 0xe, 0x4, 0x6, 0x2, 0x6, 0x0)))

  /** count1 tables: quad symbols are the 4-bit (v,w,x,y) nonzero pattern. */
  val count1Tables: Array[HuffTable] = Array(
    new HuffTable(32, 4, 4, 0,
      Array(1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6),
      Array(0x1, 0x5, 0x4, 0x5, 0x6, 0x5, 0x4, 0x4, 0x7, 0x3, 0x6, 0x0,
        0x7, 0x2, 0x3, 0x1)),
    new HuffTable(33, 4, 4, 0,
      Array.fill(16)(4),
      Array.tabulate(16)(i => 15 - i)))

  /** linbits by ESC table id (16-31), for the error message and for the
    * day the 16/24 codebooks are transcribed. */
  val EscLinbits: Map[Int, Int] = Map(
    16 -> 1, 17 -> 2, 18 -> 3, 19 -> 4, 20 -> 6, 21 -> 8, 22 -> 10, 23 -> 13,
    24 -> 4, 25 -> 5, 26 -> 6, 27 -> 7, 28 -> 8, 29 -> 9, 30 -> 11, 31 -> 13)

  def bigTable(id: Int): HuffTable =
    tables.getOrElse(id,
      throw new IllegalArgumentException(
        if (id == 4 || id == 14) s"Huffman table $id is reserved/invalid"
        else if (EscLinbits.contains(id))
          s"Huffman ESC table $id (codebook ${if (id < 24) 16 else 24}, " +
            s"linbits ${EscLinbits(id)}) is not transcribed in this build — " +
            "a validated transcription of ISO 11172-3 Table B.7 is a data " +
            "drop-in in Mp3Huff.tables"
        else s"Huffman table $id (large codebook) is not transcribed in " +
          "this build — a validated transcription of ISO 11172-3 Table " +
          "B.7 is a data drop-in in Mp3Huff.tables"))

  def count1Table(sel: Int): HuffTable = count1Tables(sel)
}
