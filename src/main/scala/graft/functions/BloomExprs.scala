package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native membership probe against a Bloom-filter bit array that rides in
  * the expression node (broadcast with the plan — the filter is compact by
  * construction, unlike the key set it summarizes).
  *
  * Probing uses Kirsch–Mitzenmacher double hashing over the 64-bit input
  * hash: `index_i = (h1 + i·h2) mod m` with `h2` forced odd, which gives k
  * independent-enough probes from one hash (public result; the standard
  * construction in production bloom implementations). The input column is
  * already a 64-bit hash (xxhash64 / hashed shingles), so no re-hash of
  * the raw value happens per probe.
  *
  * Codegen keeps the k-probe loop inside whole-stage codegen — the filter
  * word array is attached via `addReferenceObj`, so the generated code
  * indexes a plain long[] with no boxing.
  */
case class BloomMightContain(child: Expression, words: Array[Long],
                             numBits: Long, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numBits > 0 && numBits == words.length * 64L,
    "numBits must equal words.length * 64")
  require(numHashes >= 1, "need at least one hash")

  // a non-long hash input would CCE in interpreted eval but silently
  // compute different probe indices under codegen — declare the contract
  // so the analyzer inserts the cast (or rejects) instead
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[Long]
    BloomMightContain.contains(words, numBits, numHashes, h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, h => {
      val i = ctx.freshName("i"); val h2 = ctx.freshName("h2")
      val idx = ctx.freshName("idx"); val hit = ctx.freshName("hit")
      s"""
         |long $h2 = graft.functions.BloomMightContain.mix($h) | 1L;
         |boolean $hit = true;
         |for (int $i = 0; $i < $numHashes && $hit; $i++) {
         |  long $idx = (($h + $i * $h2) & Long.MAX_VALUE) % ${numBits}L;
         |  $hit = ($w[(int) ($idx >>> 6)] & (1L << $idx)) != 0L;
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** splitmix64 finalizer (public-domain mixing constants) — decorrelates
    * h2 from h1 so the double-hash probes don't collapse. */
  def mix(h: Long): Long = {
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def contains(words: Array[Long], numBits: Long, k: Int, h: Long): Boolean = {
    val h2 = mix(h) | 1L
    var i = 0
    while (i < k) {
      val idx = ((h + i * h2) & Long.MaxValue) % numBits
      if ((words((idx >>> 6).toInt) & (1L << idx)) == 0L) return false
      i += 1
    }
    true
  }

  /** Set the k probe bits for `h` in `words` (the build-side twin of
    * [[contains]] — same index arithmetic, so build and probe can never
    * disagree). */
  def set(words: Array[Long], numBits: Long, k: Int, h: Long): Unit = {
    val h2 = mix(h) | 1L
    var i = 0
    while (i < k) {
      val idx = ((h + i * h2) & Long.MaxValue) % numBits
      words((idx >>> 6).toInt) |= (1L << idx)
      i += 1
    }
  }

  def apply(c: Column, words: Array[Long], numBits: Long, k: Int): Column =
    column(BloomMightContain(expression(c), words, numBits, k))
}
