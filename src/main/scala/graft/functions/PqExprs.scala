package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims.AbstractType
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native kernels for product quantization (PQ) — the ANN path that trades
  * exactness for a ×(8·dim/M) storage compression: vectors become M small
  * centroid codes, and query scoring runs entirely in the compressed domain
  * via per-query lookup tables (ADC — asymmetric distance computation,
  * Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * IEEE TPAMI 2011; public method).
  *
  * The codebook rides in the expression NODE (like [[TokenStats]]'s
  * stopword set), not as a child literal — one flat double[] per plan, no
  * per-row ArrayData conversion. Layout: `cb[(m*K + j)*sub + t]` = coord t
  * of centroid j in subspace m, sub = dim/M.
  */

/** vec (array<double>, length dim) → array<int> of M codes: per subspace,
  * the index of the L2-nearest codebook centroid. Runs ONCE per corpus row
  * at ingest — the encode cost buys every later scan the compressed form. */
case class PqEncode(child: Expression, codebook: Array[Double], m: Int, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(m > 0 && k > 0 && codebook.length % (m * k) == 0, "bad codebook shape")
  // getDouble reads array storage directly — a wrong-typed input under
  // codegen would misread bytes, so declare the contract and let the
  // analyzer insert casts / reject (the BloomMightContain lesson)
  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val v = in.asInstanceOf[ArrayData]
    val sub = codebook.length / (m * k)
    val codes = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        val base = (mm * k + j) * sub
        var d = 0.0
        var t = 0
        while (t < sub) {
          val diff = v.getDouble(mm * sub + t) - codebook(base + t)
          d += diff * diff
          t += 1
        }
        // deterministic tie-break: strict <, so the smallest index wins
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(mm) = best
      mm += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $ref.nullSafeEval($a);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** query vec → flat ADC lookup table (array<double>, length M·K):
  * `lut[m*K + j]` = inner product of the query's m-th subvector with
  * centroid j. Runs once per QUERY (Q rows), so Σ_m lut[m·K + code_m]
  * approximates `dot(query, reconstruct(codes))`. */
case class PqLut(child: Expression, codebook: Array[Double], m: Int, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(m > 0 && k > 0 && codebook.length % (m * k) == 0, "bad codebook shape")
  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val v = in.asInstanceOf[ArrayData]
    val sub = codebook.length / (m * k)
    val lut = new Array[Double](m * k)
    var mm = 0
    while (mm < m) {
      var j = 0
      while (j < k) {
        val base = (mm * k + j) * sub
        var acc = 0.0
        var t = 0
        while (t < sub) { acc += v.getDouble(mm * sub + t) * codebook(base + t); t += 1 }
        lut(mm * k + j) = acc
        j += 1
      }
      mm += 1
    }
    new GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $ref.nullSafeEval($a);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (codes array<int> length M, lut array<double> length M·K) → ADC score
  * Σ_m lut[m·K + codes[m]]. THE inner loop of a PQ scan (corpus × queries
  * evaluations), so the loop is emitted directly into whole-stage codegen —
  * M adds and M indexed loads per pair, no subexpression dispatch. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  // codes must be array<int> EXACTLY (array<long> is rejected — implicit
  // narrowing doesn't apply — instead of silently misreading 4 of 8 bytes)
  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(IntegerType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val k = if (m == 0) 0 else lut.numElements() / m
    var acc = 0.0
    var i = 0
    while (i < m) { acc += lut.getDouble(i * k + codes.getInt(i)); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val m = ctx.freshName("m")
      val k = ctx.freshName("k"); val acc = ctx.freshName("acc")
      s"""
         |int $m = $a.numElements();
         |int $k = ($m == 0) ? 0 : ($b.numElements() / $m);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  $acc += $b.getDouble($i * $k + $a.getInt($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object PqExprs {
  import org.apache.spark.sql.GraftShims.{column, expression}

  def pqEncode(vec: Column, codebook: Array[Double], m: Int, k: Int): Column =
    column(PqEncode(expression(vec), codebook, m, k))

  def pqLut(vec: Column, codebook: Array[Double], m: Int, k: Int): Column =
    column(PqLut(expression(vec), codebook, m, k))

  def pqAdc(codes: Column, lut: Column): Column =
    column(PqAdc(expression(codes), expression(lut)))
}
