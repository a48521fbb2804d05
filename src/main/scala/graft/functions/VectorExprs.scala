package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShims.AbstractType
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native (codegen'd) vector kernels for the similarity hot paths.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`/`transform`) are
  * CodegenFallback — interpreted, with per-element closure dispatch. For the
  * ANN/dedup workloads here the inner product over a 64-dim embedding is THE
  * inner loop (corpus × queries evaluations), so these expressions emit the
  * tight loop directly and stay inside whole-stage codegen.
  *
  * Accumulation order is ascending-index left-fold — bit-for-bit identical
  * to the `aggregate()` HOF formulation AND to the DuckDB oracle's
  * `list_reduce(list_prepend(0.0, ...))`, so swapping these in does not
  * perturb any oracle-checked value.
  *
  * Inputs must be ArrayType(DoubleType) with non-null elements (callers
  * cast embeddings once per scan).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  // getDouble reads array storage directly — declare the type contract so
  // the analyzer inserts casts for numeric arrays (float embeddings via
  // SQL) and REJECTS non-numeric ones, instead of misreading bytes
  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Cosine similarity in ONE pass over both arrays (dot + both norms), with
  * the all-zero-vector guard returning 0.0 — operation-for-operation the
  * same arithmetic as `dot/(sqrt(na)*sqrt(nb))` over ascending-index folds,
  * so values match the HOF form and the DuckDB oracle bit-for-bit. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0) dot / denom else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv"); val denom = ctx.freshName("denom")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |double $denom = Math.sqrt($na) * Math.sqrt($nb);
         |${ev.value} = ($denom > 0) ? ($dot / $denom) : 0.0;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Engine-portable 64-bit token hash: the first 8 bytes of md5, folded
  * big-endian — i.e. the integer a SQL engine gets by parsing the first 16
  * hex digits of `md5(token)`. Used by [[SimHash64]]'s portable mode so a
  * DuckDB oracle can replay the fingerprint bit-for-bit (xxhash64 has no
  * SQL twin; md5 does — the q14/q26 precedent). */
object PortableHash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Long(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    val bytes = digest.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (bytes(i) & 0xffL); i += 1 }
    h
  }
}

/** 64-bit SimHash of a token array in one pass — each token's 64-bit hash
  * votes ±1 on every bit position; the sign of each position's total forms
  * the fingerprint. Token hash is xxhash64 seed 42 (fast path, same
  * `XXH64.hashUTF8String` the builtin uses) or md5-derived
  * ([[PortableHash.md5Long]]) when `portable` — identical structure, but a
  * SQL engine can replay the md5 form exactly.
  *
  * Replaces the explode → 64-conditional-sums aggregate shape: the
  * fingerprint becomes a single codegen'd projection over the corpus scan —
  * no explode blow-up, no shuffle at all (the old shape shuffled 64 longs
  * per document). Duplicate tokens vote once each, matching the exploded
  * formulation. */
case class SimHash64(child: Expression, portable: Boolean = false)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      val h =
        if (portable) PortableHash.md5Long(arr.getUTF8String(t))
        else XXH64.hashUTF8String(arr.getUTF8String(t), 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val counts = ctx.addMutableState("int[]", "simhashCounts",
      v => s"$v = new int[64];")
    nullSafeCodeGen(ctx, ev, a => {
      val t = ctx.freshName("t"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val fp = ctx.freshName("fp")
      val n = ctx.freshName("n")
      val hashCall =
        if (portable)
          s"graft.functions.PortableHash.md5Long($a.getUTF8String($t))"
        else
          s"org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String($a.getUTF8String($t), 42L)"
      s"""
         |java.util.Arrays.fill($counts, 0);
         |int $n = $a.numElements();
         |for (int $t = 0; $t < $n; $t++) {
         |  long $h = $hashCall;
         |  for (int $i = 0; $i < 64; $i++) {
         |    if ((($h >>> $i) & 1L) == 1L) $counts[$i]++; else $counts[$i]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($counts[$i] > 0) $fp |= (1L << $i);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted distinct xxhash64 values of all character n-grams of a string —
  * one pass, no per-gram Column-expression dispatch. Identical values to
  * `array_sort(array_distinct(transform(sequence(...), i ->
  * xxhash64(substr(t, i+1, n)))))` (the interpreted-HOF formulation this
  * replaces): same `substringSQL` codepoint semantics, same seed-42 hash,
  * same sorted-unique output (ready for the two-pointer intersect). Strings
  * shorter than n hash whole, matching the HOF form's `< n` branch. */
case class HashedCharNGrams(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n > 0)
  override def inputTypes: Seq[AbstractType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val s = in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val len = s.numChars()
    val out =
      if (len < n) Array(XXH64.hashUTF8String(s, 42L))
      else {
        val m = len - n + 1
        val hs = new Array[Long](m)
        var i = 0
        while (i < m) {
          hs(i) = XXH64.hashUTF8String(s.substringSQL(i + 1, n), 42L)
          i += 1
        }
        java.util.Arrays.sort(hs)
        // in-place dedupe of the sorted hashes
        var w = 0; var r = 0
        while (r < m) {
          if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
          r += 1
        }
        if (w == m) hs else java.util.Arrays.copyOf(hs, w)
      }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  // Interpreted eval is already allocation-lean; the win over the HOF form
  // is avoiding per-element expression-tree evaluation, which this gets on
  // both paths — so codegen delegates to eval via the default fallback.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedNGrams", this,
      classOf[HashedCharNGrams].getName)
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

/** Sorted distinct xxhash64 values of all word w-shingles of a token array
  * (shingle text = tokens joined by a single space) — one pass, replacing
  * the interpreted `transform(shingles, xxhash64)` over
  * `concat_ws(" ", slice(toks, i, w))` lambdas (~hundreds of expression
  * dispatches per document). Fewer tokens than w hash the whole joined
  * array, matching the HOF form's `size < w` branch. */
case class HashedWordShingles(child: Expression, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(w > 0)
  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val arr = in.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sep = UTF8String.fromString(" ")
    val out =
      if (n < w) {
        val toks = Array.tabulate(n)(arr.getUTF8String)
        Array(XXH64.hashUTF8String(UTF8String.concatWs(sep, toks: _*), 42L))
      } else {
        val m = n - w + 1
        val hs = new Array[Long](m)
        val window = new Array[UTF8String](w)
        var i = 0
        while (i < m) {
          var j = 0
          while (j < w) { window(j) = arr.getUTF8String(i + j); j += 1 }
          hs(i) = XXH64.hashUTF8String(UTF8String.concatWs(sep, window: _*), 42L)
          i += 1
        }
        java.util.Arrays.sort(hs)
        var wr = 0; var r = 0
        while (r < m) {
          if (wr == 0 || hs(r) != hs(wr - 1)) { hs(wr) = hs(r); wr += 1 }
          r += 1
        }
        if (wr == m) hs else java.util.Arrays.copyOf(hs, wr)
      }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedShingles", this,
      classOf[HashedWordShingles].getName)
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

/** Multi-table random-hyperplane sign sketches (cosine LSH, Charikar 2002)
  * in one pass: `tables` independent sketches of `planesPerTable` sign bits
  * each over a dense double vector. Bit p of table t = sign of the inner
  * product with hyperplane `planes[(t·r + p)·dim ..]` (flat row-major
  * layout, [[graft.operators.Ann.PqModel]] codebook convention). Output is
  * `array<long>` of length `tables` — callers posexplode into (table,
  * sketch) bucket keys, so the banded any-table-collision candidate join
  * stays an equi-join. One tight loop, tables·r·dim mult-adds per row;
  * interpreted eval is already allocation-lean so codegen delegates to it
  * (the [[HashedCharNGrams]] pattern). */
case class HyperplaneSketches(child: Expression, planes: Array[Double],
                              tables: Int, planesPerTable: Int,
                              planesBc: Option[org.apache.spark.broadcast
                                .Broadcast[Array[Double]]] = None)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(DoubleType))
  require(tables > 0 && planesPerTable > 0 && planesPerTable < 64,
    s"HyperplaneSketches: need 0 < planesPerTable < 64, 0 < tables; " +
      s"got tables=$tables r=$planesPerTable")
  // planesBc carries the matrix as a BROADCAST instead of an expression-node
  // literal: at dim=768 a 16×16 matrix is ~3.1 MB serialized into EVERY task
  // binary of every stage touching the projection — broadcast ships it to
  // each executor once. Driver-side bc.value is a local read, so shape
  // validation and `dim` stay construction-time either way.
  private val planesLen = planesBc.map(_.value.length).getOrElse(planes.length)
  require(planesLen % (tables * planesPerTable) == 0,
    "HyperplaneSketches: planes length must be tables*planesPerTable*dim")
  private val dim = planesLen / (tables * planesPerTable)
  @transient private lazy val mat: Array[Double] =
    planesBc.map(_.value).getOrElse(planes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val v = in.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sk = 0L
      var p = 0
      while (p < planesPerTable) {
        val base = (t * planesPerTable + p) * dim
        var acc = 0.0
        var i = 0
        while (i < n) { acc += v.getDouble(i) * mat(base + i); i += 1 }
        if (acc >= 0) sk |= (1L << p)
        p += 1
      }
      out(t) = sk
      t += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperSketches", this,
      classOf[HyperplaneSketches].getName)
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

/** Single-pass token statistics over a (lowercased) token array:
  * `struct<n_tokens: long, sum_len: long, stop_hits: long>` — the three
  * aggregates every corpus-quality scan needs (token count, mean-length
  * numerator, stopword evidence). Replaces two interpreted HOF lambdas
  * (`filter` + `aggregate`, per-token closure dispatch) with one tight
  * loop over the array; the stopword set is hashed once at plan time.
  * Token lengths count codepoints, matching `length()` in both engines. */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false)))

  @transient private lazy val stopSet = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    stopwords.foreach(w =>
      s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sumLen = 0L
    var hits = 0L
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      sumLen += t.numChars()
      if (stopSet.contains(t)) hits += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, sumLen, hits))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenStats", this, classOf[TokenStats].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  $ref.nullSafeEval($a);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExprs {
  import org.apache.spark.sql.GraftShims.{column, expression}

  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  def cosine(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  def simhash64(toks: Column, portable: Boolean = false): Column =
    column(SimHash64(expression(toks), portable))

  def hashedCharNGrams(t: Column, n: Int): Column =
    column(HashedCharNGrams(expression(t), n))

  def hashedWordShingles(toks: Column, w: Int): Column =
    column(HashedWordShingles(expression(toks), w))

  def tokenStats(toks: Column, stopwords: Seq[String]): Column =
    column(TokenStats(expression(toks), stopwords))

  def hyperplaneSketches(vec: Column, planes: Array[Double], tables: Int,
                         planesPerTable: Int): Column =
    column(HyperplaneSketches(expression(vec), planes, tables, planesPerTable))

  /** Broadcast form: the plane matrix ships per-executor once instead of
    * riding every task binary — use when tables·r·dim is large (see
    * [[graft.operators.Dedup.hyperplaneSketchCol]] for the size cut). */
  def hyperplaneSketchesBc(vec: Column,
                           planes: org.apache.spark.broadcast.Broadcast[Array[Double]],
                           tables: Int, planesPerTable: Int): Column =
    column(HyperplaneSketches(expression(vec), Array.emptyDoubleArray,
      tables, planesPerTable, Some(planes)))
}
