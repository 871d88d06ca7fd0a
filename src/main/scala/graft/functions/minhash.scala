package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as ONE native kernel: tokenize, shingle, md5, and the
  * full affine-family minimums in a single pass per row — the signature is
  * computed WHERE THE TEXT IS READ, so the sketch stage needs no explode
  * and no shuffle at all (the declarative explode+groupBy form shuffles
  * one row per doc; this shuffles nothing).
  *
  * Bit-identical to `Dedup.signaturesAgg` (equivalence-spec pinned) and to
  * the DuckDB oracle: the base hash is the low 60 bits of md5 mod P
  * (exactly `conv(substring(md5(s),1,15),16,10) % P`), the family is
  * `(a_i * h + b_i) mod P` with [[graft.ops.Dedup.minhashCoeffs]]'
  * constants, and tokenization replays Spark's own
  * `split(lower(trim(text)), "\\s+")` via the same UTF8String operations.
  */
object MinhashImpl {
  final val P = 2147483647L // 2^31 - 1, mirrors Dedup.MinhashP

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  /** The canonical affine-permutation family: INDEPENDENT seeded-random
    * draws a_i ∈ [1, P−1], b_i ∈ [0, P−1] (java.util.Random's LCG is
    * specified by the JDK, so the constants are stable everywhere and the
    * oracle interpolates them as literals).
    *
    * The original family a_i = a·(i+1), b_i = b·(i+1) was rank-1:
    * (a_i·h + b_i) = (i+1)·(a·h + b) mod P, so whichever shingle minimized
    * permutation 1 minimized EVERY permutation (until (i+1)·v wrapped P) —
    * two unrelated docs sharing one extreme-valued shingle produced
    * est_jaccard = 1.0 and were falsely merged by the 0.8-threshold
    * clustering. The `doc_minhash_est_error` eval exposed 99-point errors;
    * independent draws restore the one-permutation-per-position estimator.
    */
  def coefficients(numHashes: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(numHashes, { n =>
      val rnd = new java.util.Random(0x5eed4242L)
      def draw(): Long = (rnd.nextLong() & Long.MaxValue)
      val a = new Array[Long](n); val b = new Array[Long](n)
      var i = 0
      while (i < n) {
        a(i) = 1L + draw() % (P - 1)
        b(i) = draw() % P
        i += 1
      }
      (a, b)
    })

  private def coeffs(numHashes: Int): (Array[Long], Array[Long]) =
    coefficients(numHashes)

  /** Low 60 bits of md5 (first 15 hex nibbles) — byte-for-byte what
    * `conv(substring(md5(s), 1, 15), 16, 10)` computes.
    */
  private[functions] def baseHash60(bytes: Array[Byte]): Long =
    md5Range60(bytes, 0, bytes.length)

  /** [[baseHash60]] over a byte RANGE (no slice allocation) — the per-k-gram
    * hash of the portable winnowing kernel.
    */
  private[functions] def md5Range60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val d = md5Local.get()
    d.reset()
    d.update(bytes, off, len)
    val h = d.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) >> 4) & 0xfL)
  }

  private def baseHash(bytes: Array[Byte]): Long = baseHash60(bytes) % P

  /** Spark-equivalent tokenization shared by every text sketch kernel:
    * split(lower(trim(text)), "\\s+") minus empties, via the same
    * UTF8String lowercase/trim (NOT java.lang.String's, whose Unicode
    * handling can differ).
    */
  private[functions] def tokenize(s: UTF8String): Array[String] = tokenize(s, true)

  private[functions] def tokenize(s: UTF8String, lowercase: Boolean): Array[String] = {
    val norm = (if (lowercase) s.toLowerCase else s).trim().toString
    val raw = norm.split("\\s+", -1)
    var nTok = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) nTok += 1; i += 1 }
    val toks = new Array[String](nTok)
    var t = 0
    i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) { toks(t) = raw(i); t += 1 }; i += 1 }
    toks
  }

  /** SimHash in the same one-pass shape: md5 each token (raw 60 bits —
    * the mod-P residue would zero the top 29 voting bits), accumulate
    * per-bit counts, majority vote. Bit-identical to the lane-packed
    * aggregate form and to the DuckDB oracle. Returns 0L for a tokenless
    * document (which the aggregate form drops — callers align on that).
    */
  def simhash(s: UTF8String): Long = {
    val toks = tokenize(s)
    if (toks.length == 0) return 0L
    val counts = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      val h = baseHash60(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var b = 0
      while (b < 60) { counts(b) += ((h >> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) * 2 > toks.length) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** Token n-gram strings in one pass (the explode input for contamination
    * and shingle joins): same short-doc collapse as `shinglesFromTokens`
    * when `collapseShort`, else empty for docs under n tokens.
    */
  def tokenNgrams(s: UTF8String, n: Int, collapseShort: Boolean, lowercase: Boolean): ArrayData = {
    val toks = tokenize(s, lowercase)
    val sb = new java.lang.StringBuilder(64)
    def join(from: Int, len: Int): UTF8String = {
      sb.setLength(0)
      var j = 0
      while (j < len) { if (j > 0) sb.append(' '); sb.append(toks(from + j)); j += 1 }
      UTF8String.fromString(sb.toString)
    }
    if (toks.length < n) {
      if (collapseShort)
        new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](join(0, toks.length)))
      else new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var p = 0
      while (p <= toks.length - n) { seen.add(join(p, n)); p += 1 }
      val arr = new Array[Any](seen.size)
      val it = seen.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    }
  }

  /** Static entry point callable from generated Java code. */
  def compute(s: UTF8String, shingleSize: Int, numHashes: Int): ArrayData = {
    val toks = tokenize(s)
    val nTok = toks.length
    val (as, bs) = coeffs(numHashes)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)

    val sb = new java.lang.StringBuilder(64)
    def fold(shingle: String): Unit = {
      val h = baseHash(shingle.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var k = 0
      while (k < numHashes) {
        val v = (as(k) * h + bs(k)) % P
        if (v < sig(k)) sig(k) = v
        k += 1
      }
    }

    if (nTok < shingleSize) {
      // short doc: ONE whole-text shingle (concat_ws of all tokens)
      sb.setLength(0)
      var j = 0
      while (j < nTok) { if (j > 0) sb.append(' '); sb.append(toks(j)); j += 1 }
      fold(sb.toString)
    } else {
      var p = 0
      while (p <= nTok - shingleSize) {
        sb.setLength(0)
        var j = 0
        while (j < shingleSize) { if (j > 0) sb.append(' '); sb.append(toks(p + j)); j += 1 }
        fold(sb.toString) // duplicate shingles re-fold to the same mins
        p += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }
}

/** `minhash_signature(text, shingleSize, numHashes)`: array<bigint> MinHash
  * signature. Null text -> null.
  */
case class MinhashSignature(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression {
  require(shingleSize > 0 && numHashes > 0,
    s"shingleSize and numHashes must be positive, got $shingleSize/$numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_signature expects string, got ${other.simpleString(10)}")
    }

  override def nullSafeEval(input: Any): Any =
    MinhashImpl.compute(input.asInstanceOf[UTF8String], shingleSize, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashImpl.compute($c, $shingleSize, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash64(text)`: one-pass SimHash fingerprint. Null text -> null. */
case class Simhash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects string, got ${other.simpleString(10)}")
    }
  override def nullSafeEval(input: Any): Any =
    MinhashImpl.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashImpl.simhash($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `token_ngrams(text, n, collapseShort)`: array<string> of distinct token
  * n-grams in first-occurrence order. Null text -> null.
  */
case class TokenNgrams(child: Expression, n: Int, collapseShort: Boolean,
    lowercase: Boolean) extends UnaryExpression {
  require(n > 0, s"n must be positive, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_ngrams"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_ngrams expects string, got ${other.simpleString(10)}")
    }
  override def nullSafeEval(input: Any): Any =
    MinhashImpl.tokenNgrams(input.asInstanceOf[UTF8String], n, collapseShort, lowercase)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashImpl.tokenNgrams($c, $n, $collapseShort, $lowercase);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object minhash {
  def minhash_signature(text: Column, shingleSize: Int, numHashes: Int): Column =
    GraftExpressionBridge.column(MinhashSignature(
      GraftExpressionBridge.expression(text), shingleSize, numHashes))

  def simhash64(text: Column): Column =
    GraftExpressionBridge.column(Simhash64(GraftExpressionBridge.expression(text)))

  def token_ngrams(text: Column, n: Int, collapseShort: Boolean = false,
      lowercase: Boolean = true): Column =
    GraftExpressionBridge.column(TokenNgrams(
      GraftExpressionBridge.expression(text), n, collapseShort, lowercase))

  /** SQL registration: `SELECT minhash_signature(body, 3, 32) FROM docs`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_signature", { exprs =>
      def lit(e: Expression, name: String): Int = e match {
        case f if f.foldable => f.eval(null) match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"$name must be an int literal, got $other")
        }
        case _ => throw new IllegalArgumentException(s"$name must be foldable")
      }
      exprs match {
        case Seq(t) => MinhashSignature(t, 3, 32)
        case Seq(t, n, k) => MinhashSignature(t, lit(n, "shingleSize"), lit(k, "numHashes"))
        case _ => throw new IllegalArgumentException(
          "minhash_signature(text[, shingleSize, numHashes])")
      }
    }, "built-in")
  }
}
