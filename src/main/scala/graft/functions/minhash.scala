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

  private def coeffs(numHashes: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(numHashes, { n =>
      val a = new Array[Long](n); val b = new Array[Long](n)
      var i = 0
      while (i < n) {
        a(i) = (2654435761L * (i + 1)) % P
        b(i) = (1013904223L * (i + 1)) % P
        i += 1
      }
      (a, b)
    })

  /** Low 60 bits of md5 (first 15 hex nibbles), mod P — byte-for-byte what
    * `conv(substring(md5(s), 1, 15), 16, 10) % P` computes.
    */
  private def baseHash(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v = (v << 4) | ((h(7) >> 4) & 0xfL)
    v % P
  }

  /** Static entry point callable from generated Java code. */
  def compute(s: UTF8String, shingleSize: Int, numHashes: Int): ArrayData = {
    // replay Spark's split(lower(trim(text)), "\s+") exactly: UTF8String
    // lowercase/trim (NOT java.lang.String's, whose Unicode handling can
    // differ), then the same regex split with limit -1, then drop empties
    val norm = s.toLowerCase.trim().toString
    val raw = norm.split("\\s+", -1)
    var nTok = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) nTok += 1; i += 1 }
    val toks = new Array[String](nTok)
    var t = 0
    i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) { toks(t) = raw(i); t += 1 }; i += 1 }

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

object minhash {
  def minhash_signature(text: Column, shingleSize: Int, numHashes: Int): Column =
    GraftExpressionBridge.column(MinhashSignature(
      GraftExpressionBridge.expression(text), shingleSize, numHashes))

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
