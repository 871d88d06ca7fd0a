package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint (Schleimer, Wilkerson, Aiken, SIGMOD'03) as ONE
  * native kernel: char k-gram xxhash64, sliding-window minimum, distinct —
  * all in a single JIT-compiled pass over the string bytes.
  *
  * The declarative formulation (`transform(sequence(...), i ->
  * xxhash64(substr))` + shifted `zip_with` minima) is semantically identical
  * but evaluates the lambda INTERPRETED per k-gram and allocates a substring
  * per position; this kernel hashes byte ranges in place (one codepoint
  * offset walk per row, zero substring allocations). K-gram hashes are
  * bit-identical to Spark's `xxhash64` on the same substrings (same XXH64,
  * same seed 42), pinned by an equivalence spec against the HOF form.
  */
object WinnowImpl {
  private final val Seed = 42L

  /** Static entry point callable from generated Java code. */
  def compute(s: UTF8String, k: Int, window: Int): ArrayData = {
    val n = s.numChars()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes
    if (n < k)
      return UnsafeArrayData.fromPrimitiveArray(
        Array(XXH64.hashUnsafeBytes(base, off, nb, Seed)))
    // one walk: byte offset of every codepoint (substr is char-addressed)
    val offs = new Array[Int](n + 1)
    var ci = 0
    var b = 0
    while (b < nb) {
      offs(ci) = b
      b += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + b))
      ci += 1
    }
    offs(n) = nb
    val numKg = n - k + 1
    val kg = new Array[Long](numKg)
    var j = 0
    while (j < numKg) {
      kg(j) = XXH64.hashUnsafeBytes(base, off + offs(j), offs(j + k) - offs(j), Seed)
      j += 1
    }
    winnowMins(kg, window)
  }

  /** Portable-family variant: the k-gram hash is the low 60 bits of md5
    * (`('0x' || substr(md5(g), 1, 15))::BIGINT` in DuckDB terms), so the
    * whole winnow pipeline — k-grams, window minima, distinct — replays in
    * ANSI SQL and the fingerprint query is hash-checkable cross-engine.
    * Identical structure to [[compute]]; xxhash64 stays the throughput path
    * (md5 costs ~5x per k-gram).
    */
  def computePortable(s: UTF8String, k: Int, window: Int): ArrayData = {
    val bytes = s.getBytes
    val n = s.numChars()
    if (n < k)
      return UnsafeArrayData.fromPrimitiveArray(
        Array(MinhashImpl.baseHash60(bytes)))
    val offs = new Array[Int](n + 1)
    var ci = 0
    var b = 0
    while (b < bytes.length) {
      offs(ci) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      ci += 1
    }
    offs(n) = bytes.length
    val numKg = n - k + 1
    val kg = new Array[Long](numKg)
    var j = 0
    while (j < numKg) {
      kg(j) = MinhashImpl.md5Range60(bytes, offs(j), offs(j + k) - offs(j))
      j += 1
    }
    winnowMins(kg, window)
  }

  /** Shared tail of both kernels: sliding-window minima + first-occurrence
    * distinct (matches `array_distinct`).
    */
  private def winnowMins(kg: Array[Long], window: Int): ArrayData = {
    val numKg = kg.length
    val mins: Array[Long] =
      if (numKg <= window) {
        var m = kg(0); var t = 1
        while (t < numKg) { if (kg(t) < m) m = kg(t); t += 1 }
        Array(m)
      } else {
        // O(window) per position like the shifted-zip form; window is small
        val w = numKg - window + 1
        val out = new Array[Long](w)
        var p = 0
        while (p < w) {
          var m = kg(p); var q = p + 1
          while (q < p + window) { if (kg(q) < m) m = kg(q); q += 1 }
          out(p) = m; p += 1
        }
        out
      }
    // distinct, first-occurrence order (matches array_distinct)
    val seen = new java.util.HashSet[java.lang.Long](mins.length * 2)
    val distinct = new Array[Long](mins.length)
    var d = 0
    var i = 0
    while (i < mins.length) {
      if (seen.add(mins(i))) { distinct(d) = mins(i); d += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(distinct, d))
  }
}

/** `winnow_fingerprint(text, k, window)`: array<bigint> of distinct
  * window-min k-gram hashes. Null text -> null. `portable = true` swaps the
  * xxhash64 k-gram hash for the md5-low-60-bits family (SQL-replayable;
  * ~5x slower per k-gram — the oracle path, not the 100 TB path).
  */
case class WinnowFingerprint(child: Expression, k: Int, window: Int,
    portable: Boolean = false) extends UnaryExpression {
  require(k > 0 && window > 0, s"k and window must be positive, got k=$k window=$window")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String =
    if (portable) "winnow_fingerprint_portable" else "winnow_fingerprint"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprint expects string, got ${other.simpleString(10)}")
    }

  private def impl = if (portable) "computePortable" else "compute"

  override def nullSafeEval(input: Any): Any =
    if (portable) WinnowImpl.computePortable(input.asInstanceOf[UTF8String], k, window)
    else WinnowImpl.compute(input.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the kernel is one static JVM call — stays inside whole-stage codegen,
    // JIT compiles the loop once (vs janino-compiling an inlined body)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowImpl.$impl($c, $k, $window);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass stopword counting shared by quality/langid signals. */
object StopwordImpl {
  /** Static entry point callable from generated Java code: tokenize ONCE
    * (same lower/trim/split as every text kernel), then count membership
    * per word set. Hash lookup per token replaces a regex-alternation scan
    * per LANGUAGE — the difference between O(tokens) and O(bytes x words).
    */
  def count(s: UTF8String, sets: Array[java.util.HashSet[String]]): ArrayData = {
    val toks = MinhashImpl.tokenize(s)
    val out = new Array[Int](sets.length)
    var i = 0
    while (i < toks.length) {
      var k = 0
      while (k < sets.length) {
        if (sets(k).contains(toks(i))) out(k) += 1
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `stopword_counts(text)`: array<int> of per-word-set whitespace-token
  * membership counts — equals `len(list_filter(ltoks, t ->
  * list_contains(words, t)))` per set (the DuckDB oracle formulation).
  * Null text -> null. The word lists ride along as a reference object, not
  * literals, so the generated code stays O(1) in list size.
  */
case class StopwordCounts(child: Expression, wordLists: Seq[Seq[String]])
    extends UnaryExpression {
  require(wordLists.nonEmpty, "at least one word list")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "stopword_counts"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"stopword_counts expects string, got ${other.simpleString(10)}")
    }

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    wordLists.map { ws =>
      val s = new java.util.HashSet[String](ws.length * 2)
      ws.foreach(s.add); s
    }.toArray

  override def nullSafeEval(input: Any): Any =
    StopwordImpl.count(input.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordSets", sets,
      "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StopwordImpl.count($c, (java.util.HashSet[]) $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** RFC 3986 §6.2.2 percent-encoding normalization as one byte-level pass:
  * `%XX` triplets whose octet is UNRESERVED (ALPHA / DIGIT / `-` `.` `_`
  * `~`) decode to the octet (§6.2.2.2 — `%7E` ≡ `~`, a real crawl-dedup
  * miss class); every other well-formed triplet keeps its escape with the
  * hex digits UPPERCASED (§6.2.2.1 — `%2f` ≡ `%2F` but NOT `/`: decoding
  * reserved octets would change the path structure). A `%` not followed
  * by two hex digits is copied verbatim (malformed input passes through
  * rather than corrupting). Only ASCII triplets are touched, so UTF-8
  * multibyte sequences stream through untouched.
  */
object PercentImpl {
  private def hexVal(b: Byte): Int = b match {
    case d if d >= '0' && d <= '9' => d - '0'
    case a if a >= 'a' && a <= 'f' => a - 'a' + 10
    case a if a >= 'A' && a <= 'F' => a - 'A' + 10
    case _ => -1
  }
  private def unreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'
  private final val HexUpper = "0123456789ABCDEF".getBytes("US-ASCII")

  /** Static entry point callable from generated Java code. */
  def normalize(s: UTF8String): UTF8String = {
    val in = s.getBytes
    // fast path: no '%' at all (the overwhelming majority of crawl URLs)
    var has = false
    var i = 0
    while (i < in.length && !has) { has = in(i) == '%'; i += 1 }
    if (!has) return s
    val out = new Array[Byte](in.length)
    var o = 0
    i = 0
    while (i < in.length) {
      val b = in(i)
      if (b == '%' && i + 2 < in.length &&
        hexVal(in(i + 1)) >= 0 && hexVal(in(i + 2)) >= 0) {
        val v = (hexVal(in(i + 1)) << 4) | hexVal(in(i + 2))
        if (unreserved(v)) { out(o) = v.toByte; o += 1 }
        else {
          out(o) = '%'; out(o + 1) = HexUpper(v >> 4); out(o + 2) = HexUpper(v & 15)
          o += 3
        }
        i += 3
      } else {
        out(o) = b; o += 1; i += 1
      }
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }
}

/** `percent_normalize(url)`: [[PercentImpl.normalize]] per row — the
  * canonical-URL chain's only step that regexp column algebra cannot
  * express (mapping hex digits to an octet needs computation, not
  * substitution). Null in -> null out; idempotent (decoded unreserved
  * octets contain no `%`, surviving escapes are already uppercase).
  */
case class PercentNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "percent_normalize"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"percent_normalize expects string, got ${other.simpleString(10)}")
    }

  override def nullSafeEval(input: Any): Any =
    PercentImpl.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PercentImpl.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object text {
  def percent_normalize(url: Column): Column =
    GraftExpressionBridge.column(PercentNormalize(
      GraftExpressionBridge.expression(url)))

  def stopword_counts(text: Column, wordLists: Seq[Seq[String]]): Column =
    GraftExpressionBridge.column(StopwordCounts(
      GraftExpressionBridge.expression(text), wordLists))

  def winnow_fingerprint(text: Column, k: Int, window: Int): Column =
    GraftExpressionBridge.column(WinnowFingerprint(
      GraftExpressionBridge.expression(text), k, window))

  def winnow_fingerprint_portable(text: Column, k: Int, window: Int): Column =
    GraftExpressionBridge.column(WinnowFingerprint(
      GraftExpressionBridge.expression(text), k, window, portable = true))

  /** SQL registration: `SELECT winnow_fingerprint(body, 8, 4) FROM docs`.
    * k and window must be foldable integer literals.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("winnow_fingerprint", { exprs =>
      def lit(e: Expression, name: String): Int = e match {
        case f if f.foldable => f.eval(null) match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"$name must be an int literal, got $other")
        }
        case _ => throw new IllegalArgumentException(s"$name must be foldable")
      }
      exprs match {
        case Seq(t) => WinnowFingerprint(t, 8, 4)
        case Seq(t, kk, ww) => WinnowFingerprint(t, lit(kk, "k"), lit(ww, "window"))
        case _ => throw new IllegalArgumentException(
          "winnow_fingerprint(text[, k, window])")
      }
    }, "built-in")
  }
}
