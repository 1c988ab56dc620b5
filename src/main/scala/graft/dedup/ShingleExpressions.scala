package graft.dedup

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass replacements for the two hottest per-row
  * expressions of the MinHash family (r06, guide §1.2 "per-task work"):
  *
  *   - [[CharShingles]] ≡ `array_distinct(transform(sequence(1, n),
  *     i => substr(c, i, k)))` with the same null/short-string guards
  *     as [[Dedup.shingles]]. The HOF chain is interpreted per element
  *     (lambda-variable binding + boxing per shingle) and measured
  *     ~10× the cost of the scan itself; this walks the string once,
  *     de-duplicates through a hash set, and preserves first-occurrence
  *     order — element-for-element identical output.
  *   - [[Md5Prefix60]] ≡ `conv(substring(md5(c), 1, 15), 16, 10)
  *     .cast("long")`: the first 60 bits of md5 WITHOUT the
  *     hex-string/`conv` round-trip (first 15 hex chars = first 7.5
  *     bytes = big-endian u64 of bytes 0..7 >>> 4), with a per-thread
  *     reused MessageDigest. Bit-identical values (spec-tested against
  *     the SQL formulation), so every DuckDB oracle mirror is
  *     untouched.
  */
object ShingleOps {

  /** Distinct k-char shingles in first-occurrence order; null in →
    * null out handled by the expression's null-safe eval; strings
    * shorter than k yield an empty array. Codepoint semantics match
    * `Column.substr` (character counts, not bytes). */
  def charShingles(s: UTF8String, k: Int): ArrayData = {
    val nChars = s.numChars()
    val n = nChars - (k - 1)
    if (n < 1) return new GenericArrayData(Array.empty[Any])
    val nBytes = s.numBytes()
    // codepoint byte-offsets; ASCII fast path = identity
    val ascii = nBytes == nChars
    val offsets = if (ascii) null else {
      val o = new Array[Int](nChars + 1)
      var i = 0
      var b = 0
      while (i < nChars) {
        o(i) = b
        b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(s.getByte(b))
        i += 1
      }
      o(nChars) = nBytes
      o
    }
    val seen = new java.util.HashSet[UTF8String](math.min(n * 2, 1 << 16))
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      // direct byte slice — UTF8String.substring would re-scan from the
      // string head per call (O(n²) over the row)
      val from = if (ascii) i else offsets(i)
      val until = if (ascii) i + k else offsets(i + k)
      val bytes = new Array[Byte](until - from)
      var j = 0
      while (j < bytes.length) { bytes(j) = s.getByte(from + j); j += 1 }
      val sub = UTF8String.fromBytes(bytes)
      if (seen.add(sub)) out.add(sub)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private val md5TL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s) as a positive long — identical to parsing
    * the first 15 hex chars base-16. */
  def md5Prefix60(s: UTF8String): Long = {
    val md = md5TL.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** See [[ShingleOps.charShingles]]. */
case class CharShingles(child: Expression, k: Int)
    extends UnaryExpression with Serializable {
  require(k >= 1, s"shingle width k must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    ShingleOps.charShingles(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.ShingleOps.charShingles($c, $k)")
  override def prettyName: String = "char_shingles"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** See [[ShingleOps.md5Prefix60]]. */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    ShingleOps.md5Prefix60(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.ShingleOps.md5Prefix60($c)")
  override def prettyName: String = "md5_prefix60"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
