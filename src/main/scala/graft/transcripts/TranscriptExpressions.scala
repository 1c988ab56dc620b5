package graft.transcripts

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-width character chunking of a string, fused (r06):
  * `chunks(s, w)[k] ≡ substring(s, k*w + 1, w)` for
  * `k = 0 .. max(ceil(numChars/w) - 1, 0)` — exactly the turn-chunk
  * derivation `explode(sequence(0, greatest(ceil(length(s)/w)-1, 0)))`
  * + per-turn `substring`, which re-scans the string from the head for
  * every chunk (`UTF8String.substring` is O(position), so a d-char doc
  * pays O(d²/w) byte scans). This walks the codepoint offsets once.
  * Special cases mirrored from the SQL formulation: empty string → one
  * empty chunk (`sequence(0,0)` + `substring('',1,w)`); NULL string →
  * one NULL chunk (`greatest(null, 0)` is 0 — greatest skips nulls —
  * and `substring(null, …)` is null, so the SQL chain emits exactly
  * one row with null text). Pair with `posexplode` so `pos` is the
  * former turn_idx. Equivalence is spec-tested (TranscriptsSpec).
  */
object TranscriptOps {
  def chunks(s: UTF8String, w: Int): ArrayData = {
    if (s == null) return new GenericArrayData(Array[Any](null))
    val nBytes = s.numBytes()
    val nChars = s.numChars()
    val n = math.max((nChars + w - 1) / w, 1)
    val out = new Array[Any](n)
    if (nBytes == nChars) {
      // ASCII: byte offsets are char offsets — direct slices
      var k = 0
      while (k < n) {
        val from = math.min(k * w, nBytes)
        val until = math.min(from + w, nBytes)
        val bytes = new Array[Byte](until - from)
        var j = 0
        while (j < bytes.length) { bytes(j) = s.getByte(from + j); j += 1 }
        out(k) = UTF8String.fromBytes(bytes)
        k += 1
      }
    } else {
      // general UTF-8: one pass to collect char→byte offsets
      val offsets = new Array[Int](nChars + 1)
      var i = 0
      var b = 0
      while (i < nChars) {
        offsets(i) = b
        b += UTF8String.numBytesForFirstByte(s.getByte(b))
        i += 1
      }
      offsets(nChars) = nBytes
      var k = 0
      while (k < n) {
        val fromC = math.min(k * w, nChars)
        val untilC = math.min(fromC + w, nChars)
        val from = offsets(fromC)
        val until = offsets(untilC)
        val bytes = new Array[Byte](until - from)
        var j = 0
        while (j < bytes.length) { bytes(j) = s.getByte(from + j); j += 1 }
        out(k) = UTF8String.fromBytes(bytes)
        k += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** See [[TranscriptOps.chunks]]. NULL input yields `[NULL]` (one null
  * chunk) — the expression itself is never null, so `eval`/codegen
  * handle the null child inline instead of `nullSafeEval`. */
case class Chunks(child: Expression, width: Int)
    extends UnaryExpression with Serializable {
  require(width >= 1, s"chunk width must be >= 1, got $width")
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  override def eval(input: InternalRow): Any =
    TranscriptOps.chunks(child.eval(input).asInstanceOf[UTF8String], width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.transcripts.TranscriptOps.chunks(
            ${c.isNull} ? null : ${c.value}, $width);
      """,
      isNull = FalseLiteral)
  }
  override def prettyName: String = "char_chunks"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
