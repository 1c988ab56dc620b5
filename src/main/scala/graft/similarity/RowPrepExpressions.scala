package graft.similarity

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass replacements for the matcher's two per-row
  * preparation expressions (r06, guide §1.2 "per-task work"): both run
  * once per POST-EXCHANGE row on every side of every block join, and
  * both were regex-/HOF-interpreted:
  *
  *   - [[DigitRuns]] ≡ `regexp_extract_all(c, '[0-9]+', 0)` — maximal
  *     digit runs. Exact for ALL UTF-8 input with a pure byte scan:
  *     ASCII digit bytes (0x30-0x39) never occur inside a multi-byte
  *     UTF-8 sequence, so char-level maximal runs equal byte-level
  *     maximal runs.
  *   - [[SortedTokenSet]] ≡ `array_sort(array_distinct(filter(
  *     split(c, "\\s+"), t => t =!= "")))`. Java `\s` is the six ASCII
  *     whitespace chars (no UNICODE_CHARACTER_CLASS), none of which can
  *     appear inside a multi-byte sequence, so byte-level splitting is
  *     exact for all UTF-8 too; dedup keeps a hash set, the sort is
  *     `UTF8String`'s binary order — exactly `array_sort`'s ordering
  *     under the default collation.
  *
  * Both are property-tested equal to the Column formulations they
  * replace (RowPrepExpressionsSpec).
  */
object RowPrepOps {

  private val emptyArray = new GenericArrayData(Array.empty[Any])

  def digitRuns(s: UTF8String): ArrayData = {
    val n = s.numBytes()
    var out: java.util.ArrayList[Any] = null
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= '0' && b <= '9') {
        val start = i
        i += 1
        while (i < n && { val c = s.getByte(i); c >= '0' && c <= '9' }) i += 1
        val bytes = new Array[Byte](i - start)
        var j = 0
        while (j < bytes.length) { bytes(j) = s.getByte(start + j); j += 1 }
        if (out == null) out = new java.util.ArrayList[Any](4)
        out.add(UTF8String.fromBytes(bytes))
      } else i += 1
    }
    if (out == null) emptyArray else new GenericArrayData(out.toArray)
  }

  @inline private def isJavaSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** [[sortedTokenSet]] with the set-sim family's tokenizer (split on
    * the single space character, like `split(c, " ")` + drop-empties —
    * NOT java `\\s`): sorted distinct tokens, byte-exact for all UTF-8.
    * Equals `sort_array(collect_list(tok))` over the family's exploded
    * (id, tok) membership for a unique-id row. */
  def sortedTokenSetSpace(s: UTF8String): ArrayData = tokenSet(s, spaceOnly = true)

  def sortedTokenSet(s: UTF8String): ArrayData = tokenSet(s, spaceOnly = false)

  /** One body for both tokenizers (one predictable branch per byte):
    * one materialization of the backing bytes; every token is a
    * zero-copy VIEW (fromBytes(bytes, off, len)) — at millions of
    * post-shuffle rows × hundreds of tokens, per-token byte copies and
    * per-row hash sets measurably drag the scoring join (a first fused
    * attempt cost ~30% of match throughput; see OPTIMIZATION_r06.md).
    * Sort, then adjacent-dedup: same set + same order as
    * array_sort(array_distinct(...)), no per-row hash table. */
  private def tokenSet(s: UTF8String, spaceOnly: Boolean): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    @inline def isSep(b: Byte): Boolean =
      if (spaceOnly) b == ' ' else isJavaSpace(b)
    var count = 0
    var i = 0
    while (i < n) {
      if (isSep(bytes(i))) i += 1
      else {
        count += 1
        i += 1
        while (i < n && !isSep(bytes(i))) i += 1
      }
    }
    if (count == 0) return emptyArray
    val arr = new Array[UTF8String](count)
    var w = 0
    i = 0
    while (i < n) {
      if (isSep(bytes(i))) i += 1
      else {
        val start = i
        i += 1
        while (i < n && !isSep(bytes(i))) i += 1
        arr(w) = UTF8String.fromBytes(bytes, start, i - start)
        w += 1
      }
    }
    java.util.Arrays.sort(arr, (a: UTF8String, b: UTF8String) => a.binaryCompare(b))
    w = 1
    i = 1
    while (i < count) {
      if (!arr(i).equals(arr(w - 1))) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    if (w == count) new GenericArrayData(arr.asInstanceOf[Array[AnyRef]])
    else {
      val trimmed = new Array[AnyRef](w)
      System.arraycopy(arr, 0, trimmed, 0, w)
      new GenericArrayData(trimmed)
    }
  }
}

/** See [[RowPrepOps.digitRuns]]. */
case class DigitRuns(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    RowPrepOps.digitRuns(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.similarity.RowPrepOps.digitRuns($c)")
  override def prettyName: String = "digit_runs"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** See [[RowPrepOps.sortedTokenSet]] / [[RowPrepOps.sortedTokenSetSpace]]. */
case class SortedTokenSet(child: Expression, spaceOnly: Boolean = false)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  override def nullSafeEval(input: Any): Any =
    if (spaceOnly) RowPrepOps.sortedTokenSetSpace(input.asInstanceOf[UTF8String])
    else RowPrepOps.sortedTokenSet(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (spaceOnly)
      defineCodeGen(ctx, ev, c => s"graft.similarity.RowPrepOps.sortedTokenSetSpace($c)")
    else
      defineCodeGen(ctx, ev, c => s"graft.similarity.RowPrepOps.sortedTokenSet($c)")
  override def prettyName: String =
    if (spaceOnly) "sorted_token_set_space" else "sorted_token_set"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
