package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Single-pass vector kernels for the embedding-similarity family
  * (ANN top-k, embedding near-dup). Spark's higher-order functions
  * (`zip_with`/`aggregate`) are CodegenFallback — interpreted, one
  * allocation per lambda step — which made the pairwise cosine the
  * hottest path in the bench by far (a |Q|×|C| join re-walking both
  * arrays three times per PAIR through interpreted HOFs). This
  * expression keeps the inner loop inside whole-stage codegen: one
  * virtual call into [[VectorOps.dot]] per pair, a tight primitive
  * loop inside.
  *
  * Null semantics mirror `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * exactly: null when either array is null, when lengths differ
  * (zip_with pads with nulls), or when any element is null — so
  * swapping it into an existing plan cannot change results.
  */
object VectorOps {
  /** Dot product; boxed null on length mismatch or any null element. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** `dot_product(array<double>, array<double>) -> double`, codegen'd. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  // length-mismatch/null-element yield null even for non-null inputs
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def nullSafeEval(l: Any, r: Any): Any =
    VectorOps.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Double ${ev.value}_r = graft.similarity.VectorOps.dot($a, $b);
      |if (${ev.value}_r == null) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${ev.value}_r.doubleValue();
      |}
      |""".stripMargin)
  override def prettyName: String = "dot_product"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  def dot_product(a: Column, b: Column): Column =
    GraftShim.column(DotProduct(GraftShim.expression(a), GraftShim.expression(b)))
}
