package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Native sequential-fold dot product over float/double arrays (SURVEY
  * §2.11 custom-expression surface).
  *
  * Bit-identical to the declarative form it replaces —
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)` — including its
  * null semantics (length mismatch or any null element ⇒ null) and its
  * strict left-to-right double accumulation order, which is what keeps
  * every cosine reproducible against the DuckDB `list_sum` oracle. The
  * payoff is doGenCode: a tight primitive loop inside WholeStageCodegen
  * instead of the interpreted per-element lambda machinery of the
  * higher-order functions — the similarity operators spend nearly all
  * their time in this kernel (|corpus|×|planes| / |corpus|×|queries|
  * evaluations of 64-element folds).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  private def elem(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"dot_product requires ARRAY<FLOAT|DOUBLE> inputs, got ${l.simpleString} / ${r.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // null even for non-null inputs (length mismatch / null element)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (lt, rt) = (elem(left), elem(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      s += xi * yi
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def get(v: String, t: DataType) =
        if (t == FloatType) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ${get(a, elem(left))} * ${get(b, elem(right))};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Column-API entry point for [[DotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
