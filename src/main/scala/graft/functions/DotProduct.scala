package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Double-precision dot product of two numeric arrays as a codegen'd
  * Catalyst expression — the innermost loop of similarity search.
  *
  * The higher-order formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * allocates an intermediate array per row and evaluates lambda closures
  * per element; this expression is one fused loop, in whole-stage codegen.
  * Summation is strictly left-to-right — IEEE-identical to the
  * higher-order version, so swapping it in cannot change oracle-checked
  * results by even an ulp.
  *
  * Elements are read as float or double according to each child's array
  * element type (embeddings are float32; literal hyperplanes are float64).
  * Inputs are assumed non-null-element arrays (embedding vectors).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def foldable: Boolean = left.foldable && right.foldable

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "dot_product expects two array<float|double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case other => throw new IllegalArgumentException(
        s"dot_product expects array<float|double>, got array<$other>")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    val n = x.numElements()
    if (y.numElements() != n) throw new IllegalArgumentException(
      s"dot_product: dimension mismatch ($n vs ${y.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val getX = if (elemIsFloat(left)) s"(double) $x.getFloat($i)"
                 else s"$x.getDouble($i)"
      val getY = if (elemIsFloat(right)) s"(double) $y.getFloat($i)"
                 else s"$y.getDouble($i)"
      s"""
         |double $acc = 0.0;
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "dot_product: dimension mismatch (" + $n + " vs " + $y.numElements() + ")");
         |}
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $getX * $getY;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point: `dot_product(a, b)`. */
  def dot_product(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(DotProduct(
      org.apache.spark.sql.graft.bridge.expression(a),
      org.apache.spark.sql.graft.bridge.expression(b)))
}
