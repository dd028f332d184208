package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector arithmetic for the similarity family.
  *
  * The SQL spelling `aggregate(zip_with(a, b, (p,w) -> p*w), 0D,
  * (acc,z) -> acc+z)` evaluates through interpreted higher-order
  * functions: one zipped intermediate array per row pair, one boxed
  * lambda call per element, and no whole-stage codegen. At 100 TB of
  * candidate pairs the dot product IS the ANN scan's inner loop, so it
  * gets a first-class Catalyst expression with `doGenCode` — a fused
  * primitive loop over the two `ArrayData`, zero allocation.
  *
  * IEEE-754 parity with the oracle is preserved exactly: the generated
  * loop accumulates `acc += a(i) * b(i)` left-to-right — the identical
  * operation sequence as the `zip_with` + sequential-fold spelling both
  * engines agreed on, so results stay bit-identical and rank order
  * cannot drift.
  */
object Vec {
  /** `vec_dot(a, b)`: sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // type inferred: AbstractDataType is private[sql]
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => s"""
      int vdN = Math.min($x.numElements(), $y.numElements());
      double vdAcc = 0.0;
      for (int vdI = 0; vdI < vdN; vdI++) {
        vdAcc += $x.getDouble(vdI) * $y.getDouble(vdI);
      }
      ${ev.value} = vdAcc;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}
