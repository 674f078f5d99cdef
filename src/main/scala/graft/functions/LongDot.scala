package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Custom Catalyst expression: dot product of two long-array columns —
  * the hot inner loop of [[graft.ext.Similarity.semDedup]]'s witness
  * join (r22, guide step 4: no interpreted expressions in the hot path).
  *
  * Replaces `aggregate(zip_with(a, b, _ * _), 0L, _ + _)`, which is
  * interpreted per pair (two HOF lambdas, one allocated intermediate
  * array per row) for every candidate pair the bucket join emits.
  *
  * Arithmetic parity: plain left-to-right long multiply-accumulate,
  * identical to the HOF spelling's evaluation order. Callers must bound
  * magnitudes so the sum cannot overflow (semDedup's documented
  * dim ≤ 128 / |x| ≤ 1 envelope); inside that envelope the HOF and this
  * expression are value-identical, and LongDotSpec pins compiled ≡
  * interpreted ≡ the HOF spelling.
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_long_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |long $acc = 0L;
         |final int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}

object LongDot {
  def column(a: Column, b: Column): Column =
    ColumnBridge.column(LongDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
