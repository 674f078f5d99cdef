package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: one BPE merge applied to a symbol array —
  * every adjacent (left, right) pair collapses to the concatenated
  * symbol, greedy left-to-right (after a merge consumes positions i,i+1
  * the scan resumes at i+2, exactly the reference BPE apply step; for
  * "a a a" merging (a,a) the result is ["aa","a"], never ["a","aa"]).
  *
  * Why a custom Expression (SURVEY §7 preference order (b)): the merge
  * has sequential dependence (whether position i merges depends on
  * whether i-1 did), which `transform`/`filter` HOFs cannot express and
  * a space-join + string-replace spelling gets WRONG on shared-boundary
  * repeats (the classic " a a a a " replace bug). A compiled per-row
  * walk is both correct and the fastest spelling; CodegenFallback keeps
  * surrounding operators in whole-stage codegen.
  */
case class BpeMergePair(child: Expression, left: String, right: String)
    extends UnaryExpression with CodegenFallback {

  require(left.nonEmpty && right.nonEmpty, "merge symbols must be non-empty")

  // null in -> null out; lets constraint inference push isnotnull to the
  // scan instead of re-evaluating the expression in a pushed filter
  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_merge"

  @transient private lazy val l = UTF8String.fromString(left)
  @transient private lazy val r = UTF8String.fromString(right)
  @transient private lazy val lr = UTF8String.fromString(left + right)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return arr
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (i + 1 < n && cur == l && arr.getUTF8String(i + 1) == r) {
        out.add(lr)
        i += 2
      } else {
        out.add(cur)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergePair =
    copy(child = newChild)
}

object BpeMergePair {
  def column(syms: Column, left: String, right: String): Column =
    ColumnBridge.column(BpeMergePair(ColumnBridge.expression(syms), left, right))
}
