package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Custom Catalyst expression: cosine similarity of two float-array
  * columns, evaluated directly on Tungsten `ArrayData` (r21 optimization,
  * guide §1.2 step 2 / §4.1).
  *
  * Replaces the typed-Dataset spelling
  * `.as[(Long, Long, Array[Float], Array[Float])].map(cosine)` in the
  * ANN pair-scoring paths, whose `DeserializeToObject` /
  * `SerializeFromObject` pair copied BOTH embedding arrays out of
  * Tungsten rows into JVM objects (and back) for every candidate pair —
  * the hot inner loop of x41/x43 (millions of pairs per query at sf0.1).
  * Here the floats are read in place (`ArrayData.getFloat`), no per-pair
  * allocation.
  *
  * Arithmetic parity: identical accumulation order and types as
  * [[graft.ext.Similarity.cosine]] — one left-to-right pass accumulating
  * dot/na/nb in doubles, result `dot / (sqrt(na) * sqrt(nb))` — so
  * scores are BIT-IDENTICAL to the former spelling (zero-norm vectors
  * still yield NaN), pinned by an equivalence spec.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  def column(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
