package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine_sim"

  /** r22 (VERDICT r21 #5): real whole-stage codegen — the r21 expression
    * shipped as `CodegenFallback`, i.e. interpreted per row inside the
    * generated stage. The emitted loop is the same left-to-right
    * double accumulation as [[nullSafeEval]], so scores stay
    * bit-identical (CosineSimSpec pins compiled ≡ interpreted ≡ the
    * Scala reference).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |final int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xv = (double) $a.getFloat($i);
         |  final double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv;
         |  $na += $xv * $xv;
         |  $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

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
