package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Logical optimizer rule: rewrite a cartesian/inner join whose condition
  * contains a band predicate `abs(l - r) <= w` (w a positive numeric
  * literal; l from the left side, r from the right) into a bucketed
  * equi-join — the whole-operator tier (c) of SURVEY §7's custom-Catalyst
  * preference order, packaged so ANY user query with that shape gets the
  * O(rows) plan automatically instead of a cartesian product.
  *
  * Rewrite (the same construction as `graft.ops.Temporal.bandedRangeJoin`,
  * here applied under the optimizer so it also fires for spark.sql text):
  *   bucket_r = floor(r / w)          (one bucket per right row)
  *   bucket_l ∈ {floor(l/w)-2 .. floor(l/w)+2}             (probe explode)
  *   Join on bucket_l = bucket_r AND <original condition>
  * Any qualifying pair differs by ≤ w, so their buckets differ by ≤ 1 in
  * real arithmetic, ≤ 2 after double rounding at bucket boundaries — the
  * 5-bucket probe finds each pair exactly once (each right row has ONE
  * bucket), and the retained original condition removes false candidates.
  * The band predicate stays in the output condition, so the rule guards
  * against re-matching (idempotent under fixed-point batches) by skipping
  * joins that already carry the generated bucket column.
  *
  * Scale: turns an O(|L|·|R|) cartesian into a shuffle of 3|L| + |R| rows
  * on the bucket key. Skew note: a band much wider than the value spread
  * degenerates to few buckets — AQE skew-split applies; choose w near the
  * selectivity target.
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] {

  private val BucketL = "graft_band_bucket_l"
  private val BucketR = "graft_band_bucket_r"

  private def asPositiveWidth(e: Expression): Option[Double] = e match {
    case Literal(v, t) if t.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
      val d = v match {
        case x: java.lang.Number => x.doubleValue()
        case x: org.apache.spark.sql.types.Decimal => x.toDouble
        case _ => return None
      }
      if (d > 0 && java.lang.Double.isFinite(d)) Some(d) else None
    case _ => None
  }

  /** Split a conjunctive condition into its conjuncts. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  private def doubled(e: Expression): Expression =
    if (e.dataType == DoubleType) e else Cast(e, DoubleType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint)
        if !j.left.output.exists(_.name == BucketL) &&
          !j.right.output.exists(_.name == BucketR) =>
      val parts = conjuncts(cond)
      val band = parts.collectFirst {
        // abs(l - r) <= w, with each operand bound to exactly one side
        case p @ LessThanOrEqual(Abs(Subtract(a, b, _), _), wLit)
            if asPositiveWidth(wLit).isDefined &&
              a.references.nonEmpty && b.references.nonEmpty &&
              ((a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
                (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))) =>
          val (l, r) =
            if (a.references.subsetOf(left.outputSet)) (a, b) else (b, a)
          (p, l, r, asPositiveWidth(wLit).get)
      }
      band match {
        case None => j
        case Some((_, l, r, w)) =>
          val wLit = Literal(w, DoubleType)
          // right: one bucket per row
          val rBucket = Alias(Cast(Floor(Divide(doubled(r), wLit)), LongType), BucketR)()
          val newRight = Project(right.output :+ rBucket, right)
          // left: probe ±2 neighboring buckets via explode. ±1 is not
          // enough: both quotients are rounded doubles, so a qualifying
          // pair sitting exactly on a bucket boundary can land two
          // buckets apart after rounding; the retained original
          // predicate removes any false candidates the wider probe adds.
          val lBucketBase = Cast(Floor(Divide(doubled(l), wLit)), LongType)
          val probeArray = CreateArray(Seq(
            Subtract(lBucketBase, Literal(2L)),
            Subtract(lBucketBase, Literal(1L)),
            lBucketBase,
            Add(lBucketBase, Literal(1L)),
            Add(lBucketBase, Literal(2L))))
          val lBucketAttr = AttributeReference(BucketL, LongType, nullable = true)()
          val newLeft = Generate(
            Explode(probeArray),
            unrequiredChildIndex = Nil,
            outer = false,
            qualifier = None,
            generatorOutput = Seq(lBucketAttr),
            child = left)
          val newCond = And(EqualTo(lBucketAttr, rBucket.toAttribute), cond)
          Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
      }
  }
}
