package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, IntegerType, LongType, ShortType}

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

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Exact floor(v / w) in long arithmetic — no double rounding, so the
    * bucket is exact for ANY long value (a nanosecond-epoch timestamp
    * divided by a sub-second width drifts in double beyond |q| ≈ 2^52,
    * which would silently drop qualifying pairs past the ±2 probe).
    * Overflow-free: the v < 0 branch uses the truncating-division identity
    * floor(v/w) = (v+1) div w − 1, never forming v − mod (which would
    * underflow near Long.MinValue under ANSI).
    */
  private def exactFloorDiv(v: Expression, w: Long): Expression = {
    val vl = if (v.dataType == LongType) v else Cast(v, LongType)
    val wl = Literal(w)
    CaseWhen(
      Seq((GreaterThanOrEqual(vl, Literal(0L)), IntegralDivide(vl, wl))),
      Some(Subtract(IntegralDivide(Add(vl, Literal(1L)), wl), Literal(1L))))
  }

  /** Clamp a bucket base into [Long.Min + probe, Long.Max − probe] so the
    * probe-array Add/Subtract can never overflow-throw under ANSI; buckets
    * at the clamp boundary keep full coverage because every real bucket
    * beyond the clamp saturates to the same extreme value.
    */
  private def clamped(base: Expression, probe: Int): Expression =
    Least(Seq(
      Greatest(Seq(base, Literal(Long.MinValue + probe))),
      Literal(Long.MaxValue - probe)))

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
          // Integral operands with a whole width get EXACT long bucketing
          // and need only a ±1 probe (real floor quotients of a qualifying
          // pair differ by ≤ 1). Fractional operands bucket in double with
          // a ±2 probe covering boundary rounding; beyond |v/w| ≈ 2^52 the
          // band predicate itself is below double resolution, so the
          // double path's drift bound is the predicate's own.
          val exact = isIntegral(l.dataType) && isIntegral(r.dataType) &&
            w >= 1 && w == math.floor(w) && w <= Long.MaxValue.toDouble
          val (lBase, rBucketExpr, probe) =
            if (exact)
              (exactFloorDiv(l, w.toLong), exactFloorDiv(r, w.toLong), 1)
            else {
              val wLit = Literal(w, DoubleType)
              (Cast(Floor(Divide(doubled(l), wLit)), LongType),
                Cast(Floor(Divide(doubled(r), wLit)), LongType), 2)
            }
          val rBucket = Alias(rBucketExpr, BucketR)()
          val newRight = Project(right.output :+ rBucket, right)
          val lBucketBase = clamped(lBase, probe)
          val probeArray = CreateArray((-probe to probe).map {
            case 0          => lBucketBase
            case d if d < 0 => Subtract(lBucketBase, Literal(-d.toLong))
            case d          => Add(lBucketBase, Literal(d.toLong))
          })
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
