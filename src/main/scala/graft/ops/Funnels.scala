package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral event analytics: ordered funnels and cohort retention —
  * the two queries every event pipeline runs, expressed as compositions
  * of per-user aggregates and equi-joins (each stage is one map-side-
  * combinable min + one join on the user key; nothing is quadratic and
  * no window spans more than a user's own events).
  */
object Funnels {

  /** Ordered-funnel reach: a user reaches stage k when an event of type
    * `steps(k)` occurs STRICTLY AFTER their stage-(k-1) reach time
    * (reach time = earliest qualifying event). Returns one row per
    * stage: (stage 1-based, step, n_users). Monotone by construction.
    *
    * Scale shape: per stage, one filtered min-aggregate (partial agg on
    * the user key) joined back on the same key — the join reuses the
    * aggregation's hash partitioning, so the whole funnel is one shuffle
    * per stage over per-user rows (not per-event).
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame =
    funnelCore(events, userCol, typeCol, tsCol, steps, horizonHours = None)

  /** One implementation behind both funnel forms: each stage frame
    * carries (u, reach_t, t0) — t0 (the stage-1 anchor) only constrains
    * when a horizon is given.
    */
  private def funnelCore(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      horizonHours: Option[Int]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val reaches = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val candidates = events
          // an event with no timestamp cannot be ordered — ignore it
          // (keeps the staged and one-pass spellings identical on data
          // with null timestamps, where min() skipping nulls would
          // otherwise count a null-only user at stage 1)
          .filter(col(typeCol) === lit(step) && col(tsCol).isNotNull)
          .select(col(userCol).as("u"), col(tsCol).as("t"))
        Some(prev match {
          case None =>
            candidates.groupBy(col("u")).agg(min(col("t")).as("reach_t"))
              .withColumn("t0", col("reach_t"))
          case Some(p) =>
            val within = horizonHours
              .map(h => col("t") <= col("t0") + expr(s"INTERVAL $h HOURS"))
              .getOrElse(lit(true))
            candidates.join(p, Seq("u"))
              .where(col("t") > col("reach_t") && within)
              .groupBy(col("u"), col("t0")).agg(min(col("t")).as("reach_t"))
        })
    }.flatten
    reaches.zip(steps).zipWithIndex
      .map { case ((reach, step), i) =>
        reach.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("stage"), lit(step).as("step"), col("n_users"))
      }
      .reduce(_ unionByName _)
      .orderBy(col("stage"))
  }

  /** Horizon-bounded funnel: like [[funnel]], but every later stage must
    * ALSO land within `horizonHours` of the user's stage-1 reach time —
    * the conversion-window form analytics actually reports. The window
    * anchor (t0) rides along each stage's reach frame; plan shape is
    * unchanged (one per-user min + one user-key join per stage).
    */
  def funnelWithin(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      horizonHours: Int): DataFrame = {
    require(horizonHours >= 0, s"horizonHours must be >= 0, got $horizonHours")
    funnelCore(events, userCol, typeCol, tsCol, steps, Some(horizonHours))
  }

  /** One-pass funnel — the 100 TB shape: ONE scan of events (filtered to
    * the step types) and ONE shuffle (per-user sorted event list), then a
    * per-user greedy walk computes the earliest-reach chain
    * reach_k = min{ t of step k : t > reach_(k-1) [, t ≤ t0 + horizon] }
    * — the same recurrence the staged joins evaluate, so results are
    * identical (spec-pinned) while the multi-scan plan's #steps × scan
    * cost collapses. Per-user state is that user's own step events only.
    */
  def funnelOnePass(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      horizonHours: Option[Int] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // the greedy walk indexes steps by name, so a repeated step name has
    // no one-pass representation (the staged spelling handles it — use
    // funnel()/funnelWithin() for such funnels)
    require(steps.distinct.size == steps.size,
      s"funnelOnePass needs distinct step names, got $steps")
    val spark = events.sparkSession
    import spark.implicits._
    // Group on the key's STRING RENDERING, not a numeric cast: casting a
    // non-numeric id to long nulls every key and collapses all users into
    // one group. String rendering of the admitted types is injective
    // (distinct values render distinctly), so group identity — and
    // therefore every count — matches funnel()/funnelWithin(). Binary
    // keys are NOT admitted: invalid-UTF8 byte strings can collide under
    // the string cast.
    val keyOk = {
      import org.apache.spark.sql.types._
      events.schema(userCol).dataType match {
        case _: NumericType | _: StringType | _: BooleanType | _: DateType |
            _: TimestampType | _: TimestampNTZType => true
        case _ => false
      }
    }
    require(keyOk, s"funnelOnePass needs an atomic non-binary user key, got " +
      events.schema(userCol).dataType.catalogString)
    val stepIdx = steps.zipWithIndex.toMap
    val horizonMicros = horizonHours.map(_ * 3600L * 1000000L)
    val reached: DataFrame = events
      .filter(col(typeCol).isin(steps: _*) && col(tsCol).isNotNull)
      .select(col(userCol).cast("string").as("u"),
        col(tsCol).cast("timestamp").as("t"), col(typeCol).as("s"))
      .as[(String, java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .mapGroups { (u, evs) =>
        val sorted = evs.map { case (_, t, s) =>
          (t.getTime * 1000L + (t.getNanos / 1000) % 1000, stepIdx(s))
        }.toArray.sorted
        var cur = 0
        var prevReach = Long.MinValue
        var t0 = Long.MinValue
        sorted.foreach { case (t, s) =>
          if (cur < steps.size && s == cur &&
            (cur == 0 || t > prevReach) &&
            (cur == 0 || horizonMicros.forall(h => t <= t0 + h))) {
            if (cur == 0) t0 = t
            prevReach = t
            cur += 1
          }
        }
        // a NULL user key matches the staged spelling's behavior exactly:
        // groupBy counts the pooled null group at stage 1, but the
        // stage-2+ equi-joins (and any SQL oracle's joins) drop null
        // keys — clamp the null group's walk to stage 1
        (u, if (u == null) math.min(cur, 1) else cur)
      }
      .toDF("u", "reached")
    // Histogram the reach depth in ONE aggregation: a user at depth r
    // contributes to stages 1..r (explode of a ≤|steps| sequence), so the
    // expensive mapGroups pipeline is evaluated once — not once per stage
    // as a union of per-stage counts would. The stage-name frame is a
    // |steps|-row literal: broadcast equi-join, zero-filled for stages
    // nobody reached.
    val hist = reached
      .where(col("reached") >= lit(1))
      .select(explode(sequence(lit(1), col("reached"))).as("stage"))
      .groupBy(col("stage")).agg(count(lit(1)).as("reached_users"))
    steps.zipWithIndex.map { case (step, i) => (i + 1, step) }
      .toDF("stage", "step")
      .join(hist, Seq("stage"), "left")
      .select(col("stage"), col("step"),
        coalesce(col("reached_users"), lit(0L)).as("n_users"))
      .orderBy(col("stage"))
  }

  /** Cohort retention: users are cohorted by their first-activity date;
    * each (cohort_date, day_offset) cell counts distinct cohort members
    * active that day, for offsets in [0, maxDays]. One min-aggregate for
    * cohorts + one distinct (user, day) projection + one join on the
    * user key.
    */
  def retention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      maxDays: Int): DataFrame = {
    require(maxDays >= 0, s"maxDays must be >= 0, got $maxDays")
    val days = events.select(
      col(userCol).as("u"),
      to_date(col(tsCol)).as("day")).distinct()
    val cohorts = days.groupBy(col("u")).agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, Seq("u"))
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .where(col("day_offset") <= lit(maxDays))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users")) // (u, day) is distinct already
      .select(
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_date"),
        col("day_offset"), col("n_users"))
      .orderBy(col("cohort_date"), col("day_offset"))
  }
}
