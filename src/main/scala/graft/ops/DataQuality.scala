package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gates — the validation layer an ODS→lake
  * ingestion runs before publishing (the reference relies on implicit
  * schema casts; this makes the contract explicit and reportable), and
  * the corpus-hygiene checks an LLM-data pipeline runs per batch.
  *
  * All row-local rules (not-null, range, accepted-values) and the
  * uniqueness check evaluate in ONE aggregation pass over the table
  * (conditional counters are map-side combinable; the distinct count for
  * uniqueness rides the same shuffle). Referential rules are each one
  * anti-join against the dimension (broadcast when small). Output is a
  * tidy (check, n_violations) report, one row per rule.
  */
object DataQuality {

  sealed trait Rule { def name: String }

  /** Column must never be null. */
  final case class NotNull(column: String) extends Rule {
    def name = s"$column.not_null"
  }

  /** Key columns must be unique (violations = rows − distinct keys),
    * with `count(DISTINCT ...)` null semantics: rows where ANY key
    * column is null are excluded from the distinct count, so each one
    * counts as a violation — i.e. Unique implies NotNull on the keys
    * (SQL-standard, and what the DuckDB oracle computes). When null keys
    * are legitimate, use [[UniqueOrNull]] which counts only true
    * duplicates.
    */
  final case class Unique(columns: Seq[String]) extends Rule {
    def name = s"${columns.mkString("+")}.unique"
  }

  /** Exact duplicate count including null keys: violations = rows −
    * distinct keys where null is a value like any other (two (1, null)
    * rows = 1 violation; a single null-keyed row = 0). Rides the same
    * one-pass aggregation — the keys are wrapped in a struct, which is
    * itself never null, so nothing drops from the distinct count.
    */
  final case class UniqueOrNull(columns: Seq[String]) extends Rule {
    def name = s"${columns.mkString("+")}.unique_or_null"
  }

  /** Numeric column must lie in [lo, hi]; nulls don't violate (pair with
    * [[NotNull]] for that).
    */
  final case class RangeIn(column: String, lo: Double, hi: Double) extends Rule {
    def name = s"$column.range[$lo,$hi]"
  }

  /** Column value must be one of the accepted codes; nulls don't violate. */
  final case class Accepted(column: String, values: Seq[String]) extends Rule {
    def name = s"$column.accepted"
  }

  /** Every non-null value must exist in `dim(dimColumn)` (referential
    * integrity, NOT EXISTS semantics).
    */
  final case class ForeignKey(column: String, dim: DataFrame, dimColumn: String)
      extends Rule {
    def name = s"$column.fk_$dimColumn"
  }

  /** Publish gate: throws with the offending checks when any rule has
    * violations — the form an ingestion job calls before writing.
    */
  def assertClean(df: DataFrame, rules: Seq[Rule]): Unit = {
    val bad = report(df, rules)
      .filter(col("n_violations") > 0)
      .collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}")
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"data-quality gate failed: ${bad.mkString(", ")}")
  }

  /** Attach row-local rules to `df` as an [[org.apache.spark.sql.Observation]]:
    * violation counters are collected DURING whatever action the caller
    * runs next (typically the lake write) — auditing with zero extra
    * scans, the shape an ingest job wants at 100 TB. Returns the
    * instrumented frame and a thunk that yields (check → n_violations)
    * once the action has run.
    *
    * Row-local rules only ([[NotNull]]/[[RangeIn]]/[[Accepted]]):
    * uniqueness and referential rules need a shuffle/join and cannot
    * ride a write — run those via [[report]].
    */
  def observed(
      df: DataFrame,
      rules: Seq[Rule]): (DataFrame, () => Map[String, Long]) = {
    require(rules.nonEmpty, "no rules given")
    val rowLocal = rules.collect {
      case r @ NotNull(c) => r.name -> col(c).isNull
      case r @ RangeIn(c, lo, hi) =>
        r.name -> (col(c) < lit(lo) || col(c) > lit(hi))
      case r: Accepted =>
        r.name -> (col(r.column).isNotNull && !col(r.column).isin(r.values: _*))
    }
    require(rowLocal.size == rules.size,
      s"observed() takes row-local rules only; got ${rules.map(_.name)}")
    val counters = rowLocal.map { case (n, pred) =>
      coalesce(sum(when(pred, lit(1L)).otherwise(lit(0L))), lit(0L)).as(n)
    }
    val obs = org.apache.spark.sql.Observation()
    val instrumented = df.observe(obs, counters.head, counters.tail: _*)
    (instrumented,
      () => rowLocal.map { case (n, _) => n -> obs.get(n).asInstanceOf[Long] }.toMap)
  }

  /** Evaluate all rules; returns (check, n_violations) sorted by check. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    require(rules.nonEmpty, "no rules given")

    def counter(pred: Column): Column =
      coalesce(sum(when(pred, lit(1L)).otherwise(lit(0L))), lit(0L)) // empty table = clean

    val onePass: Seq[(String, Column)] = rules.collect {
      case r @ NotNull(c) => r.name -> counter(col(c).isNull)
      case r @ RangeIn(c, lo, hi) =>
        r.name -> counter(col(c) < lit(lo) || col(c) > lit(hi))
      case r @ Accepted(c, vs) =>
        r.name -> counter(col(c).isNotNull && !col(c).isin(vs: _*))
      case r @ Unique(cols) =>
        r.name -> (count(lit(1)) -
          countDistinct(col(cols.head), cols.tail.map(col): _*))
      case r @ UniqueOrNull(cols) =>
        r.name -> (count(lit(1)) -
          countDistinct(struct(cols.map(col): _*)))
    }
    val fks = rules.collect { case r: ForeignKey => r }

    val aggPart: Option[DataFrame] =
      if (onePass.isEmpty) None
      else {
        val aggCols = onePass.map { case (n, c) => c.cast("long").as(n) }
        val row = df.agg(aggCols.head, aggCols.tail: _*)
        // rule names contain dots — backtick-quote to stop the parser
        // treating them as struct-field access
        val pairs = onePass.flatMap { case (n, _) => Seq(lit(n), col(s"`$n`")) }
        Some(row.select(explode(map(pairs: _*)).as(Seq("check", "n_violations"))))
      }
    val fkParts: Seq[DataFrame] = fks.map { r =>
      // alias the dim key: fact and dim often share the column name,
      // which would make the join condition ambiguous
      df.select(col(r.column)).where(col(r.column).isNotNull)
        .join(r.dim.select(col(r.dimColumn).as("__dq_dim_key")),
          col(r.column) === col("__dq_dim_key"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(r.name).as("check"), col("n_violations"))
    }
    (aggPart.toSeq ++ fkParts)
      .reduce(_ unionByName _)
      .orderBy(col("check"))
  }
}
