package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) merge — the lakehouse upsert the
  * reference's ODS→datalake ingestion implies but spells as full
  * overwrites (its append writer keeps every run; SCD2 keeps every
  * VERSION with validity metadata). Engine extension, composed entirely
  * from one full-outer join + projections:
  *
  *   current (keys ++ attrs ++ eff_from/eff_to/is_current)
  *   changes (keys ++ attrs)
  *   →  history rows           (pass through untouched)
  *    ∪ open rows w/o change   (pass through)
  *    ∪ open rows w/ change    (closed: eff_to = effectiveDate)
  *    ∪ changed/new rows       (opened: eff_from = effectiveDate)
  *
  * Scale shape: ONE shuffle (the full-outer join on the key; AQE
  * broadcasts a small change batch), and the three output branches
  * project from the same joined exchange (Spark reuses it), so cost is
  * O(|open| + |changes|) regardless of history size — history never
  * enters the join. Attribute comparison is null-safe (`<=>`), so an
  * unchanged re-delivery of the same change batch is a no-op
  * (idempotent ingestion, the property retries at 100 TB need).
  *
  * Validity columns `eff_from`/`eff_to` are opaque STRING version labels
  * whose only contract is lexicographic monotonicity across merges —
  * typically `yyyy-MM-dd` dates (SURVEY §1.2: strings dodge tz semantics
  * by construction), or fixed-width batch tags from the streaming
  * ingester; `eff_to` is null on open rows.
  *
  * PRECONDITIONS (violating either fans out the full-outer join and
  * emits multiple closed copies / simultaneously-open versions per key):
  *  - `changes` carries AT MOST ONE row per key — collapse a raw change
  *    feed with [[latestWins]] first;
  *  - `current` has at most one `is_current` row per key (guaranteed by
  *    induction if every merge went through this function).
  */
object Scd {

  val MetaCols: Seq[String] = Seq("eff_from", "eff_to", "is_current")

  /** Collapse a raw change feed to one row per key — the highest
    * `orderBy` wins (pass `.desc` columns for latest-wins). Make the
    * ordering total (e.g. timestamp + a unique id) or the survivor among
    * ties is nondeterministic. One window over the key partition: the
    * same single shuffle the merge itself needs.
    */
  def latestWins(
      changes: DataFrame,
      keyCols: Seq[String],
      orderBy: Seq[org.apache.spark.sql.Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderBy: _*)
    changes
      .withColumn("__scd_rn", row_number().over(w))
      .where(col("__scd_rn") === 1)
      .drop("__scd_rn")
  }

  /** CDC apply (SCD type 1): collapse an I/U/D change feed to the table
    * state it produces — per key, the latest change wins (total order
    * from `orderBy`, pass `.desc` columns), and a latest `deleteOp`
    * removes the key entirely. Inserts and updates are deliberately not
    * distinguished (idempotent re-delivery and out-of-order feeds make
    * the I/U distinction unreliable; last-writer-wins is the standard
    * CDC-apply semantic). One window over the key partition — the same
    * single shuffle as [[latestWins]].
    *
    * Returns the surviving rows WITHOUT the op column. Apply to an
    * existing snapshot by unioning it in as updates with the oldest
    * order value.
    */
  def cdcApply(
      changes: DataFrame,
      keyCols: Seq[String],
      orderBy: Seq[org.apache.spark.sql.Column],
      opCol: String,
      deleteOp: String = "D"): DataFrame =
    latestWins(changes, keyCols, orderBy)
      // null-safe: a NULL op must read as "not a delete" (upsert) — the
      // plain =!= yields NULL and the filter would silently DELETE the key
      .where(!(col(opCol) <=> lit(deleteOp)))
      .drop(opCol)

  def scd2Merge(
      current: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      effectiveDate: String): DataFrame = {
    val attrCols = current.columns.toSeq
      .filterNot(c => keyCols.contains(c) || MetaCols.contains(c))
    require(
      changes.columns.toSet == (keyCols ++ attrCols).toSet,
      s"changes must carry exactly keys ++ attrs: expected " +
        s"${(keyCols ++ attrCols).toSet}, got ${changes.columns.toSet}")

    val open = current.filter(col("is_current")).withColumn("__has_open", lit(true))
    val hist = current.filter(!col("is_current"))
    val ch = changes.select(
      keyCols.map(col) ++ attrCols.map(c => col(c).as(s"__ch_$c")): _*)
      .withColumn("__has_ch", lit(true))

    val joined = open.join(ch, keyCols, "full_outer")
    // null-safe presence flags: after a full-outer join the absent side's
    // marker is null, and `null === true` is NULL (which a filter treats
    // as drop but `!` does NOT turn into true) — only `<=>` yields the
    // boolean the branch logic needs.
    val hasOpen = col("__has_open") <=> lit(true)
    val hasCh = col("__has_ch") <=> lit(true)
    val attrChanged = attrCols
      .map(c => !(col(c) <=> col(s"__ch_$c")))
      .reduceOption(_ || _)
      .getOrElse(lit(false))

    val outCols = keyCols ++ attrCols ++ MetaCols
    val keepOpen = joined
      .filter(hasOpen && (!hasCh || !attrChanged))
      .select(outCols.map(col): _*)
    val closedOld = joined
      .filter(hasOpen && hasCh && attrChanged)
      .select((keyCols ++ attrCols).map(col)
        ++ Seq(col("eff_from"), lit(effectiveDate).as("eff_to"),
          lit(false).as("is_current")): _*)
    val newOpen = joined
      .filter(hasCh && (!hasOpen || attrChanged))
      .select(keyCols.map(col)
        ++ attrCols.map(c => col(s"__ch_$c").as(c))
        ++ Seq(lit(effectiveDate).as("eff_from"),
          lit(null).cast("string").as("eff_to"),
          lit(true).as("is_current")): _*)

    hist.select(outCols.map(col): _*)
      .unionByName(keepOpen)
      .unionByName(closedOld)
      .unionByName(newOpen)
  }
}
