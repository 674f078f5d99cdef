package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k-per-group aggregation (SURVEY §2.9: custom `Aggregator`
  * reserved for the extension layer).
  *
  * Why not `row_number().over(window) <= k`? A ranking window SORTS every
  * group's full contents after shuffling ALL rows — O(n log n) per group
  * and the whole input crosses the wire. This Aggregator keeps a k-bounded
  * sorted buffer and is map-side combinable: each partition reduces to at
  * most k rows per group BEFORE the shuffle, so the exchange carries
  * O(groups × k), not O(rows) — the difference between a top-3-per-order
  * over 100 TB finishing or not.
  *
  * Ordering: score desc, then (tieA, tieB) asc — a total order, so results
  * are deterministic and oracle-comparable.
  */
case class ScoredItem(score: Double, tieA: Long, tieB: Long)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredItem, Seq[ScoredItem], Seq[ScoredItem]] {

  require(k >= 1, s"k must be >= 1, got $k")

  private def lt(a: ScoredItem, b: ScoredItem): Boolean =
    a.score > b.score || (a.score == b.score &&
      (a.tieA < b.tieA || (a.tieA == b.tieA && a.tieB < b.tieB)))

  private def insert(buf: Seq[ScoredItem], x: ScoredItem): Seq[ScoredItem] = {
    if (buf.size == k && !lt(x, buf.last)) buf
    else ((buf :+ x).sortWith(lt)).take(k)
  }

  override def zero: Seq[ScoredItem] = Vector.empty

  override def reduce(buf: Seq[ScoredItem], x: ScoredItem): Seq[ScoredItem] =
    insert(buf, x)

  override def merge(a: Seq[ScoredItem], b: Seq[ScoredItem]): Seq[ScoredItem] =
    (a ++ b).sortWith(lt).take(k)

  override def finish(buf: Seq[ScoredItem]): Seq[ScoredItem] = buf

  override def bufferEncoder: Encoder[Seq[ScoredItem]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredItem]]()

  override def outputEncoder: Encoder[Seq[ScoredItem]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredItem]]()
}

object TopKAggregator {
  def apply(k: Int): TopKAggregator = new TopKAggregator(k)
}
