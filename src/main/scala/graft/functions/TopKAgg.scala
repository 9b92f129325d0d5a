package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate for per-group top-k. */
case class ScoredId(score: Double, id: Long)

/** Exact top-k per group as a MERGEABLE aggregate.
  *
  * Why: `row_number().over(Window.partitionBy(q))` ships EVERY scored
  * candidate row to one reducer per query — at 10^12 candidates that
  * reducer receives the whole corpus (the same scale-killer class as a
  * full-corpus broadcast). As an Aggregator the k-bounded buffer combines
  * map-side, so the shuffle carries at most k rows per (partition, query):
  * O(partitions x k), independent of corpus size.
  *
  * Deterministic: buffers are kept sorted by (score DESC, id ASC) — the
  * exact ordering the window formulation used — so results are
  * bit-identical to the windowed top-k (oracle-gated in Verify) regardless
  * of partitioning or merge order.
  */
class TopKAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  // java.lang.Double.compare, not > / ==: Spark's sort order ranks NaN
  // greater than every double (a NaN-scored candidate would be row 1 under
  // row_number), and raw > treats NaN as never-before — diverging exactly
  // when a zero-norm vector yields 0/0 = NaN cosine. Double.compare also
  // orders -0.0 < 0.0, matching Spark.
  private def before(a: ScoredId, b: ScoredId): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] = {
    if (buf.size >= k && before(buf.last, x)) buf
    else {
      val i = buf.indexWhere(e => before(x, e)) match {
        case -1 => buf.size
        case j => j
      }
      // i == k only for an exact (score, id) duplicate of a full buffer's
      // last element (callers have unique ids, but stay safe): drop it
      if (i >= k) buf
      else (buf.take(i) :+ x) ++ buf.drop(i).take(k - i - 1)
    }
  }

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: ExpressionEncoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: ExpressionEncoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}

object TopKAgg {
  /** Column function: top_k(score, id) -> array<struct<score,id>> sorted
    * by (score DESC, id ASC), length <= k. */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAgg(k), ExpressionEncoder[ScoredId]())(score, id)
}
