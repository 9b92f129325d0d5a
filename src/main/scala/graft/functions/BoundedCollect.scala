package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bucket-member struct for the n-gram generator: (doc_id, shingle count). */
case class DocN(doc_id: Long, n: Int)

/** Bucket-member struct for the simhash generator: (doc_id, signature). */
case class DocSim(doc_id: Long, sim: Long)

/** Size-bounded `collect_list`: keeps the `cap` SMALLEST elements (sorted
  * ascending), as a mergeable typed Aggregator.
  *
  * Why: the bucketed candidate generators (minhash bands, shingle buckets,
  * simhash chunk buckets, cosine-LSH buckets) group members per bucket and
  * expand pairs row-locally. The pair-expansion kernels already CAP the
  * expansion deterministically (first `cap` members in sort order), but a
  * plain `collect_list` materializes the ENTIRE bucket membership in one
  * aggregation buffer first — a hot bucket (boilerplate shingle, a
  * million-fold exact-dup cluster, or simhash's ~n/256-member chunk
  * buckets) is an OOM at 10^9+ docs even though the downstream cap would
  * discard the overflow anyway. This aggregate bounds the BUFFER itself at
  * 2*cap elements: once full it compacts to the cap smallest, and merge is
  * order-independent (the cap-smallest-under-a-total-order function is
  * associative and commutative), so the result is bit-identical to
  * `slice(array_sort(collect_list(x)), 1, cap)` — the exact retention rule
  * of `util.Exprs.sortedPairs` / `functions.HammingPairs` — regardless of
  * partitioning or merge order.
  *
  * Same mergeable map-side-combine shape as TopKAgg: each map partition
  * contributes at most cap rows per bucket to the shuffle.
  */
class BoundedCollect[T](cap: Int)(implicit ord: Ordering[T],
                                  seqEnc: ExpressionEncoder[Seq[T]])
  extends Aggregator[T, Seq[T], Seq[T]] {

  require(cap > 0, "cap must be positive")

  private def compact(s: Seq[T]): Seq[T] = {
    val sorted = s.sorted
    if (sorted.length > cap) sorted.take(cap) else sorted
  }

  override def zero: Seq[T] = Vector.empty

  override def reduce(buf: Seq[T], x: T): Seq[T] = {
    val nb = buf :+ x
    if (nb.length >= 2 * cap) compact(nb) else nb
  }

  override def merge(a: Seq[T], b: Seq[T]): Seq[T] = {
    val m = a ++ b
    if (m.length >= 2 * cap) compact(m) else m
  }

  override def finish(buf: Seq[T]): Seq[T] = compact(buf)

  override def bufferEncoder: ExpressionEncoder[Seq[T]] = seqEnc
  override def outputEncoder: ExpressionEncoder[Seq[T]] = seqEnc
}

object BoundedCollect {
  implicit val docNOrd: Ordering[DocN] = Ordering.by(m => (m.doc_id, m.n))
  implicit val docSimOrd: Ordering[DocSim] = Ordering.by(m => (m.doc_id, m.sim))

  /** bounded_collect(id) -> array<bigint>, the cap smallest ids sorted. */
  def longs(cap: Int)(id: Column): Column =
    udaf(new BoundedCollect[Long](cap)(implicitly, ExpressionEncoder[Seq[Long]]()),
      ExpressionEncoder[Long]())(id)

  /** bounded_collect(doc_id, n) -> array<struct<doc_id,n>> sorted by doc_id. */
  def docN(cap: Int)(id: Column, n: Column): Column =
    udaf(new BoundedCollect[DocN](cap)(docNOrd, ExpressionEncoder[Seq[DocN]]()),
      ExpressionEncoder[DocN]())(id, n)

  /** bounded_collect(doc_id, sim) -> array<struct<doc_id,sim>> sorted by doc_id. */
  def docSim(cap: Int)(id: Column, sim: Column): Column =
    udaf(new BoundedCollect[DocSim](cap)(docSimOrd, ExpressionEncoder[Seq[DocSim]]()),
      ExpressionEncoder[DocSim]())(id, sim)

  /** bounded_collect(s) -> array<string>, the cap lexicographically-smallest
    * strings sorted ascending. Scala's Ordering[String] compares UTF-16 code
    * units; for the ASCII doc_id vocabulary this is identical to the
    * engine-portable binary UTF-8 order (DuckDB's default collation), which
    * the exemplar oracle relies on. */
  def strings(cap: Int)(s: Column): Column =
    udaf(new BoundedCollect[String](cap)(implicitly, ExpressionEncoder[Seq[String]]()),
      ExpressionEncoder[String]())(s)
}
