package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression helpers. */
object Exprs {

  /** SQL-level `let`: evaluate `e` exactly once per row and reuse it via a
    * lambda variable.
    *
    * Why: Catalyst has no common-subexpression elimination for interpreted
    * (non-codegen) expressions, and a single lexical reference inside a
    * higher-order-function lambda is re-evaluated on EVERY lambda iteration
    * after CollapseProject inlines it (one `col("mh")` inside a 32-band
    * `transform` = 32 full minhash recomputations per row — measured 355 s
    * vs 11 s at sf0.1). Binding the value as a one-element-array lambda
    * variable forces exactly-once evaluation while staying a pure,
    * deterministic Column expression.
    */
  def withLet(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), x => f(x)), 1)

  /** All unordered pairs (a < b) of an array's elements, as
    * array<struct<a,b>> in sorted order — the row-local pair expansion for
    * bucket-grouped candidate generation (callers guard size >= 2).
    *
    * `maxItems` is the skew guard for web scale: a pathological hot bucket
    * (e.g. a boilerplate shingle shared by millions of docs) would expand
    * quadratically; it is truncated deterministically to the first
    * maxItems sorted members instead. Measured sf0.1 maxima are far below
    * the cap for every caller (minhash bands 15, ngram shingle groups 27,
    * cosine-LSH buckets 190), so exact-oracle comparisons are unaffected;
    * simhash chunk buckets DO run hot (2.5k) and use the fused
    * functions.HammingPairs with its own larger cap instead. */
  def sortedPairs(items: Column, maxItems: Int = 1000): Column =
    withLet(slice(array_sort(items), 1, maxItems)) { s =>
      flatten(transform(sequence(lit(2), size(s)), i =>
        transform(sequence(lit(1), i - 1), j =>
          struct(element_at(s, j).as("a"), element_at(s, i).as("b")))))
    }
}
