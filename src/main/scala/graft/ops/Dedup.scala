package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash groupBy), n-gram Jaccard (grouped all-pairs), MinHash+LSH
  * (band-bucket join — the 100 TB path: candidate generation cost is
  * O(docs x bands), never O(docs^2)), and SimHash (bit-chunk bucketing).
  *
  * The sandbox corpus has no natural duplicates, so deterministic copies are
  * injected (doc_id % 50 = 0 -> +1_000_000 id), keeping expected outputs
  * SQL-recomputable for the DuckDB oracle.
  */
object Dedup {

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Distinct word 3-shingles; empty for docs shorter than 3 tokens.
    * (Guarded: Spark's `sequence(1, n)` runs DESCENDING for n < 1.) */
  def shingles(text: Column): Column = {
    val t = tokens(text)
    array_distinct(
      when(size(t) >= 3,
        transform(sequence(lit(1), size(t) - 2), i =>
          concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
        .otherwise(array().cast("array<string>")))
  }

  /** documents + exact copies of every doc_id%50=0 row (id offset 1M). */
  def corpusWithExactDups(documents: DataFrame): DataFrame = {
    val base = documents.select(col("doc_id"), col("text"))
    base.unionAll(
      documents.where(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
  }

  /** documents + near-duplicate copies (4-token suffix appended). */
  def corpusWithNearDups(documents: DataFrame): DataFrame = {
    val base = documents.select(col("doc_id"), col("text"), col("lang"), col("source"))
    base.unionAll(
      documents.where(col("doc_id") % 50 === 0)
        .select(
          (col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" near dup copy tail")).as("text"),
          col("lang"), col("source")))
  }

  /** Exact dedup: group by content hash; one shuffle with map-side combine.
    * Output: (text_hash, cnt, min_doc_id) for groups with >1 member. */
  def exactDuplicates(corpus: DataFrame): DataFrame =
    corpus
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("min_doc_id"))
      .where(col("cnt") > 1)

  private def pairStats(aSh: Column, bSh: Column): Seq[Column] = {
    val inter = size(array_intersect(aSh, bSh))
    Seq(inter.as("n_inter"), (size(aSh) + size(bSh) - inter).as("n_union"))
  }

  /** Exact n-gram Jaccard within (lang, source) groups — all-pairs inside a
    * group, so only usable when groups are bounded; LSH below is the
    * unbounded-scale path. Keeps counts integral (n_inter/n_union) so the
    * oracle compare is exact. Threshold: jaccard >= 0.6. */
  def ngramJaccardPairs(corpus: DataFrame): DataFrame = {
    val sh = corpus
      .select(col("doc_id"), col("lang"), col("source"), shingles(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
    val a = sh.alias("a")
    val b = sh.alias("b")
    a.join(b,
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_id_a") +: col("b.doc_id").as("doc_id_b") +:
          pairStats(col("a.sh"), col("b.sh")): _*)
      .where(col("n_inter") * 10 >= col("n_union") * 6)
  }

  /** MinHash + banded LSH near-dup detection, exact-Jaccard verified.
    *
    * numHashes minhash values per doc (xxhash64 seeded by permutation
    * index, computed row-locally over the shingle array — no explode),
    * banded into numHashes/rowsPerBand signatures; docs sharing any band
    * bucket become candidates (equi-join on (band, sig) — shuffle keyed by
    * signature, never all-pairs); candidates are verified with exact
    * Jaccard >= 0.6 so false positives drop out.
    *
    * rowsPerBand=2 over 64 hashes -> 32 bands: P(miss) at s=0.7 is
    * (1-0.49)^32 ~ 4e-10 — effectively exhaustive at the verify threshold.
    */
  def minhashLshPairs(corpus: DataFrame, numHashes: Int = 64,
                      rowsPerBand: Int = 2): DataFrame = {
    val nBands = numHashes / rowsPerBand
    val sh = corpus
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
    val mh = sh.withColumn("mh",
      transform(sequence(lit(0), lit(numHashes - 1)), i =>
        array_min(transform(col("sh"), s => xxhash64(i, s)))))
    val banded = mh.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(nBands - 1)), b =>
        struct(
          b.as("band"),
          array_join(
            transform(slice(col("mh"), b * rowsPerBand + 1, lit(rowsPerBand)),
              x => x.cast("string")), "_").as("sig")))).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val l = banded.alias("l")
    val r = banded.alias("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_id_a"), col("r.doc_id").as("doc_id_b"))
      .distinct()
    val a = sh.select(col("doc_id").as("doc_id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_id_b"), col("sh").as("sh_b"))
    candidates.join(a, "doc_id_a").join(b, "doc_id_b")
      .select(
        col("doc_id_a") +: col("doc_id_b") +:
          pairStats(col("sh_a"), col("sh_b")): _*)
      .where(col("n_inter") * 10 >= col("n_union") * 6)
  }

  /** SimHash near-dup pairs. 64-bit SimHash per doc from token hashes
    * (row-local HOF pipeline): bit j is set iff the sum of (+1/-1 for bit j
    * of xxhash64(token)) over all tokens is positive. Pairs are bucketed on
    * eight 8-bit chunks and verified with bit_count(xor) <= maxHamming; by
    * pigeonhole, any pair with Hamming <= 7 shares at least one chunk, so
    * for maxHamming <= 7 the result is EXACT (identical to all-pairs) while
    * the join stays keyed on chunk values — never O(docs^2). */
  /** 64-bit SimHash per doc (doc_id, sim): single pass over token hashes,
    * per-bit +-1 counts folded into a 64-slot array accumulator, then
    * counts -> bits. */
  def simhashes(corpus: DataFrame): DataFrame = {
    val masks = typedLit((0 until 64).map(1L << _))
    val bitCounts = aggregate(
      col("th"), array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, masks, (a, m) =>
        a + when(h.bitwiseAND(m) =!= 0, lit(1L)).otherwise(lit(-1L))))
    val simFromCounts = aggregate(
      zip_with(bitCounts, masks, (c, m) => when(c > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    corpus
      .select(col("doc_id"), transform(tokens(col("text")), t => xxhash64(t)).as("th"))
      .where(size(col("th")) > 0)
      .select(col("doc_id"), simFromCounts.as("sim"))
  }

  def simhashPairs(corpus: DataFrame, maxHamming: Int = 7): DataFrame = {
    val sims = simhashes(corpus)
    val chunkStructs = (0 until 8).map(ci =>
      struct(lit(ci).as("chunk"),
        shiftrightunsigned(col("sim"), ci * 8).bitwiseAND(lit(0xFFL)).as("cv")))
    val chunked = sims.select(
      col("doc_id"), col("sim"),
      explode(array(chunkStructs: _*)).as("ch"))
      .select(col("doc_id"), col("sim"), col("ch.chunk").as("chunk"), col("ch.cv").as("cv"))
    val l = chunked.alias("l")
    val r = chunked.alias("r")
    l.join(r,
        col("l.chunk") === col("r.chunk") && col("l.cv") === col("r.cv") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(
        col("l.doc_id").as("doc_id_a"), col("r.doc_id").as("doc_id_b"),
        bit_count(col("l.sim").bitwiseXOR(col("r.sim"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
