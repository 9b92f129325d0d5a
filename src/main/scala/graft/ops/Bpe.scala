package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained byte-pair-encoding tokenizer (Sennrich et al. 2016) — the op a
  * training-data pipeline actually budgets tokens with, distributed:
  *
  * Training runs on the WORD-FREQUENCY table, never the corpus: the corpus
  * collapses once into (word, cnt) rows (vocabulary-sized — ~10^6-10^7
  * entries at any corpus scale, because natural-language vocabulary grows
  * ~sublinearly in corpus size), and every merge round is one adjacent-pair
  * aggregate over that table (map-side combinable, output is
  * pair-vocabulary-sized) plus one row-local merge application. Per-round
  * persist keeps the lineage one round deep (same shape as
  * Dedup.dupClusters); the argmax is a TakeOrdered (bounded heap), and the
  * driver holds only the O(nMerges) merge list — never the vocabulary.
  *
  * Encoding exploits that BPE encoding is a pure function of the WORD: the
  * trained vocabulary table (word -> final symbol pieces) is joined to the
  * corpus token stream (many-to-one on word; hot words are AQE skew-join
  * territory, same as TextAnalysis.tokenFreqStats) — no per-document merge
  * replay. Out-of-vocabulary words (encoding a DIFFERENT corpus than the
  * training one) fall back to character count, the untrained-symbol floor.
  *
  * Determinism: the merge picked each round is (count DESC, a ASC, b ASC) —
  * a total order, so the merge sequence is reproducible across cluster
  * sizes and engines; the spec cross-checks it against an independent
  * single-node reference implementation. Registered rows-only all the same:
  * the oracle harness cannot express an iterated argmax loop in one SQL
  * statement.
  */
object Bpe {

  /** Adjacent symbol pairs of one round's symbol arrays, weighted by word
    * count. (sequence(1, n-1) guarded: it runs DESCENDING for n < 2.) */
  private def pairStats(vocab: DataFrame): DataFrame =
    vocab
      .select(col("cnt"), explode_outer(
        when(size(col("sym")) >= 2,
          transform(sequence(lit(1), size(col("sym")) - 1), i =>
            struct(element_at(col("sym"), i).as("a"),
              element_at(col("sym"), i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
      .where(col("p").isNotNull)
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("cnt").as("n"))

  /** Greedy leftmost non-overlapping replacement of adjacent (a, b) by the
    * merged symbol — one left fold per word, row-local. try_element_at:
    * element_at(-1) on the empty initial accumulator raises under ANSI. */
  private def applyMerge(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast("array<string>"), (acc, s) =>
      when(try_element_at(acc, lit(-1)) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** The corpus word-frequency table with initial single-character symbol
    * arrays: (word, cnt, sym). */
  def wordTable(documents: DataFrame): DataFrame =
    documents
      .select(explode_outer(TextAnalysis.tokens(col("text"))).as("word"))
      .where(col("word").isNotNull)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("sym", filter(split(col("word"), ""), s => length(s) > 0))

  /** Train nMerges merges. Returns the ordered merge list and the final
    * trained vocabulary (word, cnt, sym) — materialized in the block
    * manager (participant-scale; the ContextCleaner reclaims it once
    * unreferenced). Stops early when no pair occurs twice.
    *
    * Each round ends in `localCheckpoint(eager)` — NOT a plain persist:
    * persist caches the DATA but leaves the logical plan chained, and
    * after CollapseProject round r's analysis/codegen works on r nested
    * fold expressions — measured super-linear (29 s at 12 rounds, 96 s at
    * 16, heap-exhausted at 20 on the sandbox corpus). Checkpointing cuts
    * the lineage to the materialized RDD, making every round O(1) in plan
    * size (same motivation as dupClusters' per-round persist, one step
    * stronger because here the per-round EXPRESSION is expensive, not just
    * the join tree). localCheckpoint trades fault-tolerance for speed (an
    * executor loss forces a job restart); a production run over a
    * 10^7-word vocabulary uses reliable `checkpoint()` onto the job's
    * scratch storage — one tiny table per round. */
  def train(documents: DataFrame, nMerges: Int): (Seq[(String, String)], DataFrame) = {
    var vocab = wordTable(documents).localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (!done && round < nMerges) {
      val top = pairStats(vocab)
        .where(col("n") >= 2) // a single occurrence never merges usefully
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        merges += ((a, b))
        vocab = vocab
          .withColumn("sym", applyMerge(col("sym"), a, b))
          .localCheckpoint(true)
        round += 1
      }
    }
    (merges.result(), vocab)
  }

  /** Per-doc token budget from a trained vocabulary: join each document's
    * words to their learned piece counts. Unknown words (absent from the
    * training vocabulary) count one piece per character. */
  def encodeCounts(documents: DataFrame, vocab: DataFrame): DataFrame = {
    val pieces = vocab.select(col("word"), size(col("sym")).as("n_pieces"))
    documents
      .select(col("doc_id"), explode_outer(TextAnalysis.tokens(col("text"))).as("word"))
      .where(col("word").isNotNull)
      .join(pieces, Seq("word"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_ws_tokens"),
        sum(coalesce(col("n_pieces"), length(col("word")))).cast("int")
          .as("n_bpe_pieces"))
  }

  /** The registered end-to-end query: train on the corpus, encode the
    * corpus. */
  def trainedTokenCounts(documents: DataFrame, nMerges: Int = 20): DataFrame = {
    val (_, vocab) = train(documents, nMerges)
    encodeCounts(documents, vocab)
  }
}
