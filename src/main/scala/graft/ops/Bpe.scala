package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Trained byte-pair-encoding tokenizer (Sennrich et al. 2016) — the op a
  * training-data pipeline actually budgets tokens with.
  *
  * Division of labor (the shape real BPE trainers use — subword-nmt,
  * HuggingFace tokenizers — with Spark supplying the corpus-scale halves):
  *
  *   1. CORPUS -> WORD-FREQUENCY TABLE: one distributed aggregate. The
  *      output is vocabulary-sized — ~10^6-10^7 entries at ANY corpus scale,
  *      because natural-language vocabulary grows sublinearly (Heaps' law)
  *      — i.e. driver-safe by construction, ~100s of MB at the extreme.
  *   2. MERGE LOOP: driver-side over the collected table, with INCREMENTAL
  *      pair-count maintenance (only words containing the merged pair are
  *      touched, via a pair->words inverted index) and a lazy-deletion
  *      max-heap for the argmax. A 50k-merge production run is 50k heap
  *      pops + bounded word rewrites — no Spark jobs at all. The previous
  *      formulation paid 2+ distributed jobs per merge (aggregate +
  *      limit(1).collect() + eager localCheckpoint): correct, but ~10^5
  *      sequential Spark jobs at real vocab sizes — the loop, not the data,
  *      was the scale-killer.
  *   3. ENCODE: distributed again. BPE encoding is a pure function of the
  *      WORD, so the trained vocabulary (word -> piece count) joins to the
  *      corpus token stream (many-to-one on word; hot words are AQE
  *      skew-join territory, same as TextAnalysis.tokenFreqStats) — no
  *      per-document merge replay.
  *
  * Out-of-vocabulary words (encoding a DIFFERENT corpus than the training
  * one) fall back to character count, the untrained-symbol floor.
  *
  * Determinism: the merge picked each round is (count DESC, a ASC, b ASC) —
  * a total order, so the merge sequence is reproducible across cluster
  * sizes and engines; BpeSpec cross-checks it against an independent
  * single-node reference implementation. Registered rows-only all the same:
  * the oracle harness cannot express an iterated argmax loop in one SQL
  * statement.
  */
object Bpe {

  /** The corpus word-frequency table with initial single-character symbol
    * arrays: (word, cnt, sym). */
  def wordTable(documents: DataFrame): DataFrame =
    documents
      .select(explode_outer(TextAnalysis.tokens(col("text"))).as("word"))
      .where(col("word").isNotNull)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("sym", filter(split(col("word"), ""), s => length(s) > 0))

  /** Greedy leftmost non-overlapping replacement of adjacent (a, b) by the
    * merged symbol — the same fold contract the old Catalyst expression
    * implemented, now a plain driver-side function. */
  private def applyMerge(sym: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var last: String = null
    sym.foreach { s =>
      if (last == a && s == b) { last = a + b }
      else { if (last != null) out += last; last = s }
    }
    if (last != null) out += last
    out.result()
  }

  /** In-memory merge-loop trainer over a (word, cnt) map. Exposed for the
    * spec; `train` wraps it with the Spark collect/parallelize halves.
    *
    * Incremental maintenance: `stats` holds live pair counts; `index` maps
    * each pair to the set of word ids that (possibly) contain it — an
    * over-approximation pruned lazily (a word is skipped if the merge no
    * longer applies). The argmax heap uses lazy deletion: a popped entry
    * whose count disagrees with `stats` re-pushes the live count instead of
    * selecting. Both are the standard subword-nmt bookkeeping.
    */
  private[graft] def trainInMemory(wordCounts: Seq[(String, Long)], nMerges: Int)
  : (Seq[(String, String)], Array[(String, Long, Vector[String])]) = {
    val words = wordCounts.map(_._1).toArray
    val cnts = wordCounts.map(_._2).toArray
    val syms = words.map(w => w.split("").filter(_.nonEmpty).toVector)

    val stats = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    val index = mutable.Map.empty[(String, String), mutable.Set[Int]]
    def pairsOf(sym: Vector[String]): Iterator[(String, String)] =
      if (sym.length < 2) Iterator.empty
      else sym.iterator.zip(sym.iterator.drop(1))
    var i = 0
    while (i < syms.length) {
      pairsOf(syms(i)).foreach { p =>
        stats(p) += cnts(i)
        index.getOrElseUpdate(p, mutable.Set.empty) += i
      }
      i += 1
    }

    // max-heap: count DESC, then a ASC, b ASC (reversed string compare makes
    // the lexicographically smaller pair the "greater" heap element)
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.fromLessThan { case ((n1, a1, b1), (n2, a2, b2)) =>
        if (n1 != n2) n1 < n2
        else if (a1 != a2) a1 > a2
        else b1 > b2
      }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)]
    stats.foreach { case ((a, b), n) => if (n >= 2) heap.enqueue((n, a, b)) }

    val merges = Seq.newBuilder[(String, String)]
    var made = 0
    var done = false
    while (!done && made < nMerges) {
      // pop until the top entry's count is live; stale entries re-push the
      // live count (lazy deletion — a decreased pair must not be lost)
      var picked: Option[(String, String)] = None
      while (picked.isEmpty && !done) {
        if (heap.isEmpty) done = true
        else {
          val (n, a, b) = heap.dequeue()
          val live = stats((a, b))
          if (live == n && n >= 2) picked = Some((a, b))
          else if (live >= 2) heap.enqueue((live, a, b))
          // live < 2: drop — never eligible again unless a future merge
          // re-raises it, which re-enqueues below
        }
      }
      picked.foreach { case (a, b) =>
        merges += ((a, b))
        made += 1
        val touched = mutable.Set.empty[(String, String)]
        index.getOrElse((a, b), mutable.Set.empty).toArray.foreach { w =>
          val old = syms(w)
          val nw = applyMerge(old, a, b)
          if (nw.length != old.length) { // the pair actually occurred
            pairsOf(old).foreach { p => stats(p) -= cnts(w); touched += p }
            pairsOf(nw).foreach { p =>
              stats(p) += cnts(w); touched += p
              index.getOrElseUpdate(p, mutable.Set.empty) += w
            }
            syms(w) = nw
          }
        }
        // re-enqueue live counts for every touched pair; stale heap entries
        // are handled by the lazy-deletion pop above. The merged pair itself
        // ends at count 0 and is never re-enqueued — unless a merge
        // genuinely re-created it, in which case it competes again, exactly
        // as the from-scratch recount of the reference implementation would
        // count it.
        touched.foreach { p =>
          val n = stats(p)
          if (n >= 2) heap.enqueue((n, p._1, p._2))
        }
      }
    }
    (merges.result(), words.indices.map(j => (words(j), cnts(j), syms(j))).toArray)
  }

  /** Train nMerges merges. Returns the ordered merge list and the final
    * trained vocabulary (word, cnt, sym) as a DataFrame. Stops early when
    * no pair occurs twice.
    *
    * One Spark job in, one parallelize out: the (word, cnt) collect is
    * vocabulary-sized (Heaps' law — see the object Scaladoc), the merge
    * loop never leaves the driver, and the returned vocabulary DataFrame is
    * the same participant-scale table the join-side encode consumes.
    */
  def train(documents: DataFrame, nMerges: Int): (Seq[(String, String)], DataFrame) = {
    val spark = documents.sparkSession
    val wc = wordTable(documents).select("word", "cnt")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1) // deterministic word order for the parallelized output
    val (merges, vocab) = trainInMemory(wc.toSeq, nMerges)
    import spark.implicits._
    val vocabDf = spark.createDataset(vocab.toSeq)
      .toDF("word", "cnt", "sym")
    (merges, vocabDf)
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
    * corpus. nMerges=1000 is past the point where the old per-merge-job
    * formulation stalled (each merge now costs heap pops + bounded word
    * rewrites on the driver, no jobs) while staying early-stop-bounded on
    * the sandbox corpus. */
  def trainedTokenCounts(documents: DataFrame, nMerges: Int = 1000): DataFrame = {
    val (_, vocab) = train(documents, nMerges)
    encodeCounts(documents, vocab)
  }
}
