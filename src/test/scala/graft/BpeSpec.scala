package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** Trained BPE: the distributed merge loop must reproduce an INDEPENDENT
  * single-node reference implementation (classic Sennrich get_stats /
  * merge_vocab over a plain Scala Map) merge-for-merge, the learned pieces
  * must round-trip to their words, and the encode pass must equal a
  * per-word recount. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def applyRef(sym: Vector[String], m: (String, String)): Vector[String] =
    sym.foldLeft(Vector.empty[String]) { (acc, s) =>
      if (acc.nonEmpty && acc.last == m._1 && s == m._2) acc.init :+ (m._1 + m._2)
      else acc :+ s
    }

  /** Reference trainer: pair counts weighted by word frequency, overlap
    * counting and greedy leftmost application exactly as classic BPE; the
    * merge picked is (count DESC, a ASC, b ASC) — the engine's total
    * order. */
  private def refTrain(wordCounts: Map[String, Long], nMerges: Int)
  : (Seq[(String, String)], Map[String, Vector[String]]) = {
    var vocab: Map[String, (Vector[String], Long)] =
      wordCounts.map { case (w, c) =>
        w -> (w.split("").filter(_.nonEmpty).toVector, c)
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < nMerges) {
      val stats = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      vocab.values.foreach { case (sym, c) =>
        sym.iterator.sliding(2).withPartial(false)
          .foreach(p => stats((p.head, p(1))) += c)
      }
      val eligible = stats.filter(_._2 >= 2)
      if (eligible.isEmpty) continue = false
      else {
        val best = eligible.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        vocab = vocab.map { case (w, (sym, c)) => w -> (applyRef(sym, best), c) }
      }
    }
    (merges.toSeq, vocab.map { case (w, (s, _)) => w -> s })
  }

  test("distributed merge loop == single-node reference; pieces round-trip; encode exact") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val nMerges = 12
    val (merges, vocab) = Bpe.train(docs, nMerges)
    assert(merges.nonEmpty)

    // independent word counts (same ' '-split contract as Dedup.tokens)
    val wc = docs.select("text").as[String].collect()
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (refMerges, refVocab) = refTrain(wc, nMerges)
    assert(merges == refMerges,
      s"merge sequences diverge:\n spark: $merges\n ref:   $refMerges")

    // learned pieces per word match the reference and concatenate back to
    // the word (encode(decode) round-trip)
    val got = vocab.select("word", "sym").as[(String, Seq[String])]
      .collect().toMap
    assert(got.keySet == refVocab.keySet)
    got.foreach { case (w, s) =>
      assert(s.mkString("") == w, s"pieces of '$w' must concatenate to it")
      assert(s.toVector == refVocab(w), s"pieces of '$w' diverge from reference")
    }

    // encode pass: per-doc piece totals equal a reference recount
    val counts = Bpe.encodeCounts(docs, vocab)
      .as[(Long, Int, Int)].collect().toMap2
    val refCounts = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) =>
        val ws = t.split(" ").filter(_.nonEmpty)
        id -> (ws.length, ws.map(w => refVocab(w).length).sum)
      }.toMap
    assert(counts == refCounts)
  }

  test("in-memory trainer == reference at deep merge counts (300), " +
    "including early stop") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val wc = docs.select("text").as[String].collect()
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = 300
    val (merges, vocab) = Bpe.trainInMemory(wc.toSeq.sortBy(_._1), n)
    val (refMerges, refVocab) = refTrain(wc, n)
    assert(merges == refMerges,
      s"deep merge sequences diverge at ${merges.zip(refMerges).indexWhere(p => p._1 != p._2)}")
    val got = vocab.map { case (w, _, s) => w -> s }.toMap
    assert(got == refVocab)
  }

  test("1000-merge train costs < 2x the 20-merge train (driver loop, " +
    "no per-merge Spark jobs)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def timeTrain(n: Int): Double = {
      val t0 = System.nanoTime()
      val (m, vocab) = Bpe.train(docs, n)
      vocab.write.format("noop").mode("overwrite").save()
      assert(m.nonEmpty)
      (System.nanoTime() - t0) / 1e9
    }
    timeTrain(20) // JIT/plan warmup, uncounted
    val t20 = (1 to 2).map(_ => timeTrain(20)).min
    val t1000 = (1 to 2).map(_ => timeTrain(1000)).min
    assert(t1000 < 2 * t20 + 1.0,
      f"1000 merges took $t1000%.2f s vs $t20%.2f s for 20 — the merge " +
        "loop is no longer amortized (per-merge Spark jobs reintroduced?)")
  }

  private implicit class Tup3Map(rows: Array[(Long, Int, Int)]) {
    def toMap2: Map[Long, (Int, Int)] =
      rows.map { case (a, b, c) => a -> (b, c) }.toMap
  }
}
