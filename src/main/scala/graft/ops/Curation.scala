package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end curation pass: dedup + quality + language composed into one
  * per-doc KEEP/DROP decision table — the last step of a training-data
  * pipeline (what actually gets fed to training).
  *
  * Decision semantics (first matching reason wins):
  *   drop_dup     — doc is an exact duplicate and not its group's keeper
  *                  (keeper = min doc_id of the content-hash group)
  *   drop_quality — fails the quality gate
  *   keep         — otherwise (pred_lang rides along for routing)
  *
  * Scale shape: ONE corpus pass. A single projection computes the content
  * hash and every token-derived feature (the token array is let-bound so it
  * is tokenized exactly once per row — same semantics as
  * TextAnalysis.quality/langId, recomputed fused here rather than joined,
  * because Spark re-executes shared subplans per reference); the keeper is
  * a min-over-content-hash window (one shuffle, tiny per-hash groups — an
  * exact-dup cluster of any size reduces to one min).
  */
object Curation {

  def decisions(documents: DataFrame): DataFrame = {
    val corpus = Dedup.corpusWithExactDups(documents)
    val langs = TextAnalysis.stopwords

    def hits(t: Column, words: Seq[String]): Column =
      size(filter(t, w => w.isin(words.map(lit): _*)))

    val feat = graft.util.Exprs.withLet(TextAnalysis.tokens(col("text"))) { t =>
      struct(
        // quality gate: token count in [5, 10000] and avg token length < 20
        (size(t).between(5, 10000) &&
          (aggregate(t, lit(0), (acc, w) => acc + length(w)).cast("double")
            / size(t) < 20.0)).cast("int").as("quality_ok") +:
          langs.map { case (l, ws) => hits(t, ws).as(s"s_$l") }: _*)
    }
    val featured = corpus.select(
      col("doc_id"),
      md5(col("text").cast("binary")).as("text_hash"),
      feat.as("f"))

    // argmax stopword hits, ties broken by fixed language order (identical
    // to TextAnalysis.langId)
    val pred = langs.map(_._1).init.foldRight(lit(langs.last._1): Column) {
      (l, els) =>
        val geAll = langs.map(_._1).filter(_ != l)
          .map(o => col(s"f.s_$l") >= col(s"f.s_$o"))
          .reduce(_ && _)
        when(geAll, lit(l)).otherwise(els)
    }
    featured
      .withColumn("dup_keep",
        col("doc_id") === min("doc_id").over(Window.partitionBy("text_hash")))
      .select(col("doc_id"), pred.as("pred_lang"),
        col("f.quality_ok").as("quality_ok"), col("dup_keep"),
        when(!col("dup_keep"), lit("drop_dup"))
          .when(col("f.quality_ok") === 0, lit("drop_quality"))
          .otherwise(lit("keep")).as("decision"))
  }
}
