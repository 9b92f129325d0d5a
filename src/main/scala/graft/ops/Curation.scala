package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end curation pass: dedup + quality + language composed into one
  * per-doc KEEP/DROP decision table — the last step of a training-data
  * pipeline (what actually gets fed to training). Mirrors the reference's
  * single-triage orchestration (MTBValidators.scala:650-743 assembles every
  * rule family before one verdict): one verdict per record from ALL signal
  * families, never per-family verdict tables a user must re-join.
  *
  * Decision semantics (first matching reason wins):
  *   drop_dup     — doc is an exact duplicate and not its group's keeper
  *                  (keeper = min doc_id of the content-hash group)
  *   drop_quality — fails the quality gate
  *   keep         — otherwise (pred_lang rides along for routing)
  *
  * Scale shape: the feature side is ONE corpus pass (a single projection
  * computes the content hash and every token-derived feature; the token
  * array is let-bound so it is tokenized exactly once per row — same
  * semantics as TextAnalysis.quality/langId, recomputed fused here rather
  * than joined, because Spark re-executes shared subplans per reference).
  * The keeper is aggregate-then-join, NOT a min-over-hash window: a window
  * colocates each hash's FULL membership on one task (a boilerplate doc
  * duplicated 10^8 times = one 10^8-row task), while
  * `groupBy(text_hash).agg(min)` combines map-side to one row per hash and
  * the join back is AQE-broadcastable (distinct-hash-sized) or
  * skew-splittable — same convention as Derive V30 / sample_quota.
  */
object Curation {

  /** documents + deterministic PII-bearing suffixes (the sandbox corpus has
    * none): every doc_id%10=0 row gains an email + IPv4 + phone, every
    * doc_id%10=5 row an email + IPv4 — keeping expected outputs
    * SQL-recomputable for the DuckDB oracle (same pattern as
    * Dedup.corpusWithNearDups). */
  def corpusWithPii(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      when(col("doc_id") % 10 === 0,
        concat(col("text"),
          lit(" contact bob.smith@example.com ip 10.77.3.204 tel 555-0142")))
        .when(col("doc_id") % 10 === 5,
          concat(col("text"), lit(" ann_lee@test.org from 192.168.0.13")))
        .otherwise(col("text")).as("text"))

  /** Patterns deliberately use only character classes + bounded quantifiers
    * so the Java (Spark) and RE2 (DuckDB oracle) regex dialects agree;
    * `[.]` instead of `\.` keeps them quoting-safe in both hosts. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]+"
  val ipPattern    = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
  val phonePattern = "[0-9]{3}-[0-9]{4}"

  /** PII detection + redaction — the scrub step of a training-data pipeline
    * (emails, IPv4 addresses, phone-shaped numbers). Pure row-local Column
    * algebra: counts come from the ORIGINAL text (so overlapping redactions
    * cannot hide each other), then a redaction cascade replaces
    * email -> ip -> phone with typed placeholder tags. Scan-parallel,
    * shuffle-free, codegen'd end to end. */
  def piiScrub(corpus: DataFrame): DataFrame =
    corpus.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailPattern), lit(0)))
        .as("n_emails"),
      size(regexp_extract_all(col("text"), lit(ipPattern), lit(0))).as("n_ips"),
      size(regexp_extract_all(col("text"), lit(phonePattern), lit(0)))
        .as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), emailPattern, "<EMAIL>"),
          ipPattern, "<IP>"),
        phonePattern, "<PHONE>").as("redacted"))
      .withColumn("pii_found",
        (col("n_emails") + col("n_ips") + col("n_phones") > 0).cast("int"))

  /** Benchmark decontamination (GPT-3 appx. C / Dolma style): flag corpus
    * docs sharing word n-grams with an evaluation set. Emits one row per
    * CONTAMINATED doc (doc_id, n_shingles, n_contam, contam ratio) — clean
    * docs pass through unflagged, like the dedup operators emit only pairs.
    *
    * Scale shape: the eval set is tiny, FIXED and bounded (benchmark
    * suites — the one genuinely broadcastable table in a dedup pipeline,
    * like Dolma's decontamination bloom filter), the corpus is not. Corpus
    * shingles are exploded ONCE and inner-joined to the distinct eval
    * shingle set, which is broadcast EXPLICITLY: the static planner's size
    * estimate under a Generate is garbage (observed: it chose to build the
    * corpus side), and the corpus must never be the build side at 10^12
    * docs. The corpus therefore never shuffles for the join; the per-doc
    * aggregate then combines map-side. The per-doc shingle count rides
    * through the explode (same zero-self-join trick as
    * Dedup.ngramJaccardPairs), so no second corpus reference exists. */
  def decontaminate(corpus: DataFrame, evalDocs: DataFrame,
                    minMatches: Int = 1): DataFrame = {
    val evalShingles = evalDocs
      .select(explode_outer(Dedup.shingles(col("text"))).as("s"))
      .where(col("s").isNotNull)
      .distinct()
    val docShingles = corpus
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n_shingles"),
        explode_outer(col("sh")).as("s"))
      .where(col("s").isNotNull)
    docShingles
      .join(broadcast(evalShingles), "s")
      // doc shingles are distinct per doc and the eval side is distinct, so
      // each joined row is one distinct contaminated shingle
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(count(lit(1)).cast("int").as("n_contam"))
      .where(col("n_contam") >= minMatches)
      .select(col("doc_id"), col("n_shingles"), col("n_contam"),
        round(col("n_contam").cast("double") / col("n_shingles"), 6)
          .as("contam_ratio"))
  }

  /** Bloom-filter decontamination — the Dolma-shape SCALE path for the
    * same contract as [[decontaminate]]: the eval set's distinct shingle
    * hashes fold into ONE serialized Bloom filter (Spark's native
    * mergeable BloomFilterAggregate; ~20 bits/item ≈ fpp 7e-5, a 2.5 MB
    * blob per 10^6 eval shingles), the blob ships to every task as a
    * literal, and contamination becomes a ROW-LOCAL HOF count over each
    * doc's shingle array — ZERO joins, zero corpus shuffle, one corpus
    * scan, where the exact variant explodes the corpus and regroups it
    * per doc. Bloom membership admits false POSITIVES only, so the
    * flagged set is a SUPERSET of the exact one (never misses real
    * contamination — the right direction for a drop-list; spec-asserted
    * along with an FP bound). Registered rows-only: the oracle harness
    * cannot reproduce Spark's internal bloom hash layout in SQL.
    *
    * Two driver actions on the EVAL side only (count to size the filter,
    * then the fold) — the eval set is the tiny fixed benchmark suite, as
    * in [[decontaminate]]. */
  def decontaminateBloom(corpus: DataFrame, evalDocs: DataFrame,
                         minMatches: Int = 1, bitsPerItem: Long = 20L): DataFrame = {
    val evalHashes = evalDocs
      .select(explode_outer(Dedup.shingles(col("text"))).as("s"))
      .where(col("s").isNotNull)
      .select(xxhash64(col("s")).as("h")).distinct()
    val nItems = evalHashes.count()
    require(nItems > 0, "decontaminateBloom: empty eval set")
    val blob = evalHashes
      .select(graft.functions.BloomExprs
        .bloomAgg(col("h"), nItems, nItems * bitsPerItem).as("b"))
      .head().getAs[Array[Byte]](0)
    corpus
      .select(col("doc_id"),
        graft.functions.BloomContamCount(col("text"), blob).as("r"))
      .select(col("doc_id"), col("r.n_shingles").as("n_shingles"),
        col("r.n_contam").as("n_contam"))
      .where(col("n_contam") >= minMatches)
      .select(col("doc_id"), col("n_shingles"), col("n_contam"),
        round(col("n_contam").cast("double") / col("n_shingles"), 6)
          .as("contam_ratio"))
  }

  /** Classifier-based quality filtering (the DCLM / fineweb-edu shape):
    * cheap structural heuristics provide WEAK LABELS, a logistic regression
    * learns a smooth quality score from row-local features, and the score —
    * not the brittle hand rule — gates the corpus. At 10^12 docs the train
    * set is a tiny deterministic sample (here doc_id%3=0), the model is
    * O(features) on the driver, and scoring is a broadcast-coefficients
    * row-local map (MLlib transform), so the scoring pass is scan-parallel
    * with no shuffle.
    *
    * Training is float-order-dependent (LBFGS partial aggregation), so the
    * query is registered rows-only; the spec asserts held-out agreement
    * with the weak labels instead. */
  def qualityClassifier(documents: DataFrame): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    // ALL features + the weak label from ONE let-bound tokenization in ONE
    // projection (a quality ⋈ gopherQuality join on doc_id would tokenize
    // the corpus twice and add two full-corpus shuffles for features that
    // are all row-local) — the whole pipeline below the driver-side fit is
    // a single scan-parallel pass with no shuffle.
    // Weak label: the Gopher composite gate (label-balanced on this corpus,
    // where quality_ok is degenerate-positive); the LR learns a smooth
    // score from the raw ratios.
    val f = graft.util.Exprs.withLet(TextAnalysis.tokens(col("text"))) { t =>
      val nTok = size(t)
      val nAlpha = size(filter(t, w => w.rlike("[A-Za-z]")))
      val tokChars = aggregate(t, lit(0), (acc, w) => acc + length(w))
      struct(
        nTok.cast("double").as("n_tokens"),
        (tokChars.cast("double") / nTok).as("avg_token_len"),
        (size(filter(t, w => w.isin(TextAnalysis.allStop.map(lit): _*)))
          .cast("double") / nTok).as("stop_ratio"),
        (nAlpha.cast("double") / nTok).as("frac_alpha"),
        (size(filter(t, w => w.rlike("^[0-9]+$"))).cast("double") / nTok)
          .as("frac_numeric"),
        array_max(transform(t, w => length(w))).cast("double")
          .as("max_tok_len"),
        // the Gopher composite gate (identical to gopherQuality.gopher_ok)
        (nTok.between(20, 100000) &&
          (tokChars.cast("double") / nTok).between(2.0, 12.0) &&
          nAlpha * 5 >= nTok * 4).cast("double").as("label"))
    }
    val feat = documents
      .select(col("doc_id"),
        ((length(col("text")) - length(translate(col("text"), ".,", "")))
          .cast("double") / length(col("text"))).as("punct_ratio"),
        f.as("f"))
      .where(col("f.n_tokens") > 0)
      .select(col("doc_id"), col("f.label").as("label"), col("f.n_tokens"),
        col("f.avg_token_len"), col("f.stop_ratio"), col("punct_ratio"),
        col("f.frac_alpha"), col("f.frac_numeric"), col("f.max_tok_len"))
    // persisted: `assembled` is referenced by BOTH .fit (train subset) and
    // the scoring transform below — Spark re-executes shared subplans per
    // reference, so without the persist the corpus would be tokenized twice
    // (once for the LBFGS data passes + once for scoring). The cache holds
    // only the numeric feature projection (`feat` already pruned text),
    // stays consumer-lazy, and is reclaimed by the ContextCleaner once
    // unreferenced — at 10^12 docs this IS the feature-table artifact a
    // production run would persist via TableIO (or train on a written
    // sample) before fitting.
    val assembled = new VectorAssembler()
      .setInputCols(Array("n_tokens", "avg_token_len", "stop_ratio",
        "punct_ratio", "frac_alpha", "frac_numeric", "max_tok_len"))
      .setOutputCol("features").transform(feat)
      .persist()
    val model = new LogisticRegression().setMaxIter(20).setRegParam(0.01)
      .fit(assembled.where(col("doc_id") % 3 === 0))
    import org.apache.spark.ml.functions.vector_to_array
    model.transform(assembled)
      .select(col("doc_id"), col("label").cast("int").as("weak_label"),
        col("prediction").cast("int").as("pred_ok"),
        round(element_at(vector_to_array(col("probability")), 2), 6)
          .as("p_quality"))
  }

  /** Fused per-doc feature struct: quality gate + per-language stopword
    * hits from ONE let-bound tokenization per row (shared by the decision
    * tables — recomputed fused, never joined, because every feature is
    * row-local and Spark re-executes shared subplans per reference). */
  private def featureStruct: Column = {
    val langs = TextAnalysis.stopwords
    def hits(t: Column, words: Seq[String]): Column =
      size(filter(t, w => w.isin(words.map(lit): _*)))
    graft.util.Exprs.withLet(TextAnalysis.tokens(col("text"))) { t =>
      struct(
        // quality gate: token count in [5, 10000] and avg token length < 20
        (size(t).between(5, 10000) &&
          (aggregate(t, lit(0), (acc, w) => acc + length(w)).cast("double")
            / size(t) < 20.0)).cast("int").as("quality_ok") +:
          langs.map { case (l, ws) => hits(t, ws).as(s"s_$l") }: _*)
    }
  }

  /** argmax stopword hits over the feature struct `f`, ties broken by fixed
    * language order (identical to TextAnalysis.langId). */
  private def predLang: Column = {
    val langs = TextAnalysis.stopwords.map(_._1)
    langs.init.foldRight(lit(langs.last): Column) { (l, els) =>
      val geAll = langs.filter(_ != l)
        .map(o => col(s"f.s_$l") >= col(s"f.s_$o"))
        .reduce(_ && _)
      when(geAll, lit(l)).otherwise(els)
    }
  }

  def decisions(documents: DataFrame): DataFrame = {
    val corpus = Dedup.corpusWithExactDups(documents)
    val featured = corpus.select(
      col("doc_id"),
      md5(col("text").cast("binary")).as("text_hash"),
      featureStruct.as("f"))
    // keeper = aggregate-then-join (see object Scaladoc): the keeper side
    // re-reads the corpus through a HASH-ONLY projection (no tokenization —
    // the expensive features run once, in `featured`), combines map-side to
    // one row per hash, and joins back; AQE broadcasts the distinct-hash
    // side when it fits and skew-splits the probe otherwise — a hot hash
    // never serializes onto one task the way a window partition would.
    val keepers = corpus
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min(col("doc_id")).as("keeper"))
    featured
      .join(keepers, "text_hash")
      .select(col("doc_id"), predLang.as("pred_lang"),
        col("f.quality_ok").as("quality_ok"),
        (col("doc_id") === col("keeper")).as("dup_keep"),
        when(col("doc_id") =!= col("keeper"), lit("drop_dup"))
          .when(col("f.quality_ok") === 0, lit("drop_quality"))
          .otherwise(lit("keep")).as("decision"))
  }

  /** The near-dup-unified decision table — `decisions` with the MinHash+LSH
    * near-duplicate machinery wired into the verdict: one keep/drop row per
    * doc composed from cluster keepers (minhashLshPairs → dupClusters), the
    * quality gate, and language routing. This is the analog of the
    * reference's whole-record triage (every validator family feeds ONE
    * verdict, MTBValidators.scala:650-743) for the curation pipeline.
    *
    * Decision precedence: drop_neardup (doc belongs to a near-dup cluster
    * and is not its keeper — keeper = min doc_id reachable through the pair
    * graph, i.e. `cluster_id`) → drop_quality → keep.
    *
    * Scale shape: the pair graph + clusters are participant-scale (bounded
    * by the LSH candidate caps), so the final left join attaches cluster
    * ids with an AQE-broadcastable build side; the feature side stays one
    * fused corpus pass. */
  def decisionsNearDup(documents: DataFrame): DataFrame = {
    val corpus = Dedup.corpusWithNearDups(documents)
    val pairs = Dedup.minhashLshPairs(corpus)
      .select(col("doc_id_a"), col("doc_id_b"))
    val clusters = Dedup.dupClusters(pairs)
    val featured = corpus.select(col("doc_id"), featureStruct.as("f"))
    featured
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), predLang.as("pred_lang"),
        col("f.quality_ok").as("quality_ok"),
        coalesce(col("cluster_id") === col("doc_id"), lit(true)).as("dup_keep"),
        when(col("cluster_id").isNotNull && col("cluster_id") =!= col("doc_id"),
          lit("drop_neardup"))
          .when(col("f.quality_ok") === 0, lit("drop_quality"))
          .otherwise(lit("keep")).as("decision"))
  }

  /** The COMPLETE curation triage — every signal family the pipeline
    * computes, composed into one verdict per doc (the full analog of the
    * reference assembling ALL validator families before one record
    * verdict, MTBValidators.scala:650-743):
    *
    *   near-dup clusters (minhashLshPairs → dupClusters keepers)
    *   benchmark decontamination (eval-set shingle overlap)
    *   quality gate + language routing (fused row-local features)
    *   PII detection (flag rides along; redaction is pii_scrub's job)
    *
    * Precedence (first match wins): drop_neardup → drop_contaminated →
    * drop_quality → keep. The corpus carries BOTH deterministic
    * injections (near-dup copies + PII suffixes) so every family has
    * positives; the eval set is the RAW doc_id%97=0 documents — the
    * benchmark texts as published, not the injected corpus rows.
    *
    * Scale shape: three independent corpus passes (features; LSH banding;
    * shingle⋈eval) — the signal families are genuinely independent
    * aggregations, exactly like the reference's validators, and each pass
    * keeps its own documented 10^12 shape. The composition joins are all
    * participant-/flagged-scale left joins (AQE broadcast territory). */
  def decisionsFull(documents: DataFrame): DataFrame = {
    val corpus = corpusWithPii(
      Dedup.corpusWithNearDups(documents).select(col("doc_id"), col("text")))
    val pairs = Dedup.minhashLshPairs(corpus)
      .select(col("doc_id_a"), col("doc_id_b"))
    val clusters = Dedup.dupClusters(pairs)
    val contam = decontaminate(corpus, documents.where(col("doc_id") % 97 === 0))
      .select(col("doc_id"), col("n_contam"))
    val featured = corpus.select(col("doc_id"), featureStruct.as("f"),
      ((size(regexp_extract_all(col("text"), lit(emailPattern), lit(0))) +
        size(regexp_extract_all(col("text"), lit(ipPattern), lit(0))) +
        size(regexp_extract_all(col("text"), lit(phonePattern), lit(0)))) > 0)
        .cast("int").as("pii_found"))
    featured
      .join(clusters, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"), predLang.as("pred_lang"),
        col("f.quality_ok").as("quality_ok"),
        coalesce(col("cluster_id") === col("doc_id"), lit(true)).as("dup_keep"),
        col("n_contam").isNotNull.cast("int").as("contaminated"),
        col("pii_found"),
        when(col("cluster_id").isNotNull && col("cluster_id") =!= col("doc_id"),
          lit("drop_neardup"))
          .when(col("n_contam").isNotNull, lit("drop_contaminated"))
          .when(col("f.quality_ok") === 0, lit("drop_quality"))
          .otherwise(lit("keep")).as("decision"))
  }

  /** Source-level (domain-level) curation statistics — the RefinedWeb-style
    * "judge the domain, not just the page" pass: per source, doc/token
    * counts, quality-pass counts, exact-dup doc counts, and a `flagged`
    * verdict for sources whose quality-pass share falls below
    * `minQualityPct` (the blocklist a pipeline feeds back into its crawler).
    *
    * Integer-exact throughout: the quality gate is the integer skeleton of
    * TextAnalysis.quality (sum of token lengths < 20 x n_tokens instead of
    * a double average — same decision, no float division), and the flag
    * compares cross-multiplied integers. Token-length sum is
    * `length(translate(text, " ", ""))`: tokens are single-space splits, so
    * non-space length IS the summed token length — one string op instead of
    * an aggregate HOF over the token array.
    *
    * Scale shape: one corpus pass feeds two independent aggregations —
    * per-source rollup (nSources rows, map-side combine) and per-(source,
    * text_hash) dup counting (two-level aggregate, both combine map-side;
    * never a window over hash membership) — joined at nSources scale where
    * AQE broadcasts. */
  def sourceStats(documents: DataFrame, minQualityPct: Int = 60): DataFrame = {
    require(minQualityPct >= 0 && minQualityPct <= 100)
    val perDoc = documents.select(
      col("source"),
      md5(col("text").cast("binary")).as("text_hash"),
      size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"),
      length(translate(col("text"), " ", "")).cast("long").as("sum_tok_len"))
      .withColumn("quality_ok",
        (col("n_tokens").between(5, 10000)
          && col("sum_tok_len") < col("n_tokens") * 20L).cast("int"))
    val bySource = perDoc.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_tokens").as("sum_tokens"),
      sum("quality_ok").cast("long").as("n_quality_ok"))
    val dupBySource = perDoc
      .groupBy("source", "text_hash").agg(count(lit(1)).as("cnt"))
      .groupBy("source")
      .agg(sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("n_dup_docs"))
    bySource.join(dupBySource, Seq("source"))
      .withColumn("flagged",
        col("n_quality_ok") * 100 < col("n_docs") * minQualityPct)
  }
}
