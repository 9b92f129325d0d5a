package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting operators for training-data curation.
  *
  * Everything here is a pure function of (doc_id, salt): reproducible
  * across runs, engines and cluster sizes, with no RNG state or sampling
  * seed to ship to executors — the property a 10^12-doc pipeline needs so
  * a re-run (or a resumed partition) assigns every document to the same
  * split/sample. Reference analog: the validation service's deterministic
  * per-record routing (every record keyed by its id, never by arrival
  * order); same idea applied to corpus curation.
  */
object Sampling {

  /** 32-bit deterministic hash of (doc_id, salt): the first 8 hex chars of
    * md5, as a long in [0, 2^32). md5 (not xxhash64) because every SQL
    * engine computes the identical digest — the split assignment is
    * portable, auditable truth, not an engine implementation detail. */
  def hashValue(docId: Column, salt: String): Column =
    conv(substring(md5(concat_ws(":", docId.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long")

  /** Basis-point bucket in [0, 10000) derived from [[hashValue]]. */
  def hashBucket(docId: Column, salt: String): Column =
    hashValue(docId, salt) % 10000

  /** Deterministic train/val/test split: bucket < trainBp -> train,
    * < trainBp+valBp -> val, else test. Row-local projection — no shuffle,
    * no sampling seed; scales as a pure map over the corpus scan. */
  def hashSplit(corpus: DataFrame, salt: String = "graft",
                trainBp: Int = 9000, valBp: Int = 500): DataFrame = {
    require(trainBp >= 0 && valBp >= 0 && trainBp + valBp <= 10000,
      "split weights are basis points summing to <= 10000")
    val b = hashBucket(col("doc_id"), salt)
    corpus.select(
      col("doc_id"),
      b.as("bucket"),
      when(b < trainBp, "train")
        .when(b < trainBp + valBp, "val")
        .otherwise("test").as("split"))
  }

  /** Per-stratum quota sample: the n docs with the SMALLEST deterministic
    * hash per stratum — a uniform-without-replacement sample of fixed size
    * per group (per-language quotas, per-source caps).
    *
    * Selection is the mergeable heap aggregate (functions.TopKAgg with
    * negated score), NOT `row_number().over(partitionBy(stratum))`: the
    * window would shuffle the ENTIRE corpus to one reducer per stratum
    * (a handful of languages = a handful of tasks holding 10^12 rows),
    * while the aggregate combines map-side and ships at most n rows per
    * (input partition, stratum). Ties (identical 32-bit hash) break on
    * doc_id ascending — bit-identical to ORDER BY (hash, doc_id). */
  def quotaPerStratum(corpus: DataFrame, stratum: Column, n: Int = 10,
                      salt: String = "graft"): DataFrame = {
    require(n > 0)
    // TopKAgg keeps the LARGEST scores; negate the hash to keep smallest.
    // A 32-bit value negated is exactly representable as a double.
    val score = -hashValue(col("doc_id"), salt).cast("double")
    corpus
      .groupBy(stratum.as("stratum"))
      .agg(graft.functions.TopKAgg.topK(n)(score, col("doc_id")).as("top"))
      .select(col("stratum"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("stratum"), (col("pos") + 1).cast("int").as("rank"),
        col("t.id").as("doc_id"))
  }

  /** Contiguous sequence packing (training-batch assembly): lay the corpus
    * out in doc_id order as one token stream and cut it into fixed
    * `capacity`-token bins; each doc gets (bin, bin_offset) of its first
    * token (a doc may straddle a bin boundary — standard contiguous
    * packing, the doc continues into the next bin).
    *
    * The global running token count is a DISTRIBUTED PREFIX SUM, not a
    * global window (`sum().over(orderBy(doc_id))` with no partition ships
    * the whole corpus to ONE task):
    *   1. block id = doc_id DIV blockSpan — a PURE FUNCTION of the key
    *     (deliberately not repartitionByRange + spark_partition_id: range
    *     boundaries come from sampling and a partition id is an execution
    *     artifact, and because Spark re-executes shared subplans, the two
    *     branches below would each re-derive them — a pure key function
    *     cannot disagree between branches);
    *   2. per-block running sum — a window partitioned by block, so each
    *     task sums only its own block (bounded by blockSpan);
    *   3. per-block totals (one row per block, map-side combined)
    *     prefix-summed on a driver-scale table and broadcast back.
    * Deterministic by construction — every value is a function of the data
    * alone; spec-asserted invariant across blockSpan choices. The corpus is
    * tokenized twice (totals pass + emit pass) — inherent to a two-phase
    * prefix sum without a pinned cache; at production scale persist the
    * (doc_id, n_tokens, blk) projection to trade memory for the re-scan.
    * At 10^12 docs pick blockSpan so blocks hold ~10^6-10^7 docs: the
    * offsets table stays ~10^5-10^6 rows (driver-scale) and each window
    * task sorts one block. */
  def packContiguous(corpus: DataFrame, capacity: Int = 512,
                     blockSpan: Long = 1L << 20): DataFrame = {
    require(capacity > 0 && blockSpan > 0)
    import org.apache.spark.sql.expressions.Window
    val toks = corpus
      .select(col("doc_id"), size(Dedup.tokens(col("text"))).as("n_tokens"),
        expr(s"doc_id DIV $blockSpan").as("blk"))
    val local = toks.withColumn("local_cum",
      sum("n_tokens").over(Window.partitionBy("blk").orderBy("doc_id")))
    // one row per block — driver-scale; the unpartitioned window runs over
    // corpusSize/blockSpan rows by construction, never the corpus
    val offsets = toks.groupBy("blk").agg(sum("n_tokens").as("btotal"))
      .withColumn("block_offset",
        coalesce(sum("btotal").over(
          Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("blk", "block_offset")
    local.join(broadcast(offsets), "blk")
      .select(col("doc_id"), col("n_tokens"),
        (col("block_offset") + col("local_cum") - col("n_tokens")).as("cum_before"))
      .select(col("doc_id"), col("n_tokens"),
        // integer division (DIV), not `/`: Column./ is DOUBLE division and
        // a 10^12-doc corpus's token count exceeds a double's 2^53 exact
        // integer range
        expr(s"cum_before DIV $capacity").as("bin"),
        (col("cum_before") % capacity).cast("int").as("bin_offset"))
  }

  /** Intra-document repetition removal (the Gopher-style curation signal):
    * keep each token's FIRST occurrence, report distinct/duplicate ratios.
    * Entirely row-local higher-order functions — no explode, no shuffle;
    * the first-occurrence filter is expressed as
    * `array_position(tokens, tok) == index` so the semantics are portable
    * SQL (the oracle recomputes it with list_position), unlike
    * array_distinct whose ordering is an engine detail. */
  def repetition(corpus: DataFrame): DataFrame = {
    val t = Dedup.tokens(col("text"))
    corpus
      .select(col("doc_id"), t.as("t"))
      .where(size(col("t")) > 0)
      .select(
        col("doc_id"),
        size(col("t")).as("n_tokens"),
        filter(col("t"), (tok, i) =>
          array_position(col("t"), tok) === (i + 1).cast("long")).as("kept"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        size(col("kept")).as("n_distinct"),
        round((col("n_tokens") - size(col("kept"))).cast("double") / col("n_tokens"), 6)
          .as("dup_ratio"),
        concat_ws(" ", col("kept")).as("text_dedup"))
  }

  /** Deterministic shard assignment: pmod of the salted md5 hash — a pure
    * row-local function of doc_id, so the same doc lands in the same shard
    * on any cluster size, re-run, or engine (unlike spark_partition_id /
    * round-robin, which are execution artifacts). */
  def shardOf(docId: Column, nShards: Int, salt: String = "shard"): Column =
    pmod(hashValue(docId, salt), lit(nShards.toLong)).cast("int")

  /** The manifest aggregate body, shared by [[shardManifest]] (shard
    * derived from the doc hash) and [[writeShards]] (shard read back from
    * the written partition column) so the two derivations cannot drift. */
  private def manifestOf(docs: DataFrame, shard: Column): DataFrame =
    docs
      .select(shard.cast("int").as("shard"), col("doc_id"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
        min("doc_id").as("min_doc_id"), max("doc_id").as("max_doc_id"))

  /** Training-shard manifest: per-shard doc/token counts and id bounds —
    * the audit table a shard writer publishes next to the data so a
    * training job can size its readers without listing files. One
    * map-side-combined aggregate to an nShards-row table; exact integers
    * throughout. */
  def shardManifest(corpus: DataFrame, nShards: Int = 16,
                    salt: String = "shard"): DataFrame =
    manifestOf(corpus, shardOf(col("doc_id"), nShards, salt))

  /** Write the corpus as `nShards` hash shards through the TableIO seam,
    * partitioned by shard — the final sink of the curation pipeline
    * (mixture-sampled docs land in fixed shards a trainer consumes with
    * partition pruning, one directory per shard). Returns the manifest it
    * also persists alongside (`<path>_manifest`).
    *
    * The write repartitions ON THE SHARD KEY first: without it every input
    * task opens a writer into every shard directory (tasks x shards small
    * files + that many commit operations — measured 5.9 s vs 1.3 s at
    * sf0.1 going 8 -> 32 cores on commit overhead alone, and at production
    * scale a 10^4-task x 10^3-shard write is 10^7 files). After the keyed
    * repartition each task holds whole shards, so the file count is
    * bounded by nShards (+hash-collision doubling), independent of read
    * parallelism.
    *
    * ONE input scan: the manifest is derived from the WRITTEN shard table
    * (the sink's read-back is compact, column-pruned to (shard, doc_id,
    * text), and exactly what the manifest must describe — auditing the
    * bytes on disk, not the plan that produced them), instead of
    * re-executing the upstream pipeline a second time. The write REPLACES
    * the whole table (TableIO.replaceTable, static overwrite), not just
    * the touched partitions: this is a full-corpus sink, and a dynamic
    * overwrite would let shard directories from a previous
    * differently-configured write (other nShards, other corpus) survive
    * into the read-back — and into the manifest that claims to audit the
    * table. PipelineOpsSpec asserts the returned manifest's plan scans the
    * shard path, that it equals [[shardManifest]] of the input, and that
    * re-sharding the same path with fewer shards leaves no stale
    * partitions behind. */
  def writeShards(corpus: DataFrame, path: String, nShards: Int = 16,
                  salt: String = "shard"): DataFrame = {
    graft.engine.TableIO.replaceTable(
      corpus.withColumn("shard", shardOf(col("doc_id"), nShards, salt))
        .repartition(nShards, col("shard")),
      path, Seq("shard"))
    val written = graft.engine.TableIO.read(corpus.sparkSession, path)
    val manifest = manifestOf(written, col("shard"))
    graft.engine.TableIO.write(manifest, s"${path}_manifest")
    manifest
  }

  /** Deterministic global training-order shuffle: every doc gets a dense
    * rank in [0, N) equal to its position under (salted-md5-hash, doc_id)
    * ordering — the reproducible permutation a trainer reads the corpus in
    * (T5/Dolma-style deterministic shuffling: same salt -> same order on
    * any cluster size, any engine; new salt -> fresh epoch permutation).
    *
    * Never a global sort-and-window: rank is assembled distributively,
    * same shape as [[packContiguous]]'s prefix sum —
    *   1. bucket = high bits of the 32-bit hash (pure function of the key,
    *      uniform by construction; 2^bucketBits buckets);
    *   2. within-bucket rank — a window partitioned by bucket, each task
    *      sorts ~N/2^bucketBits rows;
    *   3. bucket counts prefix-summed on a driver-scale table (the
    *      unpartitioned window runs over 2^bucketBits rows, never the
    *      corpus) and broadcast back: rank = bucket offset + local rank.
    * Bucketing by hash PREFIX means bucket order IS hash order, so the
    * assembly is exact. The corpus projection is referenced twice (ranks +
    * counts) — at production persist the (doc_id, hv) projection once via
    * TableIO, as with packContiguous. Pick bucketBits so a bucket holds
    * ~10^6-10^7 docs (at 10^12 docs: bits >= 17; hash collisions within a
    * bucket are tie-broken by doc_id, so ranks stay dense and unique). */
  def shuffleRank(corpus: DataFrame, salt: String = "shuffle",
                  bucketBits: Int = 12): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 31)
    import org.apache.spark.sql.expressions.Window
    val div = 1L << (32 - bucketBits)
    val keyed = corpus.select(col("doc_id"),
      hashValue(col("doc_id"), salt).as("hv"))
      .withColumn("bkt", expr(s"hv DIV $div"))
    val local = keyed.withColumn("local_rank",
      row_number().over(Window.partitionBy("bkt").orderBy("hv", "doc_id"))
        .cast("long") - 1L)
    val offsets = keyed.groupBy("bkt").agg(count(lit(1)).as("n"))
      .withColumn("bucket_offset",
        coalesce(sum("n").over(
          Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("bkt", "bucket_offset")
    local.join(broadcast(offsets), "bkt")
      .select(col("doc_id"),
        (col("bucket_offset") + col("local_rank")).as("rank"))
  }

  /** Corpus mixture resampling — the "data mixing" step that shapes a
    * training corpus to per-stratum TOKEN budgets (per-language /
    * per-source proportions), deterministically. Each stratum's keep rate
    * is the integer basis-point floor(budget*10000 / stratum_tokens),
    * clamped to 10000; a doc is kept iff its md5 basis-point bucket
    * ([[hashBucket]], salted) falls under the rate. Exact integer
    * arithmetic end to end (the `div` integral divide, exact past 2^53
    * where a double quotient is not) — the assignment is engine-portable
    * auditable truth, like [[hashSplit]]. Expected kept tokens per stratum
    * = budget up to hash-uniformity noise; identical decisions on any
    * cluster size or re-run.
    *
    * Scale shape: one map-side-combined aggregate to a STRATA-sized rate
    * table (driver-scale), joined back (AQE broadcasts it — never the
    * corpus side); the keep decision is row-local. The corpus is tokenized
    * twice (totals pass + decision pass) — same two-phase tradeoff as
    * [[packContiguous]], and same remedy at production scale: persist the
    * (doc_id, stratum, n_tokens) projection once via TableIO. */
  def sampleMixture(corpus: DataFrame, stratum: Column,
                    budgetTokens: Long = 5000,
                    salt: String = "mix"): DataFrame = {
    require(budgetTokens >= 0)
    def withTok = corpus.select(col("doc_id"), stratum.as("stratum"),
      size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"))
    val rates = withTok
      .groupBy("stratum")
      .agg(sum(col("n_tokens")).as("total_tokens"))
      .selectExpr("stratum",
        s"CAST(coalesce(least(10000L, (${budgetTokens}L * 10000L) div total_tokens), 10000L) AS INT) AS rate_bp")
    withTok
      .join(rates, "stratum")
      .select(col("doc_id"), col("stratum"),
        col("n_tokens").cast("int").as("n_tokens"), col("rate_bp"),
        (hashBucket(col("doc_id"), salt) < col("rate_bp")).as("keep"))
  }
}
