package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus-trained n-gram language-model scoring — the perplexity-style
  * quality filter of the CCNet/Gopher/Llama lineage: score every
  * document by how surprising its token sequence is under a model
  * trained on a reference corpus, then gate or stratify on the score
  * (boilerplate and gibberish land in the tails; [[TextAnalysis
  * .tokenEntropy]] is the cheaper within-document proxy, this is the
  * cross-document one).
  *
  * Model: bigram with add-one (Laplace) smoothing —
  * `p(w2|w1) = (c(w1,w2) + 1) / (c1(w1) + V)` where
  * `c1(w1) = Σ_w2 c(w1,w2)` (the history count, so the smoothed
  * conditional sums to 1 over the V-word vocabulary) and V is the
  * TRAINING corpus distinct-token count. The score is the mean negative
  * log-likelihood over a document's bigrams, in nats — monotone in
  * pseudo-perplexity (`ppl = exp(nll)`), reported as nll so no
  * cross-engine `exp` is needed. Bigrams/histories UNSEEN in training
  * count as 0 (the left-join coalesce below) — that is what the +1/+V
  * smoothing exists for, and what makes scoring held-out data
  * well-defined.
  *
  * Two serving shapes:
  *  - [[bigramNll]]: train and score the SAME relation in one plan —
  *    the ad-hoc corpus-analysis form (judged as q131);
  *  - [[writeModel]] / [[scoreAgainst]]: train ONCE, persist the model
  *    as three tables (`cb`, `c1`, `vocab` — the stored-summaries shape
  *    of [[Dedup.ShingleIndex]]), score any later batch against the
  *    FROZEN counts — the production quality gate. Freezing is the
  *    semantically required maintenance contract (the same argument as
  *    [[IvfIndex.append]]'s frozen coarse quantizer): retraining per
  *    batch would silently re-score history — a document's quality
  *    score must not depend on what arrived after it.
  *
  * Scale shape: the bigram relation is corpus-token-proportional and
  * built ONCE per train/score side (pinned, then released via
  * [[CacheLifecycle]]); model counts are two grouped aggregates over it
  * (map-side combined); the scoring join keys bigrams on (w1, w2) — an
  * equi-shuffle of batch-sized against vocabulary-sized relations,
  * never a cross product; V rides a 1-row broadcast. Per-doc means
  * follow the BM25 determinism discipline: per-bigram contributions
  * rounded to 9 decimals and summed as DECIMAL (exact,
  * order-invariant), the mean rounded to 6.
  */
object LanguageModel {

  /** Whitespace tokens of `textCol`, lowercased, empties dropped —
    * the tokenizer every relation here shares.
    */
  private def words(textCol: String) =
    filter(split(lower(col(textCol)), " "), x => x =!= "")

  /** (id, w1, w2): one row per bigram occurrence. Documents with fewer
    * than 2 tokens have no bigrams and are excluded (the oracle's
    * `len(w) >= 2` mirrors it).
    */
  private def bigramTable(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol), words(textCol).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col(idCol), explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** The 1-row training-vocabulary count: V is the smoothing
    * denominator's event count over ALL tokens (doc-final ones
    * included), not a history count.
    */
  private def vocabCount(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(words(textCol)).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))

  /** The shared scoring tail: per-bigram Laplace contributions against
    * (cb, c1, vocab), folded to per-doc means. LEFT joins with
    * coalesce-to-0 so bigrams/histories unseen in training score at
    * the smoothed floor — for a self-trained corpus every count ≥ 1,
    * so this is exactly the inner-join semantics q131 pinned.
    */
  private def scoreBigrams(bg: DataFrame, cb: DataFrame, c1: DataFrame,
      vocab: DataFrame, idCol: String): DataFrame = {
    val contrib = -log(
      (coalesce(col("cb"), lit(0L)) + lit(1)).cast("double") /
        (coalesce(col("c1"), lit(0L)) + col("v")).cast("double"))
    bg
      .join(cb, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        round(contrib, 9).cast(DecimalType(28, 10)).as("c"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("c")).cast("double") /
          count(lit(1)).cast("double"), 6).as("nll"))
  }

  /** (id, n_bigrams, nll): mean bigram negative log-likelihood per
    * document under the corpus-trained Laplace bigram model — train
    * and score fused over one relation (the q131 form).
    */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = bigramTable(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val scored = scoreBigrams(bg, cb, c1, vocabCount(docs, textCol), idCol)
    CacheLifecycle.resolveAndRelease(scored, bg)
  }

  /** Train on `docs` and PERSIST the model under `path`: `cb/`
    * (w1, w2, cb), `c1/` (w1, c1), `vocab/` (v — 1 row), and `calib/`
    * (nll_med — 1 row: the 6-decimal-rounded exact median of the
    * training docs' SELF-scored nll, the gate threshold a production
    * filter calibrates on its own training distribution rather than
    * hard-coding; exact `percentile` ≡ DuckDB `quantile_cont` under
    * the round — the q96 median discipline). One tokenize of the
    * training corpus feeds the count tables AND the calibration pass
    * (pinned, then released); the stored relations are
    * vocabulary-proportional — at 100 TB of text that is the bigram
    * type table, not the corpus — plus two 1-row scalars.
    */
  def writeModel(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val mode = org.apache.spark.sql.SaveMode.Overwrite
    val bg = bigramTable(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val vocab = vocabCount(docs, textCol)
      cb.write.mode(mode).parquet(s"$path/cb")
      c1.write.mode(mode).parquet(s"$path/c1")
      vocab.coalesce(1).write.mode(mode).parquet(s"$path/vocab")
      scoreBigrams(bg, cb, c1, vocab, idCol)
        .agg(round(expr("percentile(nll, 0.5)"), 6).as("nll_med"))
        .coalesce(1).write.mode(mode).parquet(s"$path/calib")
    } finally { bg.unpersist(); () }
  }

  /** [[scoreAgainst]] plus the calibrated KEEP decision — the complete
    * quality gate: `kept = nll ≤ nll_med` against the threshold frozen
    * at training time (a batch's gate outcome can never depend on what
    * else arrived with it). The calibration rides a 1-row broadcast,
    * everything else is [[scoreAgainst]]'s cost.
    */
  def scoreGated(spark: SparkSession, modelPath: String, batch: DataFrame,
      idCol: String, textCol: String): DataFrame =
    scoreAgainst(spark, modelPath, batch, idCol, textCol)
      .crossJoin(broadcast(spark.read.parquet(s"$modelPath/calib")))
      .withColumn("kept", col("nll") <= col("nll_med"))
      .drop("nll_med")

  /** Score `batch` against the FROZEN model stored at `modelPath` —
    * the production quality gate: (id, n_bigrams, nll) with the exact
    * [[bigramNll]] arithmetic, unseen bigrams/histories at the Laplace
    * floor, V fixed at training time. Scoring cost is one tokenize of
    * the BATCH plus equi-joins against the stored count tables; the
    * model is never recomputed (`LanguageModelSpec` pins
    * train-on-A/score-on-A ≡ [[bigramNll]] and the held-out closed
    * form; q135 judges a held-out slice against the stored counts).
    */
  def scoreAgainst(spark: SparkSession, modelPath: String, batch: DataFrame,
      idCol: String, textCol: String): DataFrame =
    scoreBigrams(bigramTable(batch, idCol, textCol),
      spark.read.parquet(s"$modelPath/cb"),
      spark.read.parquet(s"$modelPath/c1"),
      spark.read.parquet(s"$modelPath/vocab"), idCol)

  // ------------------------------------------------- counts at rest (LSM)

  /** The INCREMENTAL at-rest form — the [[NaiveBayes.writeCountBatch]]
    * machinery ([[CountLsm]]) applied to the generative gate, because
    * the bigram model's sufficient statistics are additive counts
    * exactly like NB's: the stored model is an LSM of per-batch COUNT
    * DELTAS — `cb/bid=<batch>/` (w1, w2, cb) and `tc/bid=<batch>/`
    * (tok, n — per-token occurrence counts, the V relation) — summed
    * at read and smoothed by the same [[bigramNll]] arithmetic. The
    * history counts c1 are DERIVED at read (c1(w1) = Σ_w2 cb(w1,w2)),
    * so they need no relation of their own; V = |tokens with summed
    * n ≥ 1|, which shrinks under deletion exactly as a retrain's
    * would. What the frozen [[writeModel]] tables cannot give you:
    * folding a new corpus batch into a likelihood is not additive
    * (every smoothed conditional moves when c1 or V moves), folding it
    * into counts is.
    *
    * Crash safety (the [[graft.ops.Retrieval.appendToBm25Index]]
    * write-order discipline): bigram deltas land FIRST, token deltas
    * LAST — [[readCountTables]] admits only batches whose `tc`
    * partition exists (the commit marker), so a torn write is
    * invisible until its retry; each batch overwrites only its own
    * `bid=` partitions, and a batchId already FOLDED by
    * [[compactCountModel]] is refused via the [[CountLsm.foldedBids]]
    * ledger — the retry stays idempotent across a compaction.
    *
    * The calibration threshold ([[writeModel]]'s `calib/`) is NOT part
    * of the count store: a median is not an additive statistic — a
    * production gate recalibrates on an explicit training snapshot
    * (the freeze is the calibration contract), while the count store
    * serves the evolving SCORING model.
    */
  def writeCountBatch(docs: DataFrame, idCol: String, textCol: String,
      path: String, batchId: String): Unit =
    writeCountDeltas(docs, idCol, textCol, path, batchId, negate = false)

  /** UNLEARN a corpus batch — the q181 law for the generative gate:
    * the batch's counts are re-derived from the SAME docs and appended
    * NEGATED under their own `bid=` partitions, so the summed model
    * equals one trained without the batch EXACTLY — vocabulary and
    * history-count shrinkage included (a zeroed bigram exits cb, a
    * zeroed token exits V, precisely what a retrain would drop).
    */
  def deleteCountBatch(docs: DataFrame, idCol: String, textCol: String,
      path: String, batchId: String): Unit =
    writeCountDeltas(docs, idCol, textCol, path, batchId, negate = true)

  private def writeCountDeltas(docs: DataFrame, idCol: String,
      textCol: String, path: String, batchId: String,
      negate: Boolean): Unit = {
    require(batchId.matches("[A-Za-z0-9_-]+"),
      s"batchId '$batchId' must be a plain partition token")
    val spark = docs.sparkSession
    val root = CountLsm.healedRoot(spark, path)
    if (CountLsm.foldedBids(spark, root).contains(batchId)) return
    val sgn = if (negate) lit(-1L) else lit(1L)
    val cb = bigramTable(docs, idCol, textCol)
      .groupBy(col("w1"), col("w2"))
      .agg((count(lit(1)) * sgn).as("cb"))
    val tc = docs.select(explode(words(textCol)).as("tok"))
      .groupBy(col("tok"))
      .agg((count(lit(1)) * sgn).as("n"))
    val mode = org.apache.spark.sql.SaveMode.Overwrite
    cb.write.mode(mode).parquet(s"$root/cb/bid=$batchId")
    tc.write.mode(mode).parquet(s"$root/tc/bid=$batchId")
  }

  /** Sum the committed delta partitions into the (cb, c1, vocab)
    * relations [[scoreBigrams]] consumes — the identical smoothing
    * arithmetic, so a model assembled from any batch decomposition
    * equals the one-shot [[bigramNll]] model exactly. Only batches
    * whose `tc` partition landed are admitted (the commit marker);
    * folded bids are dropped read-side as belt-and-braces.
    */
  private def readCountTables(spark: SparkSession,
      path: String): (DataFrame, DataFrame, DataFrame) = {
    val root = CountLsm.healedRoot(spark, path)
    val folded = CountLsm.foldedBids(spark, root)
    val tc0 = CountLsm.dropFolded(CountLsm.readDeltas(spark, root, "tc"), folded)
    val committed = tc0.select(col("bid")).distinct()
    val cb = CountLsm.dropFolded(CountLsm.readDeltas(spark, root, "cb"), folded)
      .join(broadcast(committed), Seq("bid"), "left_semi")
      .groupBy(col("w1"), col("w2")).agg(sum(col("cb")).as("cb"))
      .filter(col("cb") >= 1)
    val c1 = cb.groupBy(col("w1")).agg(sum(col("cb")).as("c1"))
    val vocab = tc0.groupBy(col("tok")).agg(sum(col("n")).as("n"))
      .filter(col("n") >= 1)
      .agg(count(lit(1)).as("v"))
    (cb, c1, vocab)
  }

  /** Score `batch` against the count store's summed model — (id,
    * n_bigrams, nll) with [[bigramNll]]'s exact arithmetic. Scoring
    * the training corpus against its own fully-ingested store is
    * byte-identical to the one-shot [[bigramNll]] (where the counts
    * live cannot change a score); unseen bigrams/histories land at
    * the Laplace floor as in [[scoreAgainst]].
    */
  def scoreFromCounts(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val (cb, c1, vocab) = readCountTables(spark, path)
    scoreBigrams(bigramTable(batch, idCol, textCol), cb, c1, vocab, idCol)
  }

  /** Pin the count store's CURRENT batch set as snapshot `snapId` —
    * the reproducibility half of the gate's lifecycle ([[CountLsm
    * .writeSnapshot]]): a training run records which batches its
    * quality decisions were served from, and [[scoreAtSnapshot]]
    * replays those decisions bit-exactly after any later ingest,
    * unlearning or compaction. The `tc` relation is the commit marker
    * (the [[writeCountBatch]] write-order contract), so a torn batch
    * can never enter a manifest.
    */
  def snapshotCountModel(spark: SparkSession, path: String,
      snapId: String): Unit =
    CountLsm.writeSnapshot(spark, path, snapId, "tc")

  /** Score `batch` against the model AS OF snapshot `snapId` — the
    * summed counts over exactly the manifest's batches, assembled from
    * live and compaction-retired delta partitions ([[CountLsm
    * .deltasAtSnapshot]]), with [[bigramNll]]'s exact arithmetic.
    * Equal by construction to what [[scoreFromCounts]] returned when
    * the snapshot was written: where the counts live (live deltas,
    * retired deltas, either side of a compaction) cannot change a
    * score, and a vacuumed-away manifest bid fails loudly rather than
    * serving a partial model.
    */
  def scoreAtSnapshot(spark: SparkSession, path: String, snapId: String,
      batch: DataFrame, idCol: String, textCol: String): DataFrame = {
    val manifest = CountLsm.snapshotBids(spark, path, snapId)
    val cb = CountLsm.deltasAtSnapshot(spark, path, "cb", manifest)
      .groupBy(col("w1"), col("w2")).agg(sum(col("cb")).as("cb"))
      .filter(col("cb") >= 1)
    val c1 = cb.groupBy(col("w1")).agg(sum(col("cb")).as("c1"))
    val vocab = CountLsm.deltasAtSnapshot(spark, path, "tc", manifest)
      .groupBy(col("tok")).agg(sum(col("n")).as("n"))
      .filter(col("n") >= 1)
      .agg(count(lit(1)).as("v"))
    scoreBigrams(bigramTable(batch, idCol, textCol), cb, c1, vocab, idCol)
  }

  /** Fold every committed delta partition into one `bid=__compacted`
    * partition — the count store's OPTIMIZE ([[CountLsm.compactSwap]]):
    * serve-time reads stop growing with ingest cadence, the summed
    * counts are the numbers the pre-compaction read produced, and the
    * folded-bid ledger keeps post-compaction retries idempotent.
    *
    * Folded delta partitions are RETIRED (moved aside for
    * [[scoreAtSnapshot]] reproducibility), not destroyed — so the
    * PHYSICAL purge of unlearned data is compaction + [[CountLsm
    * .vacuumRetired]], and a takedown is fully physical only once no
    * live snapshot pins the takedown batch (drop those snapshots,
    * then vacuum — the versioned-store takedown discipline).
    */
  def compactCountModel(spark: SparkSession, path: String): Unit = {
    val root = CountLsm.healedRoot(spark, path)
    val priorFolded = CountLsm.foldedBids(spark, root)
    val tc0 = CountLsm.dropFolded(CountLsm.readDeltas(spark, root, "tc"), priorFolded)
    val committed = tc0.select(col("bid")).distinct()
    // zero-summed rows (ingested then unlearned) are physically dropped
    // here — compaction doubles as the unlearned data's purge
    val cb = CountLsm.dropFolded(CountLsm.readDeltas(spark, root, "cb"), priorFolded)
      .join(broadcast(committed), Seq("bid"), "left_semi")
      .groupBy(col("w1"), col("w2")).agg(sum(col("cb")).as("cb"))
      .filter(col("cb") =!= 0)
      .localCheckpoint()
    val tc = tc0.groupBy(col("tok")).agg(sum(col("n")).as("n"))
      .filter(col("n") =!= 0)
      .localCheckpoint()
    val foldedNow = (priorFolded ++
      committed.collect().map(_.getString(0)).filter(_ != "__compacted")).toSeq
    CountLsm.compactSwap(spark, path, root, foldedNow) { tmp =>
      cb.write.parquet(s"$tmp/cb/bid=__compacted")
      tc.write.parquet(s"$tmp/tc/bid=__compacted")
    }
  }
}
