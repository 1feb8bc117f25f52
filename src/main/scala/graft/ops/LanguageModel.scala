package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.DataFrame

/** Corpus-trained n-gram language-model scoring — the perplexity-style
  * quality filter of the CCNet/Gopher/Llama lineage: score every
  * document by how surprising its token sequence is under a model
  * trained on the corpus itself, then gate or stratify on the score
  * (boilerplate and gibberish land in the tails; [[TextAnalysis
  * .tokenEntropy]] is the cheaper within-document proxy, this is the
  * cross-document one).
  *
  * Model: bigram with add-one (Laplace) smoothing, trained on the SAME
  * relation it scores — `p(w2|w1) = (c(w1,w2) + 1) / (c1(w1) + V)`
  * where `c1(w1) = Σ_w2 c(w1,w2)` (the history count, so the smoothed
  * conditional sums to 1 over the V-word vocabulary) and V is the
  * corpus distinct-token count. The score is the mean negative
  * log-likelihood over a document's bigrams, in nats — monotone in
  * pseudo-perplexity (`ppl = exp(nll)`), reported as nll so no
  * cross-engine `exp` is needed.
  *
  * Scale shape: the bigram relation is corpus-token-proportional and
  * built ONCE (pinned, then released via [[CacheLifecycle]]); model
  * counts are two grouped aggregates over it (map-side combined); the
  * scoring join keys bigrams on (w1, w2) — an equi-shuffle of
  * corpus-sized against vocabulary-sized relations, never a cross
  * product; V rides a 1-row broadcast. Per-doc means follow the BM25
  * determinism discipline: per-bigram contributions rounded to 9
  * decimals and summed as DECIMAL (exact, order-invariant), the mean
  * rounded to 6.
  */
object LanguageModel {

  /** (id, n_bigrams, nll): mean bigram negative log-likelihood per
    * document under the corpus-trained Laplace bigram model. Documents
    * with fewer than 2 tokens have no bigrams and are excluded (the
    * oracle's `len(w) >= 2` mirrors it).
    */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = filter(split(lower(col(textCol)), " "), x => x =!= "")
    val bg = docs
      .select(col(idCol), w.as("w"))
      .filter(size(col("w")) >= 2)
      .select(col(idCol), explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    // vocabulary over ALL tokens (doc-final ones included) — V is the
    // smoothing denominator's event count, not a history count
    val vocab = docs
      .select(explode(w).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val contrib = -log(
      (col("cb") + lit(1)).cast("double") /
        (col("c1") + col("v")).cast("double"))
    val scored = bg
      .join(cb.join(c1, "w1"), Seq("w1", "w2"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        round(contrib, 9).cast(DecimalType(28, 10)).as("c"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("c")).cast("double") /
          count(lit(1)).cast("double"), 6).as("nll"))
    CacheLifecycle.resolveAndRelease(scored, bg)
  }
}
