package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** The shared signal relations of a curation pipeline — SCALE.md's
  * "materialize the token/shingle relations once" lever, as a
  * first-class operator input.
  *
  * A naive pipeline calls each signal operator on the raw corpus:
  * language-ID tokenizes the text, quality tokenizes it again, the
  * 5-gram decontamination shingles tokenize it again, and the 3-gram
  * Jaccard dedup a fourth time — at 100 TB that is four full
  * scan+split passes over the dominant column. Here ONE corpus scan
  * builds the persisted `base` (id, text_hash, token array); the
  * positional token relation and every k-gram shingle relation derive
  * from it, so the text bytes are read and split exactly once.
  *
  * Tokenization is the engine-wide contract shared by
  * [[TextAnalysis.tokenTable]] and [[Dedup.shingleTable]]:
  * `split(lower(text), " ")`, empty tokens dropped AFTER position
  * assignment (ordering by the original positions — identical window
  * order, identical shingles).
  *
  * Lifecycle: `build` pins `base`; the caller MUST end its pipeline
  * with [[release]] (or [[CacheLifecycle.resolveAndRelease]] listing
  * `base`) — the same un-persist-on-completion contract every pinning
  * operator here follows.
  */
final case class CurationSignals(base: DataFrame, idCol: String) {

  /** Positional token relation (id, pos, tok), non-empty tokens. */
  def tokens: DataFrame = base
    .select(col(idCol), posexplode(col("toks")).as(Seq("pos", "tok")))
    .filter(col("tok") =!= "")

  /** Distinct k-gram shingle relation (id, sh) — bit-identical to
    * [[Dedup.shingleTable]] over the same text, but derived from the
    * shared token base instead of a fresh corpus tokenize.
    */
  def shingles(k: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val parts = col("tok") +: (1 until k).map(o => lead(col("tok"), o).over(w))
    tokens
      .select(col(idCol), concat_ws(" ", parts: _*).as("sh"),
        parts.last.isNotNull.as("full"))
      .filter(col("full"))
      .select(col(idCol), col("sh"))
      .dropDuplicates(idCol, "sh")
  }

  /** Materialize `result` and release the base pin. */
  def release(result: DataFrame): DataFrame =
    CacheLifecycle.resolveAndRelease(result, base)
}

object CurationSignals {

  /** One corpus scan: (id, md5(text), split(lower(text), " ")),
    * persisted for every downstream signal to share.
    */
  def build(docs: DataFrame, idCol: String, textCol: String): CurationSignals = {
    val base = docs
      .select(col(idCol), md5(col(textCol)).as("text_hash"),
        split(lower(col(textCol)), " ").as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CurationSignals(base, idCol)
  }
}
