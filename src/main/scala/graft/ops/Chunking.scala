package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking with overlap — the context-window step between a
  * raw corpus and sequence assembly: split each document into
  * fixed-size token windows advancing by `stride` (< size ⇒ adjacent
  * chunks share `size − stride` tokens, so no boundary-straddling span
  * is lost to the cut).
  *
  * Scale shape: tokenize → generate chunk starts as an in-row
  * `sequence` → `posexplode` — one narrow pass, no shuffle, no state;
  * output rows ≈ corpus tokens / stride. The per-row array is one
  * document's tokens (the same bound every tokenize step in graft
  * carries); chunk text re-materializes via `slice` + `array_join`,
  * all codegen'd built-ins.
  *
  * Determinism: chunk boundaries are pure arithmetic on the token
  * index — start positions 0, stride, 2·stride, … while start < n —
  * so any engine replays the exact cut from the same whitespace
  * tokenization.
  */
object Chunking {

  /** One row per (id, chunk): `chunk_id` (0-based), `n_toks` (≤ size;
    * the tail chunk may be short), and the chunk text. Documents with
    * no tokens produce no chunks.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size >= stride, s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks = filter(split(lower(col(textCol)), " "), t => t =!= "")
    df.select(col(idCol), toks.as("toks"))
      .filter(size_(col("toks")) > 0)
      .select(col(idCol), col("toks"),
        posexplode(sequence(lit(0), size_(col("toks")) - 1, lit(stride))))
      .select(col(idCol), col("pos").as("chunk_id"),
        slice(col("toks"), col("col") + 1, lit(size)).as("chunk_toks"))
      .select(col(idCol), col("chunk_id"),
        size_(col("chunk_toks")).cast("long").as("n_toks"),
        array_join(col("chunk_toks"), " ").as("chunk_text"))
  }

  // `size` the column function collides with the `size: Int` parameter
  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)
}
