package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** The shared mechanics of a COUNT-DELTA LSM at rest — the store shape
  * both trained curation models use ([[NaiveBayes]]'s label/token
  * counts, [[LanguageModel]]'s bigram/token counts), because both
  * models' sufficient statistics are ADDITIVE counts: ingest = append
  * a per-batch delta partition, unlearn = append the same counts
  * negated, serve = sum + smooth, OPTIMIZE = fold into one
  * `bid=__compacted` partition.
  *
  * What lives here is the lifecycle plumbing those stores share
  * verbatim, not the model arithmetic:
  *  - [[healedRoot]]: the `counts/` root, healing the one compaction
  *    crash window (live renamed aside, tmp not yet swapped in);
  *  - [[foldedBids]]: the ledger of batch ids ever folded into
  *    `__compacted`, so a crash-RETRY of an already-compacted batch is
  *    a no-op instead of a double count;
  *  - [[compactSwap]]: the atomic-as-one-rename-pair swap of a freshly
  *    folded `counts/` root, crash window healed by [[healedRoot]].
  */
private[ops] object CountLsm {

  /** The store's `counts/` root, healing the compaction crash window:
    * if `counts/` is missing but the renamed-aside `.counts_old`
    * survives (a crash between [[compactSwap]]'s two renames), restore
    * it — no committed batch is ever lost.
    */
  def healedRoot(spark: SparkSession, path: String): String = {
    import org.apache.hadoop.fs.Path
    val live = new Path(s"$path/counts")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(s"$path/.counts_old")
    if (!fs.exists(live) && fs.exists(old)) fs.rename(old, live)
    live.toString
  }

  /** The bids ever folded into `bid=__compacted` — persisted by
    * [[compactSwap]] with the compacted partition so write/delete
    * retries of a folded batchId stay no-ops. Driver-side by design:
    * one short string per batch ever compacted (ingest-cadence-
    * proportional, never data-proportional).
    */
  def foldedBids(spark: SparkSession, root: String): Set[String] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$root/folded")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else spark.read.parquet(p.toString).collect().map(_.getString(0)).toSet
  }

  /** Filter a partitioned delta relation down to NON-folded bids (the
    * belt-and-braces read-side guard: a bid= partition re-appended
    * after its counts were compacted reads as the compacted copy only).
    */
  def dropFolded(df: org.apache.spark.sql.DataFrame,
      folded: Set[String]): org.apache.spark.sql.DataFrame =
    df.filter(!col("bid").isin(folded.toSeq.map(x => x: Any): _*))

  /** Read a `bid=`-partitioned delta relation with the partition column
    * pinned back to STRING: batch ids are string tokens by contract,
    * but Spark's partition-type inference re-types an all-digit
    * directory name ("bid=2024") as int, which would break every
    * string-keyed ledger comparison and `getString` collect downstream.
    * Every store read goes through here so the bid column's type is a
    * property of the contract, not of which batch ids happen to exist.
    */
  def readDeltas(spark: SparkSession, root: String,
      sub: String): org.apache.spark.sql.DataFrame = {
    val df = spark.read.parquet(s"$root/$sub")
    df.withColumn("bid", col("bid").cast("string"))
  }

  /** The compaction swap: `writeTmp` populates a fresh root at `tmp`
    * (the caller writes its folded `bid=__compacted` relations there),
    * this persists the accumulated folded-bid ledger beside them, then
    * swaps live→old, tmp→live. The one crash window between the two
    * renames is healed by [[healedRoot]] on the next access.
    *
    * SINGLE-WRITER CONTRACT: the count stores assume one maintenance
    * writer at a time (the standard LSM discipline — ingest batches
    * may interleave with each other because each owns its `bid=`
    * partition, but compaction must not race an ingest: a
    * `writeCountBatch` interleaving with this swap could land its
    * delta partitions in the root being renamed aside while its commit
    * marker lands in the new root, leaving a marker with no counts).
    * The [[foldedBids]] ledger covers sequential retries only; run
    * compaction from the one scheduler that owns the store's
    * maintenance window, exactly as the BM25/ANN compactions are run.
    */
  def compactSwap(spark: SparkSession, path: String, root: String,
      foldedNow: Seq[String])(writeTmp: String => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(root)
    val tmp = new Path(s"$path/.counts_compact_tmp")
    val old = new Path(s"$path/.counts_old")
    fs.delete(tmp, true); fs.delete(old, true)
    writeTmp(tmp.toString)
    foldedNow.toDF("bid").coalesce(1).write.parquet(s"$tmp/folded")
    if (!fs.rename(live, old))
      throw new java.io.IOException(s"compactSwap: cannot move $live")
    if (!fs.rename(tmp, live)) {
      fs.rename(old, live)
      throw new java.io.IOException(s"compactSwap: cannot swap $tmp in")
    }
    fs.delete(old, true); ()
  }
}
