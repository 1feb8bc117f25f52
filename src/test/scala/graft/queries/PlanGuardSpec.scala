package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Pins the PHYSICAL-plan properties the scale story depends on — the
  * oracle proves results, but only the plan proves a query would
  * survive a 100× scale-up. Each assertion here is a property SCALE.md
  * claims and a regression would silently un-ship: dimension broadcasts
  * on the star join, filter pushdown reaching the parquet scan, column
  * pruning keeping fact scans narrow, and the broadcast (never
  * cartesian) shape of the knn query side.
  *
  * The assertions run on the INITIAL executed plan (AQE re-plans at
  * runtime, but pushdown/pruning/broadcast-hint decisions are visible
  * before execution).
  */
class PlanGuardSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q13 star join: dims broadcast, date filter pushed, fact scan pruned") {
    val p = planOf("q13_star_join")
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"the order-date filter must reach the orders parquet scan:\n$p")
    // the lineitem scan must read only the revenue columns — a scan line
    // mentioning l_extendedprice must not also read quantity/partkey
    val lineitemScan = p.linesIterator
      .find(l => l.contains("ReadSchema") && l.contains("l_extendedprice"))
    assert(lineitemScan.isDefined, s"no lineitem scan found:\n$p")
    assert(!lineitemScan.get.contains("l_quantity") && !lineitemScan.get.contains("l_partkey"),
      s"lineitem scan must be pruned to the 3 revenue columns:\n${lineitemScan.get}")
  }

  test("q01 projection: scan pruned to exactly the projected columns") {
    val p = planOf("q01_projection")
    val scan = p.linesIterator.find(_.contains("ReadSchema"))
    assert(scan.isDefined, p)
    val schema = scan.get.substring(scan.get.indexOf("ReadSchema"))
    Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
      .foreach(c => assert(schema.contains(c), s"$c missing from $schema"))
    Seq("l_partkey", "l_suppkey", "l_discount", "l_shipdate")
      .foreach(c => assert(!schema.contains(c), s"$c not pruned in $schema"))
  }

  test("q02 dim lookup: both dimension joins are broadcast hash joins") {
    val p = planOf("q02_dim_lookup")
    val n = "BroadcastHashJoin".r.findAllIn(p).length
    assert(n >= 2, s"expected 2 broadcast dim joins, found $n:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim lookups must not sort-merge:\n$p")
  }

  test("q26 knn: query side broadcast, never a cartesian product") {
    val p = planOf("q26_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row query side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian product allowed:\n$p")
  }

  test("q119 quantized knn: same shape as q26 — query broadcast, no product, no shuffle") {
    val p = planOf("q119_quantized_ann")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row query side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian product allowed:\n$p")
    // quantization is a narrow per-row projection — it must not
    // introduce an exchange before the top-k (the corpus scan flows
    // straight into the broadcast join; only the final global sort of
    // k rows may exchange)
    val joinLine = p.linesIterator.indexWhere(_.contains("BroadcastNestedLoopJoin"))
    // anchor before slicing: with joinLine = -1 the drop(0) below would
    // scan the WHOLE plan (mis-attributing the top-k's own exchange to
    // the corpus side, or passing vacuously on a reshaped plan)
    assert(joinLine >= 0,
      s"the query side must plan as a BroadcastNestedLoopJoin:\n$p")
    val preJoin = p.linesIterator.toSeq.drop(joinLine + 1)
      .filterNot(_.contains("Broadcast"))
    assert(!preJoin.exists(_.contains("Exchange hashpartitioning")),
      s"quantize must stay a narrow projection (no corpus shuffle):\n$p")
  }

  // ------------------------------------------- corpus/sampling scale guards
  // The round-6 audit pinned plans only for the round-1 flagships; these
  // pin the 100 TB claims SCALE.md makes for the corpus surface. The
  // cache-releasing operators checkpoint their public results (the plan
  // is opaque afterwards), so the guards run on the exposed lazy
  // builders — the same plans the operators execute.

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("q93 bloom probe: codegen'd filter directly over the fact scan, no exchange") {
    val keys = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val p = graft.ops.BloomPrune.semiJoin(orders, "o_custkey", keys, "c_custkey")
      .queryExecution.executedPlan.toString
    val lines = p.linesIterator.toVector
    val fi = lines.indexWhere(_.contains("graft_bloom_contains"))
    assert(fi >= 0, s"no bloom probe in the plan:\n$p")
    // AQE's initial plan carries no codegen-stage annotations, so
    // codegen-ness is pinned by DotProduct/BloomContains's doGenCode
    // specs; here we pin the POSITION: a plain Filter on the scan side.
    assert(lines(fi).contains("Filter"),
      s"the bloom probe must be a Filter:\n${lines(fi)}")
    val si = lines.indexWhere(l =>
      l.contains("FileScan") && l.contains("orders"), fi)
    assert(si > fi, s"no orders scan below the probe:\n$p")
    assert(!lines.slice(fi + 1, si).exists(_.contains("Exchange")),
      s"the probe must sit on the scan side of every exchange:\n$p")
  }

  test("q92 stop-shingle cap: the maxShingleDf anti join is in the executed plan") {
    val sh = graft.ops.Dedup.shingleTable(docs, "doc_id", "text", k = 3)
    val p = graft.ops.Dedup
      .jaccardFromShingles(sh, "doc_id", threshold = 0.5, maxShingleDf = 1000)
      .queryExecution.executedPlan.toString
    val anti = p.linesIterator.find(_.contains("LeftAnti"))
    assert(anti.isDefined, s"the stop-shingle cap must plan as an anti join:\n$p")
    assert(anti.get.contains("Broadcast"),
      s"the hot-shingle side must broadcast (it is tiny by Zipf):\n${anti.get}")
  }

  test("q106/q109: the stop-shingle cap anti join survives in both new dedup shapes") {
    import org.apache.spark.sql.functions.col
    val sh = graft.ops.Dedup.shingleTable(docs, "doc_id", "text", k = 3)
    val pContain = graft.ops.Dedup
      .containmentFromShingles(sh, "doc_id", threshold = 0.6, maxShingleDf = 1000)
      .queryExecution.executedPlan.toString
    assert(pContain.linesIterator.exists(l =>
      l.contains("LeftAnti") && l.contains("Broadcast")),
      s"containment must keep the broadcast stop-shingle anti join:\n$pContain")
    val shNew = graft.ops.Dedup.shingleTable(
      docs.filter(col("doc_id") % 4 === 1), "doc_id", "text", k = 3)
    val shOld = graft.ops.Dedup.shingleTable(
      docs.filter(col("doc_id") % 4 =!= 1), "doc_id", "text", k = 3)
    val pCross = graft.ops.Dedup
      .crossFromShingles(shNew, shOld, "doc_id", threshold = 0.5, maxShingleDf = 1000)
      .queryExecution.executedPlan.toString
    assert(pCross.linesIterator.exists(l =>
      l.contains("LeftAnti") && l.contains("Broadcast")),
      s"cross-dedup must broadcast-anti-join the corpus-side hot set:\n$pCross")
  }

  test("q98 hash split: pure scan-shaped projection, zero exchanges") {
    val p = graft.ops.Sampling.hashSplit(docs, "doc_id")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"hashSplit must not shuffle or broadcast anything:\n$p")
  }

  test("q99 stratified sample: broadcast fraction relation, zero shuffles") {
    val p = graft.ops.Sampling
      .stratifiedSample(docs, "lang", "doc_id",
        Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.25, "fr" -> 0.125))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the |strata|-row fraction relation must broadcast:\n$p")
    assert(!p.contains("Exchange hashpartitioning") && !p.contains("SortMergeJoin"),
      s"the corpus side must never shuffle:\n$p")
  }

  // ------------------------------------------- cluster-family scale guards
  // SCALE.md's claims for the q107/q110/q111 composition family and
  // q112's index paths, pinned as executed plans (round-7/8 gap). The
  // real pair/cluster inputs are checkpointed (RDD-backed → stats-opaque
  // to Catalyst), so the operators make the broadcast decision from a
  // MEASURED row count ([[Dedup.broadcastIfSmall]]) — which makes the
  // initial plan deterministic and guardable, no AQE reliance.

  private def litPairs = {
    import org.apache.spark.sql.functions.col
    docs.filter(col("doc_id") < 8).select(col("doc_id").as("id_a"))
      .crossJoin(docs.filter(col("doc_id") >= 8 && col("doc_id") < 12)
        .select(col("doc_id").as("id_b")))
      .localCheckpoint() // RDD-backed, like the real jaccardNearDup output
  }

  test("q107 leakage audit: label joins are |pairs|-sized (pairs broadcast, corpus text never read)") {
    import org.apache.spark.sql.functions.col
    val splits = graft.ops.Sampling.hashSplit(docs, "doc_id")
      .select(col("doc_id"), col("split"))
    val p = graft.ops.Sampling.splitLeakageAudit(splits, "doc_id", "split", litPairs)
      .queryExecution.executedPlan.toString
    val n = "BroadcastHashJoin".r.findAllIn(p).length
    assert(n >= 2, s"both label joins must broadcast the pair side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus-sized split relation must never sort-merge:\n$p")
    // column pruning must reach THROUGH the hash-split projection: the
    // audit needs only doc_id, never the document text
    p.linesIterator.filter(l => l.contains("ReadSchema") && l.contains("documents"))
      .foreach(l => assert(!l.contains("text"),
        s"the audit must not read document text:\n$l"))
  }

  test("q48 distribution windows: rank windows keyed past the 3-value status column") {
    val p = planOf("q48_distribution_windows")
    // the corpus-sized row_number must window by (status, price-bucket),
    // never by status alone (3 statuses = 3 tasks for the whole table)
    assert(p.linesIterator.exists(l =>
      l.contains("windowspecdefinition") && l.contains("__rb")),
      s"the rank window must partition by (status, __rb):\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"never a keyless/global window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"bucket offsets and group counts must broadcast back:\n$p")
  }

  test("q101/q104 per-group caps: bounded-heap aggregate, never a corpus window sort") {
    Seq("q101_quota_cap", "q104_exact_k_sample").foreach { name =>
      val p = planOf(name)
      // the rank comes from the TopKAgg heap with MAP-SIDE partials
      // (each partition ships ≤ n candidates per group), not from a
      // row_number window that shuffles AND sorts every group's rows
      assert(p.contains("graft_topk"),
        s"$name must rank via the bounded-heap aggregate:\n$p")
      assert(p.contains("partial_graft_topk"),
        s"$name's heap must combine map-side:\n$p")
      assert(!p.contains("Window"),
        s"$name must not window-sort the corpus:\n$p")
      assert(!p.contains("Exchange SinglePartition"),
        s"$name: never a global exchange:\n$p")
    }
  }

  test("q110 cluster-safe split: cluster relation broadcast, split adds no corpus shuffle") {
    import org.apache.spark.sql.functions.col
    val p = graft.ops.Sampling.clusterSafeSplit(docs, "doc_id", litPairs)
      .select(col("doc_id"), col("split"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the (≪ corpus) cluster relation must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus side must never shuffle for the representative join:\n$p")
    assert(!p.contains("Exchange hashpartitioning") && !p.contains("Exchange SinglePartition"),
      s"the split decision is a pure per-row hash — zero exchanges beyond the broadcast:\n$p")
  }

  test("q111 keep-best: cluster join broadcast, keeper window partitioned (never global)") {
    val p = graft.ops.Dedup.keepBest(docs, "doc_id", litPairs, "n_chars")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the cluster relation must broadcast onto the corpus:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must not shuffle for the cluster join:\n$p")
    val wi = p.linesIterator.find(_.contains("Window"))
    assert(wi.isDefined, s"no window node:\n$p")
    assert(wi.get.contains("cluster_id"),
      s"the keeper window must partition by cluster_id:\n${wi.get}")
    assert(!p.contains("Exchange SinglePartition"),
      s"state must be bounded by the largest cluster, never global:\n$p")
  }

  test("q112 ann recall: only the brute ground-truth path is a corpus×probes product") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val paths = graft.ops.Similarity.annRecallPaths(emb, "vec_id", "embedding",
      probeEvery = 50, probeOffset = 7, k = 10, numCentroids = 8, nprobe = 4,
      graft.ops.Similarity.multiTableBucketer(4, 4), mpFlipBits = 4)
    // The shared corpus relation is persisted, and the plan string
    // embeds its BUILD plan under each InMemoryRelation occurrence —
    // which legitimately contains one BroadcastNestedLoopJoin (the
    // |centroids|-bounded cell assignment). A product is out of
    // contract only OUTSIDE cached builds: count(BNLJ) must not exceed
    // count(InMemoryRelation) for the index paths, and exceed it by
    // exactly the probe product for the brute path.
    def bnlj(p: String): Int = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    def imr(p: String): Int = "InMemoryRelation".r.findAllIn(p).length
    try {
      val pLsh = paths.lshK.queryExecution.executedPlan.toString
      val pIvf = paths.ivfK.queryExecution.executedPlan.toString
      val pMp = paths.mpK.queryExecution.executedPlan.toString
      // the IVF path owns ONE more bounded product of its own: the
      // |centroids|×|probes| cell-scoring join (never corpus-sized)
      for ((nm, extra, p) <- Seq(("lsh", 0, pLsh), ("ivf", 1, pIvf),
          ("multiprobe", 0, pMp))) {
        assert(!p.contains("CartesianProduct"),
          s"the $nm index path must never be cartesian:\n$p")
        assert(bnlj(p) <= imr(p) + extra,
          s"the $nm index path must add no corpus-sized product beyond " +
            s"the cached cell assignment (+$extra bounded own):\n$p")
        assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
          s"the $nm path's probe side must broadcast:\n$p")
      }
      // the deliberate brute path: ONE product of its own, but
      // probe-side broadcast — corpus×probes through a broadcast,
      // never a corpus shuffle
      val pBrute = paths.bruteK.queryExecution.executedPlan.toString
      assert(bnlj(pBrute) == imr(pBrute) + 1,
        s"ground truth is exactly one (bounded) broadcast product:\n$pBrute")
      assert(!pBrute.contains("CartesianProduct"),
        s"the brute product must broadcast probes, not cartesian:\n$pBrute")
    } finally { paths.corpus.unpersist(blocking = false); () }
  }

  test("q113 index dedup: hot set from the dfs SUMMARY (broadcast anti join), no fresh corpus aggregate") {
    import org.apache.spark.sql.functions.col
    val ix = graft.ops.Dedup.buildShingleIndex(
      docs.filter(col("doc_id") % 4 === 0), "doc_id", "text")
    val batchSh = graft.ops.Dedup.shingleTable(
      docs.filter(col("doc_id") % 4 === 1), "doc_id", "text", 3)
    val p = graft.ops.Dedup
      .dedupAgainstIndex(batchSh, ix, "doc_id", threshold = 0.5, maxShingleDf = 1000)
      .queryExecution.executedPlan.toString
    val anti = p.linesIterator.find(_.contains("LeftAnti"))
    assert(anti.isDefined, s"the stop-shingle cap must plan as an anti join:\n$p")
    assert(anti.get.contains("Broadcast"),
      s"the hot set must broadcast (it reads the maintained dfs summary):\n${anti.get}")
    assert(!p.contains("CartesianProduct"), s"no products anywhere:\n$p")
    // the hot set must come from the maintained dfs relation (an RDD
    // scan), NOT a fresh aggregate over the corpus-sized postings: the
    // only aggregates in the plan are the batch-proportional ones
    // (batch sizes + pair intersection counts), so at most 2 distinct
    // hashpartitioning exchange groups appear
    val aggExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(aggExchanges <= 4, // 2 aggregates × (partial/final boundary prints once each) + 2 join exchanges
      s"unexpected exchange count — a corpus-side df aggregate crept in:\n$p")
  }

  test("q114 pipeline tail: one window exchange by cluster_id; split adds zero exchanges") {
    import org.apache.spark.sql.functions.col
    val out = graft.ops.Dedup.keepBestWithClusters(
        docs.select(col("doc_id"), col("n_chars")), "doc_id",
        litPairs.select(col("id_a").as("doc_id"), col("id_b").as("cluster_id"))
          .localCheckpoint(),
        "n_chars")
      .withColumn("split", graft.ops.Sampling.splitOn(col("cluster_id")))
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the cluster relation must broadcast:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toVector
    assert(exchanges.size == 1 && exchanges.head.contains("cluster_id"),
      s"exactly ONE exchange (the keeper window's, by cluster_id) — the " +
        s"split must be a pure expression over the materialized cluster_id:\n$p")
    assert(!p.contains("Exchange SinglePartition"), s"never a global window:\n$p")
  }

  test("q132 token budget: bucketed prefix sum — windows keyed past the domain, no global exchange") {
    val p = planOf("q132_token_budget")
    // the corpus-sized running sum must window by (domain, score-bucket),
    // never by the domain alone (one skewed domain = one task at 100 TB)
    assert(p.linesIterator.exists(l =>
      l.contains("windowspecdefinition") && l.contains("__ob")),
      s"the corpus window must partition by (source, __ob):\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"never a keyless/global window:\n$p")
    // the bucket-summary prefix rides back on a broadcast, not a shuffle
    // of the corpus
    assert(p.contains("BroadcastHashJoin"),
      s"the (domain, bucket) prefix relation must broadcast:\n$p")
  }

  test("q115 semdedup: pair-side broadcasts onto the assignment, never a corpus shuffle or product") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val p = graft.ops.Similarity.semDedup(emb, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"no cartesian anywhere:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the measured-broadcast regime must put the pair/component side " +
        s"on the build side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus-sized assignment must never sort-merge in the " +
        s"sane-dup-rate regime:\n$p")
  }

  test("q28 nearDupPairs: above the broadcast threshold the corpus is NEVER broadcast") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // Force the large regime (maxBroadcastRows = 0) and disable
    // size-estimation auto-broadcast (the test corpus is tiny): the
    // guard pins that the OPERATOR no longer hints a corpus broadcast —
    // the round-9 verdict's one 100 TB scale-killer. Both sides must
    // meet in a shuffle equi-join on the bucket key instead.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = graft.ops.Similarity
        .nearDupPairs(emb, "vec_id", "embedding", threshold = 0.35,
          numPlanes = 8, dim = 64, maxBroadcastRows = 0L)
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastExchange") && !p.contains("BroadcastHashJoin") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"above the threshold nothing corpus-sized may broadcast:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"the pair join must be a shuffle equi-join on the bucket key:\n$p")
      assert(!p.contains("CartesianProduct"), s"never a product:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("q28 nearDupPairs: under the threshold the measured regime broadcasts the build side") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val p = graft.ops.Similarity
      .nearDupPairs(emb, "vec_id", "embedding", threshold = 0.35,
        numPlanes = 8, dim = 64)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the small-corpus regime must broadcast the build side:\n$p")
    assert(p.contains("Exchange RoundRobinPartitioning"),
      s"the probe side must be spread before the broadcast join (the " +
        s"single-file-corpus parallelism fix):\n$p")
  }

  test("q114 shared signals: gate and dedup shingles both read the token base (one corpus tokenize)") {
    val sig = graft.ops.CurationSignals.build(docs, "doc_id", "text")
    try {
      val pGate = ExtQueries.curationGateFromSignals(sig)
        .queryExecution.executedPlan.toString
      val pSh = sig.shingles(3).queryExecution.executedPlan.toString
      for ((nm, p) <- Seq(("gate", pGate), ("dedup shingles", pSh))) {
        assert(p.contains("InMemoryTableScan"),
          s"the $nm plan must read the shared token base cache:\n$p")
        // any text-reading documents scan may appear ONLY inside the
        // cached base's build plan (printed once under each
        // InMemoryRelation occurrence) — a fresh tokenize would add one
        val textScans = p.linesIterator.count(l =>
          l.contains("FileScan") && l.contains("documents") && l.contains("text"))
        val imr = "InMemoryRelation".r.findAllIn(p).length
        assert(textScans <= imr,
          s"the $nm plan re-reads document text outside the shared base " +
            s"($textScans text scans vs $imr cached builds):\n$p")
      }
    } finally { sig.base.unpersist(blocking = false); () }
  }

  test("q116 ann index probe: the scan partition-prunes to the query bucket") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val path = s"${sys.props("java.io.tmpdir")}/graft_ann_index_guard"
    graft.ops.AnnIndex.write(emb, "vec_id", "embedding", path,
      numPlanes = 8, dim = 64)
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(graft.ops.Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    val qb = graft.ops.AnnIndex.bucketOf(qvec, numPlanes = 8)
    val p = graft.ops.AnnIndex
      .probe(spark, path, "vec_id", qvec, k = 5, numPlanes = 8,
        excludeId = Some(0L))
      .queryExecution.executedPlan.toString
    // the bucket equality must be a PARTITION filter on the scan — that
    // is the entire point of the at-rest layout (read one directory's
    // files, not the corpus)
    val scan = p.linesIterator.find(_.contains("PartitionFilters"))
    assert(scan.isDefined, s"no PartitionFilters entry in the probe scan:\n$p")
    assert(scan.get.contains(s"= $qb"),
      s"the query-bucket equality must prune partitions:\n${scan.get}")
    // and it must NOT degrade to a post-scan Filter NODE on bucket (the
    // scan line itself legitimately mentions bucket in PartitionFilters)
    assert(!p.linesIterator.exists(l =>
      l.contains("Filter (") && l.contains("bucket")),
      s"bucket must never be filtered AFTER the scan:\n$p")
  }

  test("q123 multi-probe: the 9-bucket isin stays a PARTITION filter on the scan") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val path = s"${sys.props("java.io.tmpdir")}/graft_ann_index_guard_multi"
    graft.ops.AnnIndex.write(emb, "vec_id", "embedding", path,
      numPlanes = 8, dim = 64)
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(graft.ops.Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    val qb = graft.ops.AnnIndex.bucketOf(qvec, numPlanes = 8)
    val p = graft.ops.AnnIndex
      .probeMulti(spark, path, "vec_id", qvec, k = 5, numPlanes = 8,
        excludeId = Some(0L))
      .queryExecution.executedPlan.toString
    // the Hamming-1 union must prune partitions — `bucket IN (...)` in
    // the scan's PartitionFilters, so the probe reads 9/2^8 of the
    // index directories instead of the corpus
    val scan = p.linesIterator.find(_.contains("PartitionFilters"))
    assert(scan.isDefined, s"no PartitionFilters entry in the probe scan:\n$p")
    assert(scan.get.contains("bucket") && scan.get.contains(" IN (") &&
      scan.get.contains(qb),
      s"the 1-ball isin must prune partitions (IN over the 9 buckets):\n${scan.get}")
    // ... and never degrade to a post-scan Filter node on bucket
    assert(!p.linesIterator.exists(l =>
      l.contains("Filter (") && l.contains("bucket")),
      s"bucket must never be filtered AFTER the scan:\n$p")
  }

  test("q125 ivf index probe: the nprobe-cell isin stays a PARTITION filter on the scan") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_index_guard"
    graft.ops.IvfIndex.write(emb, "vec_id", "embedding", path,
      numCentroids = 8)
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(graft.ops.Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    val cells = graft.ops.IvfIndex.probeCellsOf(spark, path, qvec, nprobe = 2)
    val p = graft.ops.IvfIndex
      .probe(spark, path, "vec_id", qvec, k = 5, nprobe = 2,
        excludeId = Some(0L))
      .queryExecution.executedPlan.toString
    // the nprobe-cell choice must prune partitions — the scan reads 2
    // cells' directories out of numCentroids, never the corpus
    val scan = p.linesIterator.find(_.contains("PartitionFilters"))
    assert(scan.isDefined, s"no PartitionFilters entry in the probe scan:\n$p")
    assert(scan.get.contains("cell") && scan.get.contains(" IN (") &&
      cells.forall(scan.get.contains),
      s"the nprobe cells must prune partitions (IN over $cells):\n${scan.get}")
    assert(!p.linesIterator.exists(l =>
      l.contains("Filter (") && l.contains("cell")),
      s"cell must never be filtered AFTER the scan:\n$p")
  }

  test("q134 quantized ivf probe: cell-pruned AND narrow — int8 scan over the nprobe cells") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_quant_guard"
    graft.ops.IvfIndex.writeQuantized(emb, "vec_id", "embedding", path,
      numCentroids = 8)
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(graft.ops.Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    val cells = graft.ops.IvfIndex.probeCellsOf(spark, path, qvec, nprobe = 2)
    val p = graft.ops.IvfIndex
      .probeQuantized(spark, path, "vec_id", qvec, k = 5, nprobe = 2,
        excludeId = Some(0L))
      .queryExecution.executedPlan.toString
    // the nprobe-cell choice must prune partitions, exactly as q125's
    val scan = p.linesIterator.find(_.contains("PartitionFilters"))
    assert(scan.isDefined, s"no PartitionFilters entry in the probe scan:\n$p")
    assert(scan.get.contains("cell") && scan.get.contains(" IN (") &&
      cells.forall(scan.get.contains),
      s"the nprobe cells must prune partitions (IN over $cells):\n${scan.get}")
    assert(!p.linesIterator.exists(l =>
      l.contains("Filter (") && l.contains("cell")),
      s"cell must never be filtered AFTER the scan:\n$p")
    // ... and the bytes are the int8 column — no float/double vector
    // column exists at rest, so none may appear in the scan schema
    val rs = p.linesIterator.find(_.contains("ReadSchema"))
    assert(rs.isDefined, s"no ReadSchema in the probe scan:\n$p")
    assert(rs.get.contains("qv") && rs.get.contains("tinyint"),
      s"the probe must scan the int8 form:\n${rs.get}")
    assert(!rs.get.contains("array<float>") && !rs.get.contains("array<double>"),
      s"no wide vector column may be read (none is even stored):\n${rs.get}")
  }

  test("q149 ivf-pq probe: cell-pruned AND codes-only — the scan reads m codes, no vectors exist") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_guard"
    graft.ops.IvfIndex.writePq(emb, "vec_id", "embedding", path,
      numCentroids = 8, m = 4, k = 8, pqIters = 1)
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(graft.ops.Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    val cells = graft.ops.IvfIndex.probeCellsOf(spark, path, qvec, nprobe = 2)
    val p = graft.ops.IvfIndex
      .probePq(spark, path, "vec_id", qvec, k = 5, nprobe = 2,
        excludeId = Some(0L))
      .queryExecution.executedPlan.toString
    // the nprobe-cell choice must prune partitions, exactly as q125's
    val scan = p.linesIterator.find(_.contains("PartitionFilters"))
    assert(scan.isDefined, s"no PartitionFilters entry in the probe scan:\n$p")
    assert(scan.get.contains("cell") && scan.get.contains(" IN (") &&
      cells.forall(scan.get.contains),
      s"the nprobe cells must prune partitions (IN over $cells):\n${scan.get}")
    // ... and the bytes are CODES ONLY: the scan schema carries the
    // (sub, code) integers, and no vector column of any width exists
    val rs = p.linesIterator.find(_.contains("ReadSchema"))
    assert(rs.isDefined, s"no ReadSchema in the probe scan:\n$p")
    assert(rs.get.contains("sub") && rs.get.contains("code"),
      s"the probe must scan the code columns:\n${rs.get}")
    assert(!rs.get.contains("array<"),
      s"no vector column may be read (none is even stored):\n${rs.get}")
    // the m·k lookup table broadcasts; the codes side never does
    assert(p.contains("BroadcastHashJoin"),
      s"the LUT join must be a broadcast hash join:\n$p")
  }

  test("q152 bm25 stored index: the query terms' filter pushes into the postings scan") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val path = s"${sys.props("java.io.tmpdir")}/graft_bm25_guard"
    graft.ops.Retrieval.writeBm25Index(docs, "doc_id", "text", path)
    val p = graft.ops.Retrieval
      .bm25FromIndex(spark, path, "doc_id",
        query = Seq("vector", "stream", "window"), k = 20)
      .queryExecution.executedPlan.toString
    // only the query terms' postings are read: the In filter must reach
    // the parquet scan (at 100 TB the same predicate prunes term
    // buckets), and the scan must stay narrow — never the text
    assert(p.contains("PushedFilters") && p.contains("In(term"),
      s"the term isin must push into the postings scan:\n$p")
    assert(!p.contains("text"),
      s"document text must never be read by the stored-index path:\n$p")
    // df and the stats delta-sum are broadcast back; the postings side
    // never shuffles wide for them
    assert(p.contains("BroadcastHashJoin"),
      s"df must broadcast onto the matched postings:\n$p")
  }

  test("q154 bucketed bm25: the terms' buckets are a PARTITION filter on the postings scan") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val path = s"${sys.props("java.io.tmpdir")}/graft_bm25_tb_guard"
    graft.ops.Retrieval.writeBm25Index(docs, "doc_id", "text", path,
      termBuckets = 16)
    val terms = Seq("vector", "stream", "window")
    val p = graft.ops.Retrieval
      .bm25FromIndex(spark, path, "doc_id", query = terms, k = 20)
      .queryExecution.executedPlan.toString
    // the driver-computed tb IN-list must land in PartitionFilters —
    // FILE pruning (the read touches only the terms' bucket dirs),
    // strictly stronger than q152's pushed row-group filter
    val scan = p.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("tb"))
    assert(scan.isDefined, s"no tb PartitionFilters entry in the scan:\n$p")
    assert(scan.get.contains("tb#") || scan.get.contains("tb IN") ||
      scan.get.contains("In(tb"), s"tb must be filtered as a partition:\n${scan.get}")
    // the term filter still pushes within the pruned buckets
    assert(p.contains("In(term"), s"term isin must still push down:\n$p")
    assert(!p.contains("text"),
      s"document text must never be read by the stored-index path:\n$p")
  }

  test("q170 signature store: the batch's band buckets are a PARTITION filter on the store scan") {
    import org.apache.spark.sql.functions.col
    val path = s"${sys.props("java.io.tmpdir")}/graft_sigstore_guard"
    val sig = spark.range(64).select(col("id").as("doc_id"),
      (org.apache.spark.sql.functions.shiftright(col("id"), 2) * 1664525
        + 1013904223)
        .bitwiseAND(org.apache.spark.sql.functions.lit((1L << 48) - 1)).as("s"))
    graft.ops.Dedup.writeSignatureStore(sig, "doc_id", "s", path,
      bits = 48, bands = 4, sigBuckets = 16)
    val p = graft.ops.Dedup.dedupAgainstSignatureStore(
        sig.limit(5), "doc_id", "s", path, maxHamming = 3)
      .queryExecution.executedPlan.toString
    // the batch's sb values must land in PartitionFilters — the store
    // scan prunes to the batch's band-bucket directories' FILES
    val scan = p.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("sb"))
    assert(scan.isDefined, s"no sb PartitionFilters entry in the store scan:\n$p")
    assert(scan.get.contains("sb#") || scan.get.contains("sb IN") ||
      scan.get.contains("In(sb"), s"sb must be filtered as a partition:\n${scan.get}")
  }

  test("q187 stored keep-best: the pair sweep reads the signature store, never media bytes") {
    import org.apache.spark.sql.functions.col
    val path = s"${sys.props("java.io.tmpdir")}/graft_sigstore_kb_guard"
    val sig = spark.range(64).select(col("id").as("doc_id"),
      (org.apache.spark.sql.functions.shiftright(col("id"), 2) * 1664525
        + 1013904223)
        .bitwiseAND(org.apache.spark.sql.functions.lit((1L << 48) - 1)).as("s"))
    graft.ops.Dedup.writeSignatureStore(sig, "doc_id", "s", path,
      bits = 48, bands = 4, sigBuckets = 16)
    val p = graft.ops.Dedup.hammingPairsFromSignatureStore(spark, path,
      maxHamming = 3).queryExecution.executedPlan.toString
    // the maintenance pass must cost a store scan, not a corpus decode:
    // no object-mapped decode stage, no media/payload column anywhere —
    // every leaf is a parquet scan of the store's banded relation
    assert(!p.contains("SerializeFromObject") && !p.contains("MapPartitions"),
      s"pair sweep must not run a decode stage:\n$p")
    assert(!p.contains("payload"),
      s"pair sweep must never reference media bytes:\n$p")
    assert(p.contains("bands"), s"pair sweep must scan the banded store:\n$p")
  }

  test("q180 cross embedding dedup: the batch's buckets are a PARTITION filter on the index scan") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val path = s"${sys.props("java.io.tmpdir")}/graft_ann_cross_guard"
    graft.ops.AnnIndex.write(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", path, numPlanes = 8, dim = 64)
    val p = graft.ops.AnnIndex.crossDedupAgainstIndex(
        emb.filter(col("vec_id") % 2 === 1).limit(5), "vec_id",
        "embedding", path, threshold = 0.2, numPlanes = 8, dim = 64)
      .queryExecution.executedPlan.toString
    // the batch's distinct bucket values must land in PartitionFilters:
    // the store scan reads only the batch's bucket directories' files
    val scan = p.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("bucket"))
    assert(scan.isDefined, s"no bucket PartitionFilters entry in the index scan:\n$p")
    assert(scan.get.contains("bucket#") || scan.get.contains("In(bucket"),
      s"bucket must be filtered as a partition:\n${scan.get}")
  }

  test("q197 stored embed keep-best: the pair sweep reads the bucket index, never the embedding table") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val path = s"${sys.props("java.io.tmpdir")}/graft_ann_sweep_guard"
    graft.ops.AnnIndex.write(emb, "vec_id", "embedding", path,
      numPlanes = 8, dim = 64)
    val p = graft.ops.AnnIndex.cosinePairsFromIndex(spark, path, "vec_id",
      threshold = 0.2).queryExecution.executedPlan.toString
    // the maintenance pass must cost an index scan, not a corpus
    // re-embed/re-bucket: every leaf is a parquet scan of the store
    // (vectors + norms already materialized per bucket), the primary
    // embedding table is never touched, and no object-mapped stage runs
    assert(!p.contains("SerializeFromObject") && !p.contains("MapPartitions"),
      s"pair sweep must not run a decode/bucketing stage:\n$p")
    assert(!p.contains("embeddings.parquet"),
      s"pair sweep must never read the primary embedding table:\n$p")
    assert(p.contains("graft_ann_sweep_guard"),
      s"pair sweep must scan the at-rest index:\n$p")
    // the equi-key is the partition value the files are laid out by
    assert(p.contains("bucket"), s"pair join must key on the bucket:\n$p")
  }

  test("q179 stored decontamination: the bench shingles broadcast; the corpus never shuffles for them") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val path = s"${sys.props("java.io.tmpdir")}/graft_bench_ix_guard"
    graft.ops.Decontamination.writeBenchIndex(
      docs.filter(col("doc_id") % 20 === 7), "doc_id", "text", path, k = 5)
    val p = graft.ops.Decontamination.overlapFromIndex(
        docs.filter(col("doc_id") % 20 =!= 7), "doc_id", "text", path,
        minOverlap = 3)
      .queryExecution.executedPlan.toString
    // the eval side is the small one by construction: its stored
    // shingles ride a broadcast hash join onto the corpus shingle
    // stream — at 100 TB the corpus side is scanned in place
    assert(p.contains("BroadcastHashJoin"),
      s"the stored bench shingles must broadcast:\n$p")
  }

  test("q172 span excision: no window is ever partitioned by gram (keeper is an aggregate)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (lazyResult, base, grams) =
      graft.ops.TextAnalysis.exciseDupSpansPlan(docs, "doc_id", "text", 5)
    val p = lazyResult.queryExecution.analyzed.toString
    base.unpersist(); grams.unpersist()
    // the keeper per duplicated gram is a grouped struct-min — a
    // boilerplate gram shared by millions of docs must be one combiner
    // cell, never a million-row sorted window partition
    assert(!p.contains("windowspecdefinition(gram"),
      s"no window may partition by gram:\n$p")
    assert(p.contains("min(struct(") || p.contains("min(named_struct"),
      s"the keeper must be a grouped struct-min aggregate:\n$p")
  }

  test("q173 nb classify: the per-label scalars broadcast onto the token stream") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val model = graft.ops.NaiveBayes.trainModel(
      docs.filter(col("doc_id") % 4 =!= 3), "doc_id", "text", "lang")
    val p = graft.ops.NaiveBayes.classify(
        docs.filter(col("doc_id") % 4 === 3), "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    // the |labels|-row priors/floors relation fans the batch tokens out
    // via a broadcast nested-loop cross — the batch side never shuffles
    // for it
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the priors cross join must broadcast:\n$p")
  }

  test("q121 two-tier: candidate set broadcast into a semi join, zero corpus shuffle") {
    val p = planOf("q121_two_tier_rerank")
    // tier 2 fetches candidates via a broadcast LEFT SEMI lookup — the
    // corpus is scanned, never shuffled, and nothing is cartesian
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"candidate fetch must be a broadcast semi join:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian product allowed:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"neither tier may shuffle the corpus (both cuts are TakeOrdered):\n$p")
  }

  test("q122 quantized index probe: pruned AND narrow — the scan reads int8, no floats exist") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val path = s"${sys.props("java.io.tmpdir")}/graft_ann_quant_guard"
    graft.ops.AnnIndex.writeQuantized(emb, "vec_id", "embedding", path,
      numPlanes = 8, dim = 64)
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(graft.ops.Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    val qb = graft.ops.AnnIndex.bucketOf(qvec, numPlanes = 8)
    val p = graft.ops.AnnIndex
      .probeQuantized(spark, path, "vec_id", qvec, k = 5, numPlanes = 8,
        excludeId = Some(0L))
      .queryExecution.executedPlan.toString
    val scan = p.linesIterator.find(_.contains("PartitionFilters"))
    assert(scan.isDefined, s"no PartitionFilters entry in the probe scan:\n$p")
    assert(scan.get.contains(s"= $qb"),
      s"the query-bucket equality must prune partitions:\n${scan.get}")
    // the probe's bytes are the int8 column — the scan schema must be
    // the tinyint array (+ norm/id), never a float/double vector column
    val rs = p.linesIterator.find(_.contains("ReadSchema"))
    assert(rs.isDefined, s"no ReadSchema in the probe scan:\n$p")
    assert(rs.get.contains("qv") && rs.get.contains("tinyint"),
      s"the probe must scan the int8 form:\n${rs.get}")
    assert(!rs.get.contains("array<float>") && !rs.get.contains("array<double>"),
      s"no wide vector column may be read (none is even stored):\n${rs.get}")
  }

  test("q120 compacted index probe: partition pruning survives compaction") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val frag = s"${sys.props("java.io.tmpdir")}/graft_ann_frag_guard"
    val path = s"${sys.props("java.io.tmpdir")}/graft_ann_compact_guard"
    // append is not idempotent across suite re-runs on the same host
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(frag))
    for (k <- 0 until 2)
      graft.ops.AnnIndex.append(emb.filter(col("vec_id") % 2 === k),
        "vec_id", "embedding", frag, numPlanes = 8, dim = 64)
    graft.ops.AnnIndex.compact(spark, frag, path)
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(graft.ops.Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    val qb = graft.ops.AnnIndex.bucketOf(qvec, numPlanes = 8)
    val p = graft.ops.AnnIndex
      .probe(spark, path, "vec_id", qvec, k = 5, numPlanes = 8,
        excludeId = Some(0L))
      .queryExecution.executedPlan.toString
    val scan = p.linesIterator.find(_.contains("PartitionFilters"))
    assert(scan.isDefined, s"no PartitionFilters entry in the probe scan:\n$p")
    assert(scan.get.contains(s"= $qb"),
      s"the query-bucket equality must prune partitions:\n${scan.get}")
  }

  test("q95 bm25: per-doc stats built once and shared (single corpus tokenize)") {
    val perDoc = graft.ops.Retrieval
      .perDocStats(docs, "doc_id", "text", Seq("vector", "stream", "window"))
      .persist()
    try {
      val p = graft.ops.Retrieval
        .rankFromStats(perDoc, "doc_id", k = 20, k1 = 1.2, b = 0.75)
        .queryExecution.executedPlan.toString
      // both the (N, avgdl) aggregate and the tf unpivot must read the
      // shared cached stats — the cache builds (and so tokenizes the
      // corpus) exactly once, which is the one-scan claim. Any
      // FileSourceScan text below is inside the InMemoryRelation's
      // build plan, not an extra consumer scan.
      val nShared = "InMemoryTableScan".r.findAllIn(p).length
      assert(nShared >= 2,
        s"both stats consumers must read the shared per-doc cache:\n$p")
    } finally { perDoc.unpersist(blocking = false); () }
  }

  test("q33/q71 bucketed as-of: the main window partitions by (key, time bucket)") {
    // the skew claim — a hot key's timeline splits across range/w tasks —
    // is only true if the BIG window's partition spec actually includes
    // the bucket column; a regression to key-only partitioning would
    // stay oracle-green (bucketing is semantics-preserving) and silently
    // re-serialize the hot key
    for (q <- Seq("q33_asof_join", "q71_asof_forward")) {
      val p = planOf(q)
      val windowLines = p.linesIterator.filter(_.contains("Window ")).toList
      assert(windowLines.nonEmpty, s"$q must contain window nodes:\n$p")
      assert(windowLines.exists(l => l.contains("user_id") && l.contains("__b")),
        s"$q's main window must partition by (user_id, __b):\n${windowLines.mkString("\n")}")
    }
  }

  test("q210 epoch shard plan: the corpus prefix sum partitions by bucket; only the 256-row offset relation is single-partition") {
    // the scale claim — no global single-partition window over the
    // corpus — is exactly one plan regression away: dropping the __bk
    // partition spec stays oracle-green (the cumsum is a property of
    // the total order) and silently serializes the corpus through one
    // task. Pin: the CORPUS window partitions by __bk, the offsets
    // join back by broadcast, and the only SinglePartition exchange
    // feeds the post-aggregate 256-row offset window.
    val p = planOf("q210_epoch_shard_plan")
    val windowLines = p.linesIterator.filter(_.contains("Window ")).toList
    assert(windowLines.exists(_.contains("windowspecdefinition(__bk")),
      s"the corpus prefix sum must partition by __bk:\n${windowLines.mkString("\n")}")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the 256-row offset relation must broadcast back:\n$p")
    val single = p.linesIterator.count(_.contains("SinglePartition"))
    assert(single <= 1,
      s"at most ONE single-partition exchange (the bounded offset window), found $single:\n$p")
  }
}
