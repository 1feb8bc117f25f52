package graft.queries

import graft.ops.{Dedup, RangeJoin}
import graft.warehouse.Scd2
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Round-2 analytic surface: range joins, grouping sets, reshaping
  * (unpivot), distribution windows, conditional aggregation, deterministic
  * sampling, time bucketing, SCD-2 history, array fingerprints,
  * histograms, and SimHash near-dup pairs — each with a DuckDB oracle
  * (except the sketch query, which is approximate by construction and
  * gets the driver's rows-only check).
  *
  * Determinism rules are those of [[RefQueries]]: shared column names, a
  * total ORDER BY with explicit NULLS placement on both sides (Spark
  * defaults NULLS FIRST for ASC, DuckDB NULLS LAST), DECIMAL paths for
  * money sums, BIGINT casts for integers, round(×, 6) wherever both
  * engines interpolate floats.
  */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Exact, order-independent sum of a 2-decimal double column. */
  private def decSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  // ---------------------------------------------------------------- queries

  /** Range/interval join via bucket decomposition ([[RangeJoin]]): orders
    * priced inside overlapping nation-derived intervals
    * [nk·10000, nk·10000+15000). The oracle runs the naive BETWEEN join —
    * same rows, quadratic plan; ours is an equi-join on the bucket id.
    */
  private val q45: Q = (s, dir) => {
    val intervals = t(s, dir, "nation").select(
      col("n_nationkey").cast("long").as("iv_id"),
      (col("n_nationkey") * 10000.0).cast("double").as("lo"),
      (col("n_nationkey") * 10000.0 + 15000.0).cast("double").as("hi"))
    RangeJoin.intervalJoin(t(s, dir, "orders"), "o_totalprice",
        intervals, "lo", "hi", bucketWidth = 5000.0)
      .groupBy(col("iv_id"))
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("sum_price"))
      .orderBy("iv_id")
  }

  /** GROUPING SETS beyond rollup/cube's fixed lattices: the two one-
    * dimensional marginals plus the grand total, with grouping()
    * indicators (SQL surface — grouping sets have no DataFrame API).
    */
  private val q46Run = new java.util.concurrent.atomic.AtomicLong()

  private val q46: Q = (s, dir) => {
    // unique per invocation: the session is shared by concurrent suites,
    // and a fixed view name would race between create and analysis
    val view = s"graft_q46_orders_${q46Run.incrementAndGet()}"
    t(s, dir, "orders").createOrReplaceTempView(view)
    s.sql(s"""SELECT o_orderstatus AS status, o_orderpriority AS priority,
             |       count(*) AS n,
             |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
             |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
             |FROM $view
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY status ASC NULLS FIRST, priority ASC NULLS FIRST""".stripMargin)
  }

  /** Unpivot/melt: wide measure columns → long (measure, val) — the
    * reshaping inverse of q40's pivot. Narrow-before-wide matters at
    * scale: unpivot multiplies rows by the measure count, so it runs on
    * the projected 5-column slice, never the full fact width.
    */
  private val q47: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "measure", "val")
      .orderBy("l_orderkey", "l_linenumber", "measure")

  /** Distribution windows: quartile (ntile), percent_rank, cume_dist per
    * status — the ranking family q34 doesn't cover, via
    * [[graft.ops.Ranking]]'s DISTRIBUTED rank instead of
    * `Window.partitionBy(status)`: o_orderstatus has THREE values, so
    * the window form puts a third of the orders table on one task —
    * and unlike q36/q101's capped cuts this family's output is
    * corpus-sized, so the heap aggregate can't help either; the
    * bucketed rank (price-value buckets, parallel local row_numbers,
    * broadcast bucket offsets) is the only shape that survives 100×.
    * The total (price, orderkey) order makes rank = row_number = its
    * own peer group, so ntile/percent_rank/cume_dist are closed forms
    * of (rn, n) — RankingSpec pins equality with the window
    * formulation, and the oracle stays the plain window SQL.
    * round(×,6): both engines compute (rank-1)/(n-1) in doubles.
    */
  private val q48: Q = (s, dir) => {
    import graft.ops.Ranking
    val ranked = Ranking.bucketedRowNumber(
      t(s, dir, "orders").select(
        col("o_orderstatus").as("status"),
        col("o_orderkey").as("order_id"),
        col("o_totalprice")),
      "status", "o_totalprice", "order_id", bucketWidth = 10000.0)
    val counts = t(s, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("__n"))
    ranked.join(broadcast(counts), "status").select(
      col("status"),
      col("order_id"),
      Ranking.ntileOf(col("rn"), col("__n"), 4).as("quartile"),
      Ranking.percentRankOf(col("rn"), col("__n")).as("pct_rank"),
      Ranking.cumeDistOf(col("rn"), col("__n")).as("cume"),
    ).orderBy("status", "order_id")
  }

  /** Conditional aggregation (FILTER semantics): one scan computing
    * differently-predicated aggregates side by side — the idiom that
    * replaces N filtered passes over a 100 TB fact with one.
    */
  private val q49: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("o_orderpriority") === "1-URGENT", 1)).as("n_urgent"),
        sum(when(col("o_totalprice") > 200000.0,
          col("o_totalprice").cast(DecimalType(18, 2)))).cast("double").as("sum_high"),
        count(when(col("o_totalprice") > 200000.0, 1)).as("n_high"))
      .orderBy("status")

  /** Deterministic hash sampling: keep keys whose md5-derived 16-bit
    * value ≡ 0 (mod 20) — a reproducible ~5% Bernoulli sample with no
    * shuffle, no RNG state, and identical selection in any engine.
    * TABLESAMPLE is seed/partitioning-dependent; this is the portable,
    * partition-invariant form a 100 TB sample job needs.
    */
  private val q50: Q = (s, dir) =>
    t(s, dir, "orders")
      .filter(conv(substring(md5(col("o_orderkey").cast("string")), 1, 4), 16, 10)
        .cast("long") % 20 === 0)
      .select(col("o_orderkey").as("order_id"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("price"))
      .orderBy("order_id")

  /** Tumbling event-time buckets in batch: Spark's `window()` (epoch-
    * aligned, the same operator Structured Streaming aggregates over);
    * oracle: DuckDB time_bucket, whose 2000-01-01 origin is 6-hour-
    * aligned with the epoch, so the buckets coincide exactly.
    */
  private val q51: Q = (s, dir) =>
    RefQueries.events(s, dir)
      .groupBy(window(col("ts"), "6 hours"))
      .agg(count(lit(1)).as("n"), decSum(col("value")).as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("n"), col("sum_value"))
      .orderBy("bucket_start")

  /** SCD-2 history build ([[Scd2.buildHistory]]): each customer's order-
    * priority timeline collapsed to validity runs with valid_from /
    * valid_to / is_current — the type-2 extension of the reference's
    * type-1 MERGE layer.
    */
  private val q52: Q = (s, dir) =>
    Scd2.buildHistory(t(s, dir, "orders"), "o_custkey", "o_orderpriority",
        "o_orderdate", "o_orderkey")
      .select(
        col("o_custkey").as("cust_id"),
        col("o_orderpriority").as("priority"),
        to_date(col("valid_from")).as("valid_from"),
        to_date(col("valid_to")).as("valid_to"),
        col("is_current").cast("long").as("is_current"))
      .orderBy(col("cust_id"), col("valid_from"),
        col("valid_to").asc_nulls_last, col("priority"))

  /** Order-set fingerprint per customer: sorted collect_list → md5 — the
    * grouped-array summarization pattern (deterministic despite Spark's
    * unordered collection: sort_array canonicalizes before hashing).
    */
  private val q53: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_custkey").as("cust_id"))
      .agg(count(lit(1)).as("n_orders"),
        md5(concat_ws(",",
          transform(sort_array(collect_list(col("o_orderkey"))), _.cast("string"))))
          .as("orders_fp"))
      .orderBy("cust_id")

  /** Fixed-bound histogram: arithmetic bucketing (no shuffle beyond the
    * final 10-group aggregate) — floor(price/50k) capped at bucket 9.
    */
  private val q54: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(least(floor(col("o_totalprice") / 50000.0), lit(9)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("sum_price"))
      .orderBy("bucket")

  /** SimHash near-dup pairs at Hamming ≤ 3 via pigeonhole banding
    * ([[Dedup.simhashNearDup]]) — candidate pairs from a band-slice
    * equi-join, never the O(n²) cross product; the oracle runs the naive
    * quadratic self-join. 32-bit signatures / 8-bit slices: 256 buckets
    * per band keeps candidate density low (16-bit/4-bit profiled 25×
    * more candidates at sf0.1 for the same output).
    */
  /** SimHash near-dup at the CORPUS-SCALE shape: 60-bit signatures
    * (the `conv` ceiling — 15 md5 hex chars), 4 bands of 15-bit slices
    * = 32k buckets per band. Profiled at sf1: with 32-bit/8-bit-slice
    * signatures the banded self-join dominated the query (~6.4 s of
    * 7.1 s; the signature aggregate itself is 0.75 s) because 256
    * buckets per band leave ~19M candidate pairs at 50 k docs. The
    * 15-bit slices cut candidates ~128× for the same pigeonhole
    * guarantee (maxHamming 3 < 4 bands). The oracle is the naive
    * all-pairs Hamming join over the same 60-bit signatures, so the
    * banding is pure optimization under the same contract.
    */
  private val q55: Q = (s, dir) =>
    Dedup.simhashNearDup(t(s, dir, "documents"), "doc_id", "text",
        bits = 60, bands = 4, maxHamming = 3)
      .orderBy("id_a", "id_b")

  /** Approximate sketches (HLL++ count-distinct at 1% rsd, t-digest
    * median) judged by an epsilon CONTRACT: the estimates have no
    * engine-portable exact form, so the query computes them NEXT TO
    * their exact Spark-side counterparts and emits the exact distinct
    * count plus `within_bound` = |approx − exact| ≤ 5%·exact booleans;
    * the oracle recomputes the exact count in DuckDB and emits literal
    * TRUE bounds. A drifting estimator, a broken exact aggregate, or a
    * bound violation all break the hash. (The exact median value itself
    * is not emitted: both engines interpolate it in doubles and could
    * differ in the last bit; the 5% band is float-robust.) eps = 5% is
    * >5σ for the rsd-1% HLL and generous for a 10000-bucket t-digest;
    * `SketchSpec` pins the tighter per-estimator bounds locally.
    */
  private val q56: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    val approx = o.groupBy(col("o_orderstatus").as("status"))
      .agg(
        approx_count_distinct(col("o_custkey"), rsd = 0.01).as("ac"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("am"))
    val exact = o.groupBy(col("o_orderstatus").as("status"))
      .agg(count_distinct(col("o_custkey")).as("exact_cust"),
        expr("percentile(o_totalprice, 0.5)").as("em"))
    approx.join(exact, "status")
      .select(col("status"), col("exact_cust"),
        (abs(col("ac") - col("exact_cust")).cast("double")
          <= col("exact_cust").cast("double") * 0.05).as("cust_within_bound"),
        (abs(col("am") - col("em")) <= abs(col("em")) * 0.05).as("median_within_bound"))
      .orderBy("status")
  }

  /** Duplicate-cluster extraction ([[Dedup.duplicateClusters]]):
    * embedding near-dup pairs (q28's blocking) collapsed to connected
    * components by min-label propagation — the step that turns pairwise
    * similarity into per-document dedup decisions. Oracle: DuckDB
    * recursive-CTE transitive closure, an independent algorithm.
    */
  private val q57: Q = (s, dir) => {
    val pairs = graft.ops.Similarity.nearDupPairs(
      t(s, dir, "embeddings"), "vec_id", "embedding",
      threshold = 0.35, numPlanes = 8, dim = ExtQueries.embDim)
    Dedup.duplicateClusters(pairs)
      .select(col("id").as("vec_id"), col("cluster_id"))
      .orderBy("vec_id")
  }

  /** q57's component extraction by the alternating-star algorithm
    * ([[Dedup.duplicateClustersStar]]) instead of label propagation —
    * the diameter-robust O(log²)-round variant, judged against the same
    * recursive-CTE transitive-closure oracle. Two independently-built
    * distributed algorithms and one independent SQL closure must agree.
    */
  private val q77: Q = (s, dir) => {
    val pairs = graft.ops.Similarity.nearDupPairs(
      t(s, dir, "embeddings"), "vec_id", "embedding",
      threshold = 0.35, numPlanes = 8, dim = ExtQueries.embDim)
    Dedup.duplicateClustersStar(pairs)
      .select(col("id").as("vec_id"), col("cluster_id"))
      .orderBy("vec_id")
  }

  /** Train/val/test split by the same md5 mechanism as q50: an 80/10/10
    * assignment that is reproducible, partition-invariant, and stable
    * under data growth (a row's split never changes when other rows
    * arrive) — the property RNG-based splitters lack.
    */
  private val q58: Q = (s, dir) => {
    val h = conv(substring(md5(col("o_orderkey").cast("string")), 1, 4), 16, 10)
      .cast("long") % 100
    t(s, dir, "orders")
      .select(when(h < 80, "train").when(h < 90, "val").otherwise("test").as("split"),
        col("o_totalprice"))
      .groupBy("split")
      .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("sum_price"))
      .orderBy("split")
  }

  /** RANGE-frame window (q34 covers ROWS frames): per event, the count
    * and sum of the same user's events in the trailing hour — frame
    * membership is by timestamp *value*, so the result is independent of
    * tie order within the frame. The frame runs on exact epoch
    * MICROseconds: second-granularity keys diverge across engines on
    * sub-second data (Spark's `unix_timestamp` floors, DuckDB's
    * `epoch::BIGINT` rounds — observed at sf0.1).
    */
  private val q59: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000 * 1000, Window.currentRow)
    RefQueries.events(s, dir).select(
      col("event_id"), col("user_id"),
      count(lit(1)).over(w).as("n_last_hour"),
      sum(col("value").cast(DecimalType(18, 2))).over(w)
        .cast("double").as("sum_last_hour"),
    ).orderBy("event_id")
  }

  /** Vocabulary head: global top-20 tokens by frequency with document
    * frequency — the term-stats scan every text pipeline runs. Top-k of
    * a grouped count is a two-phase aggregate + a 20-row sort, never a
    * global sort of the vocabulary.
    */
  private val q60: Q = (s, dir) =>
    graft.ops.TextAnalysis.tokenTable(t(s, dir, "documents"), "doc_id", "text")
      .groupBy(col("tok").as("term"))
      .agg(count(lit(1)).as("n"), count_distinct(col("doc_id")).as("df"))
      .orderBy(col("n").desc, col("term"))
      .limit(20)

  /** TF-IDF headline term per document: tf · ln(N/df), ranked on the
    * 6-decimal-rounded score (both engines interpolate ln in doubles;
    * ranking on the rounded value keeps the argmax engine-independent).
    */
  private val q61: Q = (s, dir) => {
    val toks = graft.ops.TextAnalysis.tokenTable(t(s, dir, "documents"), "doc_id", "text")
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = toks.dropDuplicates("doc_id", "tok")
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val nDocs = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "tok").crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("tok").as("top_term"), col("score"))
      .orderBy("doc_id")
  }

  /** Bucketed co-located join: both sides written `bucketBy` the join
    * key, so the join plans with ZERO exchanges on either input — the
    * layout-level answer to repeated fact⋈fact joins at 100 TB (pay the
    * bucketed write once, never shuffle the join again). The only
    * exchanges in this plan belong to the downstream regroup. Oracle
    * joins the original tables: bucketing must not change results.
    */
  /** Build the bucketed table pair ONCE per (pid, source dir) and reuse:
    * repeated invocations (bench iterations, determinism re-runs,
    * concurrent suites — computeIfAbsent serializes the build) would
    * otherwise leak a fresh catalog entry + tmpdir parquet tree each
    * call. Reuse also makes the benched iterations measure the
    * co-located JOIN, which is the point of the layout — the write is
    * the amortized one-time cost. */
  private val bucketedTables =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private val q62: Q = (s, dir) => {
    val (ordersTbl, lineitemTbl) = bucketedTables.computeIfAbsent(dir, _ => {
      val run = s"${ProcessHandle.current().pid()}_${math.abs(dir.hashCode).toString}"
      val base = s"${sys.props("java.io.tmpdir")}/graft_bucketed_$run"
      t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/orders").saveAsTable(s"graft_b_orders_$run")
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/lineitem").saveAsTable(s"graft_b_lineitem_$run")
      (s"graft_b_orders_$run", s"graft_b_lineitem_$run")
    })
    s.table(ordersTbl)
      .join(s.table(lineitemTbl), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("cust_id"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
      .orderBy("cust_id")
  }

  /** Moment statistics per group: population stddev/variance and
    * Pearson correlation — the profiling aggregates (population forms:
    * their definition is engine-independent; sample-kurtosis/skewness
    * bias corrections differ between engines and are deliberately
    * excluded). round(,6): Welford vs textbook accumulation differ in
    * the last ulps.
    */
  private val q63: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag").as("flag"))
      .agg(
        count(lit(1)).as("n"),
        round(stddev_pop(col("l_quantity")), 6).as("sd_qty"),
        round(var_pop(col("l_discount")), 6).as("var_disc"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"))
      .orderBy("flag")

  /** Date arithmetic over the order→ship lineage: per order month, the
    * shipping-latency profile (datediff in days; integer sums, so the
    * average divides exactly the same in both engines).
    */
  private val q64: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("order_ym"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("lat"))
      .groupBy("order_ym")
      .agg(count(lit(1)).as("n"),
        min(col("lat")).cast("long").as("min_days"),
        max(col("lat")).cast("long").as("max_days"),
        (sum(col("lat")).cast("double") / count(lit(1))).as("avg_days"))
      .orderBy("order_ym")

  /** Date-spine densification: a generated calendar (sequence/explode —
    * no input scan) left-joined to per-day order counts, zeros filled —
    * the standard fix for "missing days break the time series". The
    * spine generator is O(days) on one executor and broadcasts.
    */
  private val q65: Q = (s, dir) => {
    val spine = s.range(1)
      .select(explode(sequence(
        to_date(lit("1997-01-01")), to_date(lit("1997-03-31")))).as("day"))
    val daily = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("cnt"), lit(0L)).as("n_orders"))
      .orderBy("day")
  }

  /** Forward-fill gap filling: the last non-null observation carries
    * forward (`last_value IGNORE NULLS` over an unbounded-preceding ROWS
    * frame) — the time-series repair op. Nulls are injected
    * deterministically (error events lose their value) so both engines
    * fill the same gaps.
    */
  private val q66: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    RefQueries.events(s, dir)
      .withColumn("v", when(col("event_type") =!= "error", col("value")))
      .select(col("event_id"), col("user_id"),
        last(col("v"), ignoreNulls = true).over(w).as("filled_value"))
      .orderBy("event_id")
  }

  /** Share-of-total (percent-of-grand-total per nation): the total is an
    * aggregate broadcast back as a 1-row cross join — NOT a
    * `Window.partitionBy()` with no keys, which would funnel the whole
    * dataset through a single partition. Share arithmetic runs on exact
    * decimal sums; only the final ratio is floating (rounded).
    */
  private val q67: Q = (s, dir) => {
    // persist the ~25-row aggregate: it feeds BOTH the total and the
    // final select — unpersisted, the full customer scan would run twice
    val byNation = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation_name"))
      .agg(sum(col("c_acctbal").cast(DecimalType(18, 2))).as("bal"),
        count(lit(1)).as("n_cust"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = byNation.agg(sum(col("bal")).as("total_bal"))
    val shares = byNation.crossJoin(broadcast(total))
      .select(col("nation_name"), col("n_cust"),
        col("bal").cast("double").as("sum_bal"),
        round(col("bal").cast("double") / col("total_bal").cast("double"), 6).as("share"))
      .orderBy("nation_name")
    // materialize the |nations|-row result, release the aggregate pin
    // (graft.ops.CacheLifecycle's un-persist-on-completion contract)
    graft.ops.CacheLifecycle.resolveAndRelease(shares, byNation)
  }

  /** The full text-dedup composition: MinHash near-dup pairs (q21) →
    * connected components (q57's propagation) → one cluster id per
    * involved document — what a pipeline actually persists before
    * dropping duplicates. Oracle: the q21 pair CTEs + recursive-CTE
    * closure.
    */
  private val q68: Q = (s, dir) => {
    val pairs = Dedup.nearDuplicates(t(s, dir, "documents"), "doc_id", "text",
      threshold = 0.5, numHashes = 8, bands = 4, shingleK = 3)
    Dedup.duplicateClusters(pairs)
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy("doc_id")
  }

  /** Incremental-distinct via mergeable HLL sketches: one Datasketches
    * HLL per day (the unit a warehouse would persist), then a sketch
    * union + estimate across days — how "distinct users ever" stays a
    * per-batch increment at 100 TB instead of a full-history rescan.
    * Sketch merge is commutative/idempotent, so the estimate is
    * partition- and order-invariant. Judged by the same epsilon contract
    * as q56: the merged estimate is compared Spark-side against the
    * exact distinct count and emitted as a `within_bound` boolean (the
    * oracle recomputes the exact count and emits literal TRUE);
    * `SketchSpec` pins the tighter error bound locally.
    */
  private val q69: Q = (s, dir) => {
    val ev = RefQueries.events(s, dir)
    val daily = ev
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"), count(lit(1)).as("n"))
    val merged = daily.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
      sum(col("n")).as("n_events"),
      count(lit(1)).cast("long").as("n_days"))
    val exact = ev.agg(count_distinct(col("user_id")).as("exact_distinct_users"))
    merged.crossJoin(broadcast(exact))
      .select(col("n_events"), col("n_days"), col("exact_distinct_users"),
        (abs(col("est") - col("exact_distinct_users")).cast("double")
          <= col("exact_distinct_users").cast("double") * 0.05).as("within_bound"))
  }

  /** Stratified sampling: per-stratum rates (BUILDING 10%, others 5%)
    * via the same md5 selector as q50 — a pure filter, no shuffle, no
    * RNG, reproducible row-for-row in any engine; the stratum only picks
    * the modulus. This is how a 100 TB corpus gets a class-balanced
    * sample in one scan.
    */
  private val q70: Q = (s, dir) => {
    val h = conv(substring(md5(col("c_custkey").cast("string")), 1, 4), 16, 10)
      .cast("long")
    val keep = when(col("c_mktsegment") === "BUILDING", h % 10 === 0)
      .otherwise(h % 20 === 0)
    t(s, dir, "customer")
      .filter(keep)
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_sampled"),
        decSum(col("c_acctbal")).as("sum_bal"))
      .orderBy("segment")
  }

  /** Forward as-of join ([[graft.ops.AsOfJoin.asOfForward]]): each
    * signup enriched with the user's NEXT purchase at-or-after it —
    * q33's mirror (nearest-later instead of nearest-earlier). Oracle:
    * DuckDB ASOF JOIN with a `<=` condition.
    */
  private val q71: Q = (s, dir) => {
    val ev = RefQueries.events(s, dir)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_event_id"),
        col("value").as("purchase_value"))
    graft.ops.AsOfJoin.asOfForward(signups, purchases, Seq("user_id"), "ts", "ts",
        bucketSeconds = Some(86400L))
      .select(col("signup_event_id"), col("user_id"),
        col("asof_purchase_event_id").as("purchase_event_id"),
        col("asof_purchase_value").as("purchase_value"))
      .orderBy("signup_event_id")
  }

  val all: Map[String, Q] = Map(
    "q45_range_join" -> q45,
    "q46_grouping_sets" -> q46,
    "q47_unpivot" -> q47,
    "q48_distribution_windows" -> q48,
    "q49_conditional_agg" -> q49,
    "q50_hash_sample" -> q50,
    "q51_time_bucket" -> q51,
    "q52_scd2" -> q52,
    "q53_collect_fingerprint" -> q53,
    "q54_histogram" -> q54,
    "q55_simhash_neardup" -> q55,
    "q56_approx_sketch" -> q56,
    "q57_dup_clusters" -> q57,
    "q58_train_split" -> q58,
    "q59_range_frame" -> q59,
    "q60_top_terms" -> q60,
    "q61_tfidf" -> q61,
    "q62_bucketed_join" -> q62,
    "q63_moment_stats" -> q63,
    "q64_date_arith" -> q64,
    "q65_date_spine" -> q65,
    "q66_forward_fill" -> q66,
    "q67_share_of_total" -> q67,
    "q68_minhash_clusters" -> q68,
    "q69_hll_merge" -> q69,
    "q70_stratified_sample" -> q70,
    "q71_asof_forward" -> q71,
    "q77_star_clusters" -> q77,
  )

  // ----------------------------------------------------------------- oracle

  /** DuckDB: integer value of the first `n` hex chars of md5(`e`) — the
    * generalized form of [[ExtQueries]]'s portable hex4. */
  private def duckHexN(e: String, n: Int): String =
    (1 to n).map(i =>
      s"(strpos('0123456789abcdef', substr(md5($e),$i,1))-1)::BIGINT*${1L << (4 * (n - i))}")
      .mkString("(", " + ", ")")

  private def duckHex4(e: String): String = duckHexN(e, 4)

  /** The [[Dedup.simhashTable]] pipeline at `bits` width as a reusable
    * CTE block ending in `sig(doc_id, simhash)`. */
  private def simhashCtes(bits: Int) =
    s"""w AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w FROM documents),
       |tok AS (SELECT doc_id, u.t AS t FROM w, UNNEST(w.w) AS u(t)),
       |v AS (SELECT doc_id, ${duckHexN("t", bits / 4)} AS v FROM tok),
       |b AS (SELECT doc_id, g.bit AS bit,
       |             sum(CASE WHEN (v >> g.bit) & 1 = 1 THEN 1 ELSE -1 END) AS sgn
       |      FROM v, UNNEST(generate_series(0, ${bits - 1})) AS g(bit)
       |      GROUP BY 1, 2),
       |sig AS (SELECT doc_id,
       |               CAST(sum(CASE WHEN sgn > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
       |        FROM b GROUP BY 1)""".stripMargin

  /** DuckDB recursive-CTE transitive closure over the embedding near-dup
    * pairs — the shared algorithm-independent oracle for q57
    * (propagation) and q77 (alternating star).
    */
  private lazy val dupClustersOracle: String =
    s"""WITH RECURSIVE ${ExtQueries.embCte},
       |b AS (SELECT vec_id, v, ${ExtQueries.duckBucket(ExtQueries.planes8)} AS bucket,
       |             sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |pairs AS (
       |  SELECT a.vec_id AS id_a, bb.vec_id AS id_b
       |  FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
       |  WHERE round(list_dot_product(a.v, bb.v) / (a.nrm * bb.nrm), 6) >= 0.35),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |r(id, reach) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.reach FROM edges e JOIN r ON e.dst = r.id)
       |SELECT id AS vec_id, min(reach) AS cluster_id
       |FROM r GROUP BY id ORDER BY vec_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q45_range_join" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS iv_id, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM nation JOIN orders
        |  ON o_totalprice >= n_nationkey * 10000.0
        | AND o_totalprice <  n_nationkey * 10000.0 + 15000.0
        |GROUP BY 1 ORDER BY iv_id""".stripMargin,

    "q46_grouping_sets" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS priority,
        |       count(*) AS n,
        |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status ASC NULLS FIRST, priority ASC NULLS FIRST""".stripMargin,

    "q47_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,

    "q48_distribution_windows" ->
      """SELECT o_orderstatus AS status, o_orderkey AS order_id,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       round(percent_rank() OVER w, 6) AS pct_rank,
        |       round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY status, order_id""".stripMargin,

    "q49_conditional_agg" ->
      """SELECT o_orderstatus AS status, count(*) AS n,
        |       count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent,
        |       CAST(sum(CASE WHEN o_totalprice > 200000.0
        |                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_high,
        |       count(CASE WHEN o_totalprice > 200000.0 THEN 1 END) AS n_high
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,

    "q50_hash_sample" ->
      s"""SELECT o_orderkey AS order_id, o_orderstatus AS status, o_totalprice AS price
         |FROM orders
         |WHERE ${duckHex4("CAST(o_orderkey AS VARCHAR)")} % 20 = 0
         |ORDER BY order_id""".stripMargin,

    "q51_time_bucket" ->
      """SELECT time_bucket(INTERVAL '6 hours', CAST(ts AS TIMESTAMP)) AS bucket_start,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY bucket_start""".stripMargin,

    "q52_scd2" ->
      """WITH ordered AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
        |         lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |runs AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
        |  FROM ordered WHERE prev IS NULL OR prev <> o_orderpriority)
        |SELECT o_custkey AS cust_id, o_orderpriority AS priority,
        |       CAST(o_orderdate AS DATE) AS valid_from,
        |       CAST(lead(o_orderdate) OVER w2 AS DATE) AS valid_to,
        |       CAST(CASE WHEN lead(o_orderdate) OVER w2 IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM runs
        |WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY cust_id, valid_from, valid_to ASC NULLS LAST, priority""".stripMargin,

    "q53_collect_fingerprint" ->
      """SELECT o_custkey AS cust_id, count(*) AS n_orders,
        |       md5(array_to_string(list_sort(list(o_orderkey)), ',')) AS orders_fp
        |FROM orders GROUP BY 1 ORDER BY cust_id""".stripMargin,

    "q54_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 50000.0), 9) AS BIGINT) AS bucket,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q55_simhash_neardup" ->
      s"""WITH ${simhashCtes(60)}
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    // q56/q69 epsilon contracts: the oracle re-derives the EXACT values
    // and asserts the bound columns are literally true — the estimator
    // itself is checked Spark-side against the exact aggregate.
    "q56_approx_sketch" ->
      """SELECT o_orderstatus AS status,
        |       count(DISTINCT o_custkey) AS exact_cust,
        |       true AS cust_within_bound,
        |       true AS median_within_bound
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,

    "q69_hll_merge" ->
      """SELECT count(*) AS n_events,
        |       count(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS n_days,
        |       count(DISTINCT user_id) AS exact_distinct_users,
        |       true AS within_bound
        |FROM events""".stripMargin,

    "q57_dup_clusters" -> dupClustersOracle,

    // q77 runs the alternating-star algorithm against the SAME closure
    // oracle as q57's propagation — algorithm-independent ground truth
    "q77_star_clusters" -> dupClustersOracle,

    "q58_train_split" ->
      s"""SELECT CASE WHEN ${duckHex4("CAST(o_orderkey AS VARCHAR)")} % 100 < 80 THEN 'train'
         |            WHEN ${duckHex4("CAST(o_orderkey AS VARCHAR)")} % 100 < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |       count(*) AS n,
         |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         |FROM orders GROUP BY 1 ORDER BY split""".stripMargin,

    "q59_range_frame" ->
      """SELECT event_id, user_id,
        |       count(*) OVER w AS n_last_hour,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_last_hour
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q60_top_terms" ->
      s"""WITH ${ExtQueries.tokensCte},
         |tok AS (SELECT doc_id, u.t AS term FROM w, UNNEST(w.w) AS u(t))
         |SELECT term, count(*) AS n, count(DISTINCT doc_id) AS df
         |FROM tok GROUP BY 1
         |ORDER BY n DESC, term LIMIT 20""".stripMargin,

    "q61_tfidf" ->
      s"""WITH ${ExtQueries.tokensCte},
         |tok AS (SELECT doc_id, u.t AS tok FROM w, UNNEST(w.w) AS u(t)),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.tok,
         |         round(CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE)), 6) AS score
         |  FROM tf JOIN dfreq ON tf.tok = dfreq.tok, n),
         |ranked AS (
         |  SELECT doc_id, tok, score,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rn
         |  FROM scored)
         |SELECT doc_id, tok AS top_term, score
         |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q62_bucketed_join" ->
      """SELECT o_custkey AS cust_id, count(*) AS n_items, sum(l_quantity) AS sum_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY cust_id""".stripMargin,

    "q63_moment_stats" ->
      """SELECT l_returnflag AS flag, count(*) AS n,
        |       round(stddev_pop(l_quantity), 6) AS sd_qty,
        |       round(var_pop(l_discount), 6) AS var_disc,
        |       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
        |FROM lineitem GROUP BY 1 ORDER BY flag""".stripMargin,

    "q64_date_arith" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_ym, count(*) AS n,
        |       CAST(min(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS min_days,
        |       CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS max_days,
        |       CAST(sum(date_diff('day', o_orderdate, l_shipdate)) AS DOUBLE) / count(*) AS avg_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY order_ym""".stripMargin,

    "q65_date_spine" ->
      """WITH spine AS (
        |  SELECT CAST(g.d AS DATE) AS day
        |  FROM generate_series(DATE '1997-01-01', DATE '1997-03-31', INTERVAL 1 DAY) AS g(d)),
        |daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS cnt
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT spine.day AS day, COALESCE(cnt, 0) AS n_orders
        |FROM spine LEFT JOIN daily ON spine.day = daily.day
        |ORDER BY spine.day""".stripMargin,

    "q66_forward_fill" ->
      """SELECT event_id, user_id,
        |       last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q67_share_of_total" ->
      """WITH by_nation AS (
        |  SELECT n_name AS nation_name,
        |         sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal,
        |         count(*) AS n_cust
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1),
        |total AS (SELECT sum(bal) AS total_bal FROM by_nation)
        |SELECT nation_name, n_cust, CAST(bal AS DOUBLE) AS sum_bal,
        |       round(CAST(bal AS DOUBLE) / CAST(total_bal AS DOUBLE), 6) AS share
        |FROM by_nation, total
        |ORDER BY nation_name""".stripMargin,

    "q68_minhash_clusters" ->
      s"""WITH RECURSIVE ${ExtQueries.minhashPairCtes},
         |edges AS (SELECT id_a AS src, id_b AS dst FROM mpairs
         |          UNION SELECT id_b, id_a FROM mpairs),
         |r(id, reach) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.reach FROM edges e JOIN r ON e.dst = r.id)
         |SELECT id AS doc_id, min(reach) AS cluster_id
         |FROM r GROUP BY id ORDER BY doc_id""".stripMargin,

    "q70_stratified_sample" ->
      s"""SELECT c_mktsegment AS segment, count(*) AS n_sampled,
         |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
         |FROM customer
         |WHERE CASE WHEN c_mktsegment = 'BUILDING'
         |           THEN ${duckHex4("CAST(c_custkey AS VARCHAR)")} % 10 = 0
         |           ELSE ${duckHex4("CAST(c_custkey AS VARCHAR)")} % 20 = 0 END
         |GROUP BY 1 ORDER BY segment""".stripMargin,

    "q71_asof_forward" ->
      """SELECT a.event_id AS signup_event_id, a.user_id,
        |       b.event_id AS purchase_event_id, b.value AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'signup') a
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
        |  ON a.user_id = b.user_id AND a.ts <= b.ts
        |ORDER BY signup_event_id""".stripMargin,
  )
}
