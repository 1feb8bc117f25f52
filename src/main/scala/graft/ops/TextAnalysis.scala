package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, document
  * fingerprinting.
  *
  * Everything here is pure `Column` algebra over built-in (codegen'd)
  * functions — no UDFs — so at 100 TB the whole stage stays inside
  * whole-stage codegen and never serializes a row to the JVM heap beyond
  * the scan batch.
  */
object TextAnalysis {

  /** Lowercased whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Token relation: one row per (id, token), in-document order dropped.
    * The explode-first form of [[tokens]]: `explode(split(...))` + a row
    * filter are all codegen'd, where the array higher-order `filter`
    * evaluates interpreted. Measured steady-state at sf0.1 (ProfileForms,
    * 2026-08-12): the full q23 quality pipeline runs 0.37 s relational
    * vs 0.55 s Column/HOF (1.5x); the gap widens with the number of
    * aggregates sharing one token pass. Build token aggregates on this.
    */
  def tokenTable(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), explode(split(lower(col(textCol)), " ")).as("tok"))
      .filter(col("tok") =!= "")

  /** Per-document token-distribution (Shannon) entropy in nats:
    * H = ln n − (Σ_t c_t·ln c_t)/n over the token frequencies — the
    * cheap perplexity proxy a curation pipeline uses to catch
    * degenerate text from both ends (H ≈ 0: one token repeated; high
    * H at a given length: near-unique tokens, i.e. noise/UUID soup).
    *
    * Scale shape: two grouped aggregations over the token relation
    * (per-(doc, token) counts, then per-doc), both map-side combined —
    * no windows, no corpus-wide state. Cross-engine determinism: each
    * c·ln c term is computed in doubles on identical integer operands,
    * rounded to 9 and summed as DECIMAL (order-invariant — the q95
    * discipline for ln-bearing sums); the final entropy rounds to 6.
    * Tokenless documents are absent from the output (H undefined).
    */
  def tokenEntropy(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val tf = tokenTable(df, idCol, textCol)
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
    tf.groupBy(col(idCol))
      .agg(sum(col("c")).as("n"),
        sum(round(col("c").cast("double") * log(col("c").cast("double")), 9)
          .cast(org.apache.spark.sql.types.DecimalType(28, 10))).as("s"))
      .select(col(idCol),
        round(log(col("n").cast("double")) -
          col("s").cast("double") / col("n").cast("double"), 6)
          .as("token_entropy"))
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: alpha runs, digit runs, and single
    * non-alphanumeric marks each count as one token — a cheap,
    * deterministic proxy for a learned tokenizer's length.
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

  /** Count of stopword tokens (with multiplicity). */
  def stopwordCount(toks: Column, stop: Seq[String] = defaultStopwords): Column =
    size(filter(toks, t => t.isin(stop.map(x => x: Any): _*))).cast("long")

  /** Mean token length — characters-without-spaces over token count. */
  def avgTokenLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") /
      size(tokens(text)).cast("double")

  /** Composite quality score in [0,1]: stopword presence (natural prose
    * has some) + length saturation. Rational arithmetic only, so the
    * value is bit-reproducible across engines.
    */
  def qualityScore(text: Column, stop: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val stopRatio = stopwordCount(toks, stop).cast("double") / n
    val lengthSat = least(n / lit(100.0), lit(1.0))
    stopRatio * lit(0.5) + lengthSat * lit(0.5)
  }

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Alphabetical tie-break on the language code.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und"),
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "los"),
    "fr" -> Seq("le", "la", "et"),
  )

  /** Heuristic language ID: argmax of marker-token hits, ties broken by
    * alphabetical language code, no hits → 'und' (undetermined).
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val counts = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers.map(x => x: Any): _*)))
    }
    val maxC = greatest(counts.map(_._2): _*)
    counts.foldRight(lit("und")) { case ((lang, c), acc) =>
      when(maxC > 0 && c === maxC, lit(lang)).otherwise(acc)
    }
  }

  /** Character-bigram profiles per language for the n-gram language-ID
    * variant: high-frequency bigrams drawn from each language's
    * orthography (space marks word boundaries).
    */
  val charBigramProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("ch", "ei", "en", "er", "ie", "nd", "sc", "un", "de", "ge"),
    "en" -> Seq("th", "he", "in", "er", "an", "re", "on", "at", "ng", "of"),
    "es" -> Seq("de", "la", "os", "en", "ar", "el", "es", "ue", "ci", "ón"),
    "fr" -> Seq("es", "le", "de", "en", "re", "nt", "ou", "qu", "ai", "eu"),
  )

  /** Distinct character bigrams of the lowercased text. */
  def charBigrams(text: Column): Column = {
    val t = lower(text)
    val idx = when(length(t) >= 2, sequence(lit(1), length(t) - 1))
      .otherwise(array().cast("array<int>"))
    array_distinct(transform(idx, i => t.substr(i, lit(2))))
  }

  /** n-gram language ID: argmax over languages of |text bigrams ∩
    * profile bigrams|, alphabetical tie-break, 'und' when nothing
    * overlaps. Complements the marker-word [[langId]]: bigrams survive
    * unseen vocabulary, markers survive shared orthography.
    */
  def langIdCharNgram(text: Column): Column = {
    val grams = charBigrams(text)
    val scores = charBigramProfiles.map { case (lang, profile) =>
      lang -> size(array_intersect(grams, typedlit(profile)))
    }
    val maxC = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, c), acc) =>
      when(maxC > 0 && c === maxC, lit(lang)).otherwise(acc)
    }
  }

  /** Order-insensitive document fingerprint: md5 over the sorted distinct
    * token set. Survives token reordering and duplication — the classic
    * "fingerprint" canonicalization.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Order-sensitive rolling fingerprint: polynomial combination of
    * per-token crc32 values (base 31, 64-bit wraparound). Distinguishes
    * permutations that [[fingerprint]] deliberately collapses.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc * lit(31L) + crc32(t).cast("long"))

  /** PII scrub patterns — deliberately restricted to syntax that means
    * the same thing in Java regex (Spark) and RE2 (DuckDB, Go tooling):
    * character classes, bounded repetition, alternation; no backrefs,
    * no lookaround. A pattern that can't be mirrored in the oracle
    * can't be judged.
    */
  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val urlPattern = "https?://[^ ]+"
  val phonePattern = "\\+[0-9]{7,15}"

  /** PII redaction for pretraining text: URLs, then emails, then
    * international-format phone numbers, each replaced by a typed
    * placeholder token (URL first — URLs may embed '@' userinfo that
    * the email pass would otherwise shred mid-string). Pure
    * `regexp_replace` chain: codegen'd, no UDF, scales as a narrow map
    * over the corpus with zero shuffle.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, urlPattern, "<URL>"),
        emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** Token-bigram relation WITH multiplicity: one row per in-document
    * bigram occurrence (id, bg). Same explode-first + window-`lead`
    * shape as [[Dedup.shingleTable]] (all codegen'd, one keyed shuffle)
    * but occurrences are kept — repetition measures need counts, not
    * sets.
    */
  def bigramTable(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val tok = df
      .select(col(idCol),
        posexplode(split(lower(col(textCol)), " ")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    tok
      .select(col(idCol),
        concat_ws(" ", col("tok"), lead(col("tok"), 1).over(w)).as("bg"),
        lead(col("tok"), 1).over(w).isNotNull.as("full"))
      .filter(col("full"))
      .select(col(idCol), col("bg"))
  }

  /** Gopher-style repetition signals per document — the "is this doc
    * degenerate boilerplate?" quality gate (Rae et al. 2021, §A1.1
    * repetition filters, adapted to word n-grams):
    *   - `dup_token_frac`: fraction of token occurrences that are
    *     repeats of an earlier token (1 - distinct/total);
    *   - `dup_bigram_frac`: same over token bigrams;
    *   - `top_bigram_frac`: occurrences of the single most frequent
    *     bigram over all bigram occurrences.
    * High values ⇒ looping/templated text. Two grouped aggregates over
    * the token and bigram relations (map-side combined, one keyed
    * shuffle each) joined on the doc id — no pair space, no UDFs.
    */
  def repetitionSignals(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val tokSig = tokenTable(df, idCol, textCol)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"), count_distinct(col("tok")).as("n_tok_d"))
      .select(col(idCol),
        ((col("n_tok") - col("n_tok_d")).cast("double") /
          col("n_tok").cast("double")).as("dup_token_frac"))
    val bgCounts = bigramTable(df, idCol, textCol)
      .groupBy(idCol, "bg").agg(count(lit(1)).as("c"))
    val bgSig = bgCounts.groupBy(idCol)
      .agg(sum(col("c")).as("n_bg"), count(lit(1)).as("n_bg_d"),
        max(col("c")).as("max_bg"))
      .select(col(idCol),
        ((col("n_bg") - col("n_bg_d")).cast("double") /
          col("n_bg").cast("double")).as("dup_bigram_frac"),
        (col("max_bg").cast("double") / col("n_bg").cast("double"))
          .as("top_bigram_frac"))
    tokSig.join(bgSig, Seq(idCol), "left")
      .select(col(idCol), col("dup_token_frac"),
        coalesce(col("dup_bigram_frac"), lit(0.0)).as("dup_bigram_frac"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"))
  }

  /** CROSS-document duplicated-span coverage — the `dup_frac` signal of
    * the RefinedWeb/Dolma curation recipes: for each document, the
    * fraction of its tokens covered by at least one k-token span that
    * also occurs in ANOTHER document (within-doc repeats don't count —
    * [[repetitionSignals]] carries those). Boilerplate, mirrored pages
    * and templated text light this up; exact-duplicate docs score 1.0.
    *
    * Scale shape: the positioned k-gram relation is corpus-token-
    * proportional (ONE row per position, never ×k); duplicated grams
    * come from a grouped distinct-doc count (map-side combined); and
    * coverage is computed by MERGED-INTERVAL arithmetic — a per-doc
    * window over the doc's duplicated spans ordered by start position,
    * where each span contributes `max(0, end − max(prevMaxEnd, start−1))`
    * new covered tokens. That keeps the whole computation free of the
    * naive ×k position explosion at every stage. Integer arithmetic
    * end-to-end until the final 6-decimal ratio.
    */
  def dupSpanCoverage(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 5): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the gram relation feeds BOTH the df aggregate and the coverage
    // join; base feeds the grams and the final length join — pin both
    // so the corpus is tokenized once, not once per consumer (released
    // on completion, the CacheLifecycle contract)
    val base = df
      .select(col(idCol), tokens(col(textCol)).as("w"))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .filter(col("n_tokens") >= 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grams = base.filter(size(col("w")) >= k)
      .select(col(idCol), posexplode(transform(
        sequence(lit(1), size(col("w")) - (k - 1)),
        i => concat_ws(" ", slice(col("w"), i, lit(k))))).as(Seq("p0", "gram")))
      .select(col(idCol), (col("p0") + 1).cast("long").as("i"), col("gram"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dupGrams = grams.groupBy(col("gram"))
      .agg(countDistinct(col(idCol)).as("gdf"))
      .filter(col("gdf") >= 2)
      .select(col("gram"))
    val prevEnd = Window.partitionBy(col(idCol)).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cov = grams.join(dupGrams, "gram")
      .select(col(idCol), col("i"), (col("i") + (k - 1)).as("e"))
      .withColumn("newCov", greatest(lit(0L),
        col("e") - greatest(coalesce(max(col("e")).over(prevEnd), lit(0L)),
          col("i") - 1)))
      .groupBy(col(idCol)).agg(sum(col("newCov")).as("dup_tokens"))
    val result = base.select(col(idCol), col("n_tokens"))
      .join(cov, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          col("n_tokens").cast("double"), 6).as("dup_frac"))
    CacheLifecycle.resolveAndRelease(result, base, grams)
  }

  /** Duplicated-span EXCISION — the transform half of [[dupSpanCoverage]]
    * (which only measures): every occurrence of a duplicated k-token
    * span EXCEPT the globally-first one is removed from the token
    * stream, and the surviving tokens are re-joined into `clean_text`.
    * This is the relational form of the exact-substring deduplication
    * recipe (suffix-array dedup in the single-node literature): the
    * duplicated-substring relation is exactly the k-gram relation with
    * occurrence count ≥ 2, the "first occurrence" keeper is the
    * lexicographic min over (doc, position), and overlapping excised
    * spans merge through the same event-stream coverage arithmetic.
    *
    * Semantics (deterministic, oracle-replayable):
    *  - grams are positioned k-token windows over the whitespace token
    *    stream (within-doc repeats COUNT as duplicates, unlike the
    *    cross-doc-only [[dupSpanCoverage]] signal);
    *  - per gram, the keeper occurrence is min(doc, pos); every other
    *    occurrence marks its k-token range for removal;
    *  - a token survives iff no removal interval covers its position;
    *  - `clean_text` is the surviving tokens joined by single spaces in
    *    original order ('' when nothing survives — the doc row never
    *    disappears, so downstream curation sees the empty husk and can
    *    drop it by policy).
    *
    * Scale shape: the keeper is a grouped min-struct aggregate over the
    * gram relation — map-side combined, NO per-gram window, so a
    * boilerplate gram shared by millions of documents costs one
    * combiner cell, not a million-row sorted window partition. Coverage
    * is the per-DOC event-stream window (interval starts and token
    * positions interleaved, running max of interval ends): one shuffle
    * by doc id, linear in doc length. Text reassembly is a per-doc
    * sort_array over surviving tokens — bounded by document length,
    * never corpus-wide.
    */
  def exciseDupSpans(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 5): org.apache.spark.sql.DataFrame = {
    val (result, base, grams) = exciseDupSpansPlan(df, idCol, textCol, k)
    CacheLifecycle.resolveAndRelease(result, base, grams)
  }

  /** The lazy plan behind [[exciseDupSpans]] (result, pinned base,
    * pinned grams) — exposed so the plan-guard spec can pin that the
    * keeper is a grouped aggregate, never a per-gram window (the
    * public method materializes through a checkpoint, which erases
    * the plan).
    */
  private[graft] def exciseDupSpansPlan(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, k: Int): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .select(col(idCol), tokens(col(textCol)).as("w"))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .filter(col("n_tokens") >= 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grams = base.filter(size(col("w")) >= k)
      .select(col(idCol), posexplode(transform(
        sequence(lit(1), size(col("w")) - (k - 1)),
        i => concat_ws(" ", slice(col("w"), i, lit(k))))).as(Seq("p0", "gram")))
      .select(col(idCol), (col("p0") + 1).cast("long").as("i"), col("gram"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // keeper per duplicated gram: lexicographic min over (doc, pos) as a
    // grouped struct-min — map-side combinable, skew-immune (a hot gram
    // is one combiner cell per task, not a sorted window partition)
    val keepers = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("occ"),
        min(struct(col(idCol).as("kid"), col("i").as("ki"))).as("kp"))
      .filter(col("occ") >= 2)
      .select(col("gram"), col("kp.kid").as("kid"), col("kp.ki").as("ki"))
    val excised = grams.join(keepers, "gram")
      .filter(!(col(idCol) === col("kid") && col("i") === col("ki")))
      .select(col(idCol), col("i"), (col("i") + (k - 1)).as("e"))
    // event-stream coverage: interval starts (kind 0) sort before token
    // positions (kind 1) at the same position; a token is covered iff
    // the running max of interval ends reaches it
    val toks = base
      .select(col(idCol), posexplode(col("w")).as(Seq("p0", "tok")))
      .select(col(idCol), (col("p0") + 1).cast("long").as("pos"), col("tok"))
    val ev = excised.select(col(idCol), col("i").as("pos"), col("e"),
        lit(0).as("kind"), lit(null).cast("string").as("tok"))
      .unionByName(toks.select(col(idCol), col("pos"),
        lit(null).cast("long").as("e"), lit(1).as("kind"), col("tok")))
    val runEnd = Window.partitionBy(col(idCol))
      .orderBy(col("pos"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = ev
      .withColumn("covEnd", max(col("e")).over(runEnd))
      .filter(col("kind") === 1 &&
        (col("covEnd").isNull || col("covEnd") < col("pos")))
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("clean_text"))
    val result = base.select(col(idCol), col("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
    (result, base, grams)
  }

  /** One-pass corpus DATA CARD grouped by `groupCol` — the audit table
    * that ships with a released training corpus (the datasheet/data-
    * card practice): per group, document and token volumes, the
    * exact-duplicate share (docs whose md5(text) is held by ≥ 2 docs
    * ANYWHERE in the corpus — cross-group duplicates count for every
    * group holding a copy, since each has redundant text), and the
    * short-document share (< `minTokens` whitespace tokens — the
    * husk fraction a length gate would drop).
    *
    * Scale shape: one projection computes (group, n_tok, md5) inside
    * the scan's codegen span; duplicate multiplicity is a hash-groupBy
    * on the md5 (uniform keys by construction) joined back ON the
    * hash — an equi-shuffle, never a self-join of text; the card is a
    * final |groups|-row aggregate. Ratios round at 6 (the cross-engine
    * float discipline).
    */
  def datacard(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, groupCol: String,
      minTokens: Int = 10): org.apache.spark.sql.DataFrame = {
    val base = df.select(col(groupCol),
      size(tokens(col(textCol))).cast("long").as("n_tok"),
      md5(col(textCol)).as("h"))
    val mult = base.groupBy(col("h")).agg(count(lit(1)).as("nh"))
    base.join(mult, "h")
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        round(sum(col("n_tok")).cast("double") /
          count(lit(1)).cast("double"), 6).as("avg_tokens"),
        sum(when(col("nh") >= 2, 1L).otherwise(0L)).as("dup_docs"),
        round(sum(when(col("nh") >= 2, 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 6).as("dup_frac"),
        sum(when(col("n_tok") < minTokens, 1L).otherwise(0L))
          .as("short_docs"),
        round(sum(when(col("n_tok") < minTokens, 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double"), 6)
          .as("short_frac"))
  }
}
