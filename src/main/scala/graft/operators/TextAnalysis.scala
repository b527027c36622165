package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, document fingerprinting, language ID. All pure
  * column algebra (whole-stage-codegen'd), one scan, no shuffle except
  * where an aggregate genuinely needs one.
  */
object TextAnalysis {

  val StopWords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

  /** Token counting: whitespace tokens and a BPE-ish regex token count
    * (alnum runs + single non-space punctuation marks).
    */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    tokenCounts(Tables.documents(spark, dir))

  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_m"),
      size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-zA-Z0-9]+', 0)"))
        .cast("long").as("n_re_tokens"))

  /** Quality scoring: length, stopword ratio, distinct-token ratio,
    * mean token length, and a deterministic composite score.
    */
  def qualityScores(spark: SparkSession, dir: String): DataFrame =
    qualityScores(Tables.documents(spark, dir))

  def qualityScores(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("double")
    val stopRatio = size(filter(toks,
      t => t.isin(StopWords.map(_.asInstanceOf[Any]): _*))).cast("double") / nTok
    val uniqRatio = size(array_distinct(toks)).cast("double") / nTok
    val meanTokLen = (length(col("text")) - (size(toks) - 1)).cast("double") / nTok
    docs.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      round(stopRatio, 6).as("stop_ratio"),
      round(uniqRatio, 6).as("uniq_ratio"),
      round(meanTokLen, 6).as("mean_tok_len"),
      round(uniqRatio * (lit(1.0) - stopRatio), 6).as("quality_score"))
  }

  /** Winnowing-lite document fingerprint: the minimum md5 over all
    * 8-token shingles (content-shift tolerant, order sensitive) — the
    * min-hash selection step of Schleimer, Wilkerson & Aiken,
    * "Winnowing: local algorithms for document fingerprinting"
    * (SIGMOD 2003), applied whole-document.
    */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    fingerprints(Tables.documents(spark, dir))

  def fingerprints(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val sh = transform(sequence(lit(0), size(toks) - 8),
      i => md5(array_join(slice(toks, i + 1, lit(8)), " ")))
    Par.ensure(docs)
      .filter(size(split(col("text"), " ")) >= 8)
      .select(col("doc_id"), array_min(sh).as("fingerprint"))
  }

  /** Fingerprints via the native rolling-hash expression — the
    * at-scale form of [[fingerprints]]: O(tokens) per document, no
    * shingle-string materialization (see functions.MinShingleHash).
    */
  def fingerprintsFast(docs: DataFrame, n: Int = 8): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    Par.ensure(docs).select(col("doc_id"),
      column(graft.functions.MinShingleHash(
        expression(split(col("text"), " ")), n)).as("fingerprint64"))
  }

  /** Corpus-level boilerplate detection: the top-k word n-grams by
    * DOCUMENT frequency (distinct-per-doc shingles, so a gram repeated
    * inside one doc counts once — df, not tf). The standard first look
    * at a crawled corpus: headers/footers/licence blurbs surface as
    * grams with df near the doc count. Scale shape: shingle explode →
    * map-side-combined count per gram (one shuffle) → TakeOrdered
    * top-k; no distinct-agg needed because shingle sets are already
    * per-doc distinct.
    */
  def topNgrams(spark: SparkSession, dir: String): DataFrame =
    topNgrams(Tables.documents(spark, dir))

  /** Counting happens on native 128-bit ShingleWindows keys (one
    * compiled pass per doc: both hash lanes + open-addressed per-doc
    * dedup — no gram STRINGS and no interpreted arrays_zip/
    * array_distinct in the corpus-wide map stage); each count also
    * carries the smallest (doc_id, pos) where the gram occurs, so text
    * recovery for the bounded survivor set is a broadcast join back to
    * the corpus + one token slice — no second hashing pass. Survivors
    * = every hash whose df ties-or-beats the k-th largest df (computed
    * declaratively via TakeOrdered + one-row broadcast, same pattern
    * as q_above_avg), so the final (df desc, gram) tie-break is exact
    * — identical output to the string-keyed form. The count exchange
    * is planned once and reused across the threshold and candidate
    * branches (ReusedExchange; asserted in PlanShapeSpec).
    */
  def topNgrams(docs: DataFrame, n: Int = 4, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val toks = split(col("text"), " ")
    def windows = Par.ensure(docs)
      .filter(size(split(col("text"), " ")) >= n)
      .select(col("doc_id"),
        explode(column(graft.functions.ShingleWindows(expression(toks), n)))
          .as("p"))
      .select(col("doc_id"), col("p.h1").as("h1"), col("p.h2").as("h2"),
        col("p.pos").as("pos"))
    // The count agg also keeps one deterministic representative
    // location per gram — min doc_id plus that doc's window position.
    // (doc_id, h1, h2) rows are unique (per-doc distinct windows), so
    // min_by is deterministic, and all three agg buffers are plain
    // longs — HashAggregate throughout (a min(struct) here would
    // force SortAggregate).
    val counts = windows
      .groupBy(col("h1"), col("h2"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("cand_doc"),
        min_by(col("pos"), col("doc_id")).as("cand_pos"))
    // The trailing sort keys are semantically inert ((h1,h2) is unique
    // per counts row) — they exist so column pruning cannot strip the
    // location aggs from this branch's copy of `counts`, which would
    // de-duplicate the subtrees and lose the ReusedExchange.
    val thresh = counts
      .orderBy(col("df").desc, col("h1"), col("h2"),
        col("cand_doc"), col("cand_pos")).limit(k)
      .agg(min(col("df")).as("__t"))
    // survivors are USUALLY ~k rows but a df plateau at the threshold
    // can be wide — don't force the recovery join's strategy (AQE
    // broadcasts the common case; the plateau degrades to a shuffle
    // join instead of a driver OOM). Same contract as collocations.
    val cand = counts.join(broadcast(thresh), col("df") >= col("__t"))
      .select(col("df"), col("cand_doc"), col("cand_pos"))
    docs.join(cand, col("doc_id") === col("cand_doc"))
      .select(
        array_join(slice(split(col("text"), " "), col("cand_pos") + 1, lit(n)),
          " ").as("gram"),
        col("df"))
      .orderBy(col("df").desc, col("gram"))
      .limit(k)
  }

  /** Character-bigram language-ID heuristic: score each language by
    * marker-substring frequency, pick the argmax (deterministic
    * tie-break by profile order). The test corpus' text is synthetic
    * so accuracy is advisory; the operator shape (per-doc scoring,
    * no shuffle) is what matters at scale.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " la ", " de "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "),
    "zh" -> Seq("的", "是", "了"))

  private def countOcc(text: Column, sub: String): Column =
    ((length(text) - length(replace(text, lit(sub), lit("")))) /
      sub.length).cast("long")

  def languageId(spark: SparkSession, dir: String): DataFrame =
    languageId(Tables.documents(spark, dir))

  /** Trainable n-gram language ID, all-DataFrame:
    * train = per-language top-M character bigrams by document
    * frequency (one agg over the labeled corpus); classify = explode
    * each doc's distinct bigrams, inner-join the (broadcast) profile
    * table, argmax per doc on summed profile weight with a
    * deterministic (score desc, lang) tie-break. Scales as one
    * shuffle on (doc, lang); profiles are dimension-sized.
    */
  def charBigrams(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.functions.CharBigramSet(expression(text)))
  }

  /** The original HOF formulation — kept as the semantics yardstick
    * for the CharBigramSet drop-in spec. Not used in any lane:
    * the interpreted per-character lambda + string array_distinct was
    * the fluency lanes' SUPERLINEAR hot loop at 100× (SCALE.md r16);
    * [[charBigrams]] now routes to the compiled native expression.
    */
  def charBigramsHof(text: Column): Column =
    array_distinct(transform(
      sequence(lit(0), length(text) - 2),
      i => substr(text, i + 1, lit(2))))

  def trainLangProfiles(labeled: DataFrame, topM: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val df = labeled
      .select(col("lang"), explode(charBigrams(col("text"))).as("bg"))
      .groupBy(col("lang"), col("bg")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("df").desc, col("bg"))
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topM)
      .select(col("lang").as("p_lang"), col("bg"),
        (lit(1.0) / col("rk").cast("double")).as("weight"))
  }

  def classifyLang(docs: DataFrame, profiles: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = Par.ensure(docs)
      .select(col("doc_id"), explode(charBigrams(col("text"))).as("bg"))
      .join(broadcast(profiles), "bg")
      .groupBy(col("doc_id"), col("p_lang"))
      .agg(sum(col("weight")).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("p_lang"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("p_lang").as("lang_pred"),
        round(col("score"), 6).as("lang_score"))
  }

  /** Corpus-fluency score (perplexity-like gibberish detector), FULL-
    * oracle form (r16 VERDICT item 7): the per-doc mean Shannon code
    * length in WHOLE BITS of the doc's distinct character bigrams
    * under the corpus-wide bigram document-frequency profile —
    * integer algebra end to end (the [[Unigram.unigramVocab]]
    * cost_bits doctrine). Profile cost(bg) = ⌈log2(T / n(bg))⌉ via
    * ceil-div + `bin()` bit length; out-of-profile floor =
    * bitlen(T) + 8 bits (strictly costlier than the rarest in-profile
    * bigram at ANY corpus size — the floor scales with the corpus
    * instead of a fixed 1e-9); the per-doc mean ships as an EXACT
    * integer in micro-bits, `fluency_micro` =
    * −round_half_up(10⁶·sum_bits / n_bigrams) by integer division.
    * No float ever crosses the engine boundary, so the lane
    * hash-matches a DuckDB oracle (the former ln-based form was
    * no_oracle by FP sum-order). Sign convention unchanged: HIGHER =
    * more fluent — natural text reuses common bigrams (few bits);
    * noise / wrong encoding / binary-in-text bottoms out at the
    * floor. Distinct bigrams per doc (boundedness over fidelity).
    * Shapes: one agg builds the profile (dimension-sized, broadcast);
    * scoring is explode → broadcast-join → per-doc integer mean — one
    * shuffle on doc_id.
    */
  def fluencyScores(docs: DataFrame, topM: Int = 2000): DataFrame =
    fluencyScoresAgainst(docs, docs, topM)

  /** Score `docs` under the bigram profile of `corpus` (the default
    * lane scores a corpus against itself). Separated so the margin
    * lane can score planted gibberish against the REAL corpus's
    * profile — a plant must never shift the yardstick it is measured
    * by (50 planted docs were enough to push their own bigrams into a
    * driver-scale top-2000 profile and halve the margin).
    */
  def fluencyScoresAgainst(docs: DataFrame, corpus: DataFrame,
      topM: Int = 2000): DataFrame = {
    val bg = Par.ensure(docs)
      .select(col("doc_id"), explode(charBigrams(col("text"))).as("bg"))
    val counts = Par.ensure(corpus)
      .select(explode(charBigrams(col("text"))).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__t"))
    // TakeOrdered top-M (never a single-partition full sort); ties by
    // bg are binary-collation in both engines (corpus contract: the
    // lane tables are ASCII — see the oracle note in SparkEntry)
    val profile = counts
      .orderBy(col("n").desc, col("bg")).limit(topM)
      .crossJoin(broadcast(total))
      .withColumn("__q", expr("(__t + n - 1) div n"))
      .select(col("bg"),
        when(col("__q") <= 1, lit(0L))
          .otherwise(length(bin(col("__q") - 1)).cast("long"))
          .as("cost_bits"))
    val floor = total.select(
      (length(bin(col("__t"))).cast("long") + lit(8L)).as("__floor"))
    bg.join(broadcast(profile), Seq("bg"), "left")
      .crossJoin(broadcast(floor))
      .groupBy(col("doc_id"))
      .agg(
        sum(coalesce(col("cost_bits"), col("__floor"))).as("__sum_bits"),
        count(lit(1)).as("n_bigrams"))
      .select(col("doc_id"),
        (-expr("(2 * 1000000 * __sum_bits + n_bigrams)" +
          " div (2 * n_bigrams)")).as("fluency_micro"),
        col("n_bigrams"))
  }

  /** Driver contract `text_fluency_margin`: the hard per-round signal
    * for the `no_oracle` fluency lane (the ann_*_recall pattern) —
    * plant `nPlanted` deterministic GIBBERISH docs (md5 hex of the
    * doc translated onto a rare-consonant alphabet, so their bigrams
    * sit far outside the corpus profile), score the union AGAINST THE
    * REAL corpus's profile, and report ONE row: mean fluency_micro of
    * real vs planted docs and the margin between them (micro-bits —
    * the base lane's integer unit; 10⁶ ≡ one bit). Real text reuses
    * top-profile bigrams (few bits per bigram); the planted docs
    * bottom out at the bitlen(T)+8 floor — the margin is large and
    * stable run-to-run. The per-doc scores are exact integers now
    * (the base lane is FULL oracle); only this summary's means are FP
    * (avg over docs), so the lane stays the belt-and-braces signal:
    * rows-checked by the driver, ≥3e6 micro-bits (3 bits) margin
    * floor spec'd (SamplingSpec).
    */
  def fluencyMargin(spark: SparkSession, dir: String): DataFrame =
    fluencyMargin(Tables.documents(spark, dir))

  def fluencyMargin(docs: DataFrame, nPlanted: Int = 50): DataFrame = {
    val planted = docs.filter(col("doc_id") < nPlanted)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"),
        translate(md5(concat(col("doc_id"), col("text"))),
          "0123456789abcdef", "qxzjvwkfhgbpmcyt").as("text"))
    val all = docs.select(col("doc_id"), col("text")).unionByName(planted)
    fluencyScoresAgainst(all, docs)
      .agg(
        count(when(col("doc_id") < 1000000L, 1)).as("n_real"),
        count(when(col("doc_id") >= 1000000L, 1)).as("n_planted"),
        round(avg(when(col("doc_id") < 1000000L,
          col("fluency_micro"))), 6).as("mean_real"),
        round(avg(when(col("doc_id") >= 1000000L,
          col("fluency_micro"))), 6).as("mean_planted"))
      .select(col("n_real"), col("n_planted"), col("mean_real"),
        col("mean_planted"),
        round(col("mean_real") - col("mean_planted"), 6).as("margin"))
  }

  def languageId(docs: DataFrame): DataFrame = {
    val padded = concat(lit(" "), col("text"), lit(" "))
    val scores = LangMarkers.map { case (lang, markers) =>
      struct(markers.map(m => countOcc(padded, m)).reduce(_ + _).as("score"),
        lit(lang).as("lang"))
    }
    // Par.ensure: dozens of marker substring counts per doc ≫ one
    // scan-copy shuffle on split-starved layouts; no-op otherwise
    Par.ensure(docs).select(
      col("doc_id"), col("lang").as("lang_label"),
      greatest(scores: _*).getField("lang").as("lang_pred"))
  }

  /** Token-window document chunking — the context-length prep step of
    * every LLM training pipeline: split each document into `window`-
    * token chunks advancing by `stride` (stride < window ⇒ overlap;
    * the final chunk keeps the tail even when shorter). Pure map-side
    * generate (sequence + explode), zero shuffle: at 100 TB this is
    * scan-bound and embarrassingly parallel. Chunk text is emitted as
    * md5 so the oracle compare ships 32 bytes, not the text.
    */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame =
    chunkDocs(Tables.documents(spark, dir))

  def chunkDocs(docs: DataFrame, window: Int = 32, stride: Int = 24)
      : DataFrame = {
    require(window > 0 && stride > 0 && stride <= window)
    val toks = split(col("text"), " ")
    val n = size(toks).cast("long")
    // number of chunk starts past the first: ceil((n - window) / stride)
    // in pure long arithmetic (div = IntegralDivide, no double rounding)
    val nExtra = when(n > window,
      call_function("div", n - window + (stride - 1), lit(stride.toLong)))
      .otherwise(lit(0L))
    Par.ensure(docs)
      .select(col("doc_id"), toks.as("t"), nExtra.as("n_extra"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0L), col("n_extra"))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("t"), (col("chunk_id") * stride + 1).cast("int"),
          lit(window)).as("c"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("c")).cast("long").as("n_chunk_tokens"),
        md5(array_join(col("c"), " ")).as("chunk_md5"))
  }

  /** Benchmark decontamination — the overlap check run before training:
    * for every corpus document, the number of distinct word `n`-grams
    * it shares with a held-out benchmark set (docs whose id ≡ 0 mod 20
    * here; any predicate works). Emits only contaminated docs
    * (n_shared ≥ 1) — the caller anti-joins them away.
    *
    * Shape: both sides explode to per-doc DISTINCT shingles keyed by
    * the same 128-bit double-rolling-hash as
    * [[Dedup.ngramJaccardPairs]] (native ShingleHashes lanes — 16-byte
    * shuffle keys, no shingle strings; collision odds ~2^-128 — same
    * exactness basis as md5 keying), then one equi-join on the hash +
    * one count per doc. The benchmark side is corpus-scale, NOT
    * broadcast — at 100 TB both sides shuffle on the shingle hash and
    * the join is sort-merge; a dimension-sized benchmark would
    * broadcast instead.
    */
  def contamination(spark: SparkSession, dir: String): DataFrame =
    contamination(Tables.documents(spark, dir))

  private def shingleHashPairs(docs: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val toks = split(col("text"), " ")
    Par.ensure(docs)
      .filter(size(split(col("text"), " ")) >= n)
      .select(col("doc_id"),
        explode(column(graft.functions.ShingleWindows(expression(toks), n)))
          .as("p"))
      .select(col("doc_id"), col("p.h1").as("h1"), col("p.h2").as("h2"))
  }

  /** Driver-query form: benchmark = docs whose id ≡ 0 mod 20. */
  def contamination(docs: DataFrame, n: Int = 4): DataFrame = {
    val sh = shingleHashPairs(docs, n)
    contaminationAgainst(
      sh.filter(col("doc_id") % 20 =!= 0),
      sh.filter(col("doc_id") % 20 === 0))
  }

  /** General form: corpus checked against a CALLER-SUPPLIED benchmark
    * table (`doc_id`, `text`) — the real deployment shape, where the
    * eval sets live in their own table.
    */
  def contamination(docs: DataFrame, benchmark: DataFrame,
      n: Int): DataFrame =
    contaminationAgainst(shingleHashPairs(docs, n),
      shingleHashPairs(benchmark, n))

  private def contaminationAgainst(probe: DataFrame,
      bench: DataFrame): DataFrame =
    probe
      .join(bench.select(col("h1"), col("h2")).distinct(), Seq("h1", "h2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))

  /** Per-language contamination summary over [[contamination]]'s
    * driver split (benchmark = doc_id ≡ 0 mod 20): corpus doc count,
    * contaminated doc count, total shared shingle windows, and the
    * contamination rate — the per-domain go/no-go report a
    * decontamination run ends with. The hits side is at most one row
    * per contaminated doc (corpus-scale worst case), so the join back
    * onto the corpus stays a sort-merge equi-join on doc_id and the
    * report itself is |domains| rows.
    */
  def contaminationReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val hits = contamination(docs)
    docs.filter(col("doc_id") % 20 =!= 0)
      .select(col("doc_id"), col("lang"))
      .join(hits, Seq("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_shared").isNotNull, 1L).otherwise(0L))
          .as("n_contaminated"),
        coalesce(sum(col("n_shared")), lit(0L)).as("n_shared_total"))
      .select(col("lang"), col("n_docs"), col("n_contaminated"),
        col("n_shared_total"),
        round(col("n_contaminated") / col("n_docs"), 6).as("rate"))
  }

  /** C4-style text normalization (Raffel et al. 2020 §2.2 family):
    * lowercase, strip everything but letters/digits/spaces (unicode
    * classes, so CJK and accented text survive), collapse runs of
    * whitespace, trim. Pure codegen'd column algebra — zero shuffle,
    * scan-bound at any scale. The test corpus is already normalized
    * (so the driver check is rows-only); NormalizeSpec asserts the
    * transform on planted messy text.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{N} ]", " "), " +", " "))

  def normalizeDocs(spark: SparkSession, dir: String): DataFrame =
    normalizeDocs(Tables.documents(spark, dir))

  def normalizeDocs(docs: DataFrame): DataFrame =
    // Par.ensure: two regex rewrites ×2 uses per doc — the
    // readability scan-starvation fix applies (no-op on ample splits)
    Par.ensure(docs).select(col("doc_id"),
      md5(normalized(col("text"))).as("norm_md5"),
      size(split(normalized(col("text")), " ")).cast("long")
        .as("n_norm_tokens"))

  /** PII scrubbing — the redaction pass every published web-scale
    * pipeline runs (emails / IPv4 / phone-shaped digit runs →
    * placeholder tokens) plus per-doc match counts for audit. Patterns
    * are deliberately conservative RE2-compatible shapes; swap in
    * jurisdiction-specific ones at deploy time. Pure map, zero
    * shuffle. Spec-tested on planted PII (the synthetic corpus
    * contains none — counts are the audit trail proving that).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d[\\d()\\- ]{7,}\\d"

  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    piiScrub(Tables.documents(spark, dir))

  def piiScrub(docs: DataFrame): DataFrame = {
    val scrubbed = regexp_replace(regexp_replace(regexp_replace(
      col("text"), EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"), PhoneRe, "<PHONE>")
    // Par.ensure: six regex passes per doc ≫ one scan-copy shuffle
    // when the scan is split-starved (single-row-group layouts); a
    // no-op with ample splits — see readability's measured 6× at 100×
    Par.ensure(docs).select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0)))
        .cast("long").as("n_ips"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0)))
        .cast("long").as("n_phones"),
      md5(scrubbed).as("scrubbed_md5"))
  }

  /** Gopher-style repetition signal: the share of a document's word
    * bigrams taken by its single most-frequent bigram (Rae et al.,
    * "Scaling Language Models: ... Gopher", 2021, §A1.2 uses exactly
    * this family of duplicate-n-gram fractions as quality filters).
    * Boilerplate/spam/keyword-stuffed docs score near 1. Bigrams are
    * counted WITH multiplicity (tf, not df). One shuffle on
    * (doc, gram) then a doc-level reduce; both aggregates combine
    * map-side.
    */
  def repetitionScores(spark: SparkSession, dir: String): DataFrame =
    repetitionScores(Tables.documents(spark, dir))

  /** The output carries no gram text at all, so counting runs entirely
    * on native 128-bit ShingleHashes window keys (tf — windows kept
    * WITH multiplicity, no array_distinct): the interpreted
    * gram-string transform is gone and the (doc, gram) shuffle key
    * shrinks to doc_id + 16 bytes. Within-doc 128-bit collisions (the
    * only event that could merge two different bigrams' counts) are
    * ~2^-128 — the same exactness basis as the hash-keyed dedup
    * family.
    */
  def repetitionScores(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val toks = split(col("text"), " ")
    val pairs = arrays_zip(
      column(graft.functions.ShingleHashes(expression(toks), 2, 0)).as("h1"),
      column(graft.functions.ShingleHashes(expression(toks), 2, 1)).as("h2"))
    Par.ensure(docs)
      .filter(size(split(col("text"), " ")) >= 2)
      .select(col("doc_id"), explode(pairs).as("p"))
      .groupBy(col("doc_id"), col("p"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_2grams"), max(col("c")).as("top_count"))
      .select(col("doc_id"), col("n_2grams"), col("top_count"),
        round(col("top_count").cast("double") / col("n_2grams"), 6)
          .as("top_share"))
  }

  def collocations(spark: SparkSession, dir: String): DataFrame =
    collocations(Tables.documents(spark, dir))

  /** Top-k collocations: adjacent token pairs ranked by LIFT —
    * P(ab) / (P(a)·P(b)), the exp of PMI. Ranking by the RATIO
    * instead of its log keeps the score a pure product/quotient of
    * counts: no transcendental in the compare path (the text_tfidf
    * lesson), and the multiplication order is written identically on
    * both engines so the doubles agree bit-for-bit before round(6).
    *
    * Counting runs on native 128-bit ShingleHashes keys (tf lanes,
    * multiplicity kept — bigrams ARE 2-shingles): no token or gram
    * STRINGS ride the count shuffles, the (u1,u2)/(b1,b2) shuffle
    * keys are 16 bytes each, and the unigram join-backs for the
    * floored pair table are 128-bit equi-joins instead of string
    * compares. Each bigram row carries its constituents' unigram
    * hashes (sliced from the SAME n=1 lanes in the one explode pass
    * — no corpus self-join to align positions) plus one
    * deterministic representative location (min doc_id + a position
    * in that doc); gram TEXT is recovered for the bounded survivor
    * set only, via a broadcast join back to the corpus and one token
    * slice — the [[topNgrams]] pattern. Survivors = every pair whose
    * rounded lift ties-or-beats the k-th largest (the threshold
    * VALUE is tie-break independent), so the final (lift desc, gram)
    * ordering is exact — identical output to the string-keyed form
    * on the ~2^-128 collision basis the dedup family documents.
    *
    * Scale shape: unigram and bigram counts are map-side-combined
    * aggregates (shuffle volume = distinct grams per partition, not
    * corpus positions); the two count totals derive from the
    * ALREADY-AGGREGATED frames and ride one-row broadcasts; the
    * unigram join-backs run AFTER the `minCount` floor cuts the
    * pair table; top-k is TakeOrderedAndProject. A `minCount` floor
    * is also the statistical guard — lift of a 1-occurrence pair is
    * noise.
    */
  def collocations(docs: DataFrame, minCount: Int = 5,
      k: Int = 20): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val toks = split(col("text"), " ")
    def uh(lane: Int) = column(
      graft.functions.ShingleHashes(expression(toks), 1, lane))
    def bh(lane: Int) = column(
      graft.functions.ShingleHashes(expression(toks), 2, lane))
    val uni = Par.ensure(docs)
      .select(explode(arrays_zip(uh(0).as("u1"), uh(1).as("u2"))).as("t"))
      .groupBy(col("t.u1").as("u1"), col("t.u2").as("u2"))
      .agg(count(lit(1)).as("c1"))
    val n1 = uni.agg(sum(col("c1")).as("__n1"))
    // one explode pass per doc: bigram key lanes + the two
    // constituent-token unigram key lanes (slices of the n=1 arrays
    // align window i with tokens i and i+1) + 0-based window position
    val zipped = arrays_zip(
      bh(0).as("b1"), bh(1).as("b2"),
      slice(uh(0), lit(1), size(toks) - 1).as("ua1"),
      slice(uh(1), lit(1), size(toks) - 1).as("ua2"),
      slice(uh(0), lit(2), size(toks) - 1).as("ub1"),
      slice(uh(1), lit(2), size(toks) - 1).as("ub2"))
    // constituent hashes are constant within a (b1,b2) group, so min
    // is just a deterministic pick; min_by's pos is any occurrence in
    // cand_doc — every occurrence recovers the same gram text. All
    // agg buffers are plain longs — HashAggregate throughout.
    val bc = Par.ensure(docs)
      .filter(size(split(col("text"), " ")) >= 2)
      .select(col("doc_id"), posexplode(zipped).as(Seq("pos", "p")))
      .groupBy(col("p.b1").as("b1"), col("p.b2").as("b2"))
      .agg(count(lit(1)).as("n_pair"),
        min(col("p.ua1")).as("ua1"), min(col("p.ua2")).as("ua2"),
        min(col("p.ub1")).as("ub1"), min(col("p.ub2")).as("ub2"),
        min(col("doc_id")).as("cand_doc"),
        min_by(col("pos"), col("doc_id")).as("cand_pos"))
    val nb = bc.agg(sum(col("n_pair")).as("__nb"))
    val scored = bc.filter(col("n_pair") >= minCount)
      .join(uni.select(col("u1").as("ua1"), col("u2").as("ua2"),
        col("c1").as("__ca")), Seq("ua1", "ua2"))
      .join(uni.select(col("u1").as("ub1"), col("u2").as("ub2"),
        col("c1").as("__cb")), Seq("ub1", "ub2"))
      .crossJoin(broadcast(n1)).crossJoin(broadcast(nb))
      .select(col("n_pair"),
        round(col("n_pair").cast("double") * col("__n1") * col("__n1") /
          (col("__nb").cast("double") * col("__ca") * col("__cb")), 6)
          .as("lift"),
        col("cand_doc"), col("cand_pos"))
    // the k-th largest lift VALUE is independent of any tie-break, so
    // survivors (lift >= it) ⊇ the true top-k. The survivor set is
    // USUALLY ~k rows, but a lift plateau at the threshold can be
    // arbitrarily wide (pairs with identical count profiles — e.g.
    // minCount-occurrence pairs of pair-only constituents — share one
    // rounded lift), so the recovery join must NOT force a driver
    // broadcast: leave the strategy to the planner (AQE broadcasts
    // the ~k-row common case, shuffles the pathological plateau) and
    // let TakeOrderedAndProject cut the final k.
    val thresh = scored
      .orderBy(col("lift").desc, col("cand_doc"), col("cand_pos")).limit(k)
      .agg(min(col("lift")).as("__t"))
    val cand = scored.join(broadcast(thresh), col("lift") >= col("__t"))
      .select(col("n_pair"), col("lift"), col("cand_doc"), col("cand_pos"))
    docs.join(cand, col("doc_id") === col("cand_doc"))
      .select(
        array_join(slice(split(col("text"), " "), col("cand_pos") + 1,
          lit(2)), " ").as("gram"),
        col("n_pair"), col("lift"))
      .orderBy(col("lift").desc, col("gram")).limit(k)
  }

  def simpsonDiversity(spark: SparkSession, dir: String): DataFrame =
    simpsonDiversity(Tables.documents(spark, dir))

  /** Lexical-concentration (Simpson) index per document: the
    * probability two tokens drawn WITHOUT replacement are the same
    * word — Σ c·(c−1) / (N·(N−1)). The entropy-family quality signal
    * that, unlike entropy itself, is a pure RATIONAL of integer
    * counts: both engines compute the identical integers, one
    * division, one deterministic round(6). (text_fluency's log-mean
    * is the cautionary twin — transcendental + sum-order ⇒ declared
    * no_oracle; Simpson gets the exact oracle for free.)
    *
    * Counting runs on 128-bit ShingleHashes(n=1) token keys like
    * [[repetitionScores]] — no token strings in the shuffle; the
    * within-doc collision basis (~2^-128) is shared with the dedup
    * family. Two nested map-combined aggregates, one corpus shuffle.
    */
  def simpsonDiversity(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val toks = split(col("text"), " ")
    val keys = arrays_zip(
      column(graft.functions.ShingleHashes(expression(toks), 1, 0)).as("h1"),
      column(graft.functions.ShingleHashes(expression(toks), 1, 1)).as("h2"))
    Par.ensure(docs)
      .filter(size(split(col("text"), " ")) >= 2)
      .select(col("doc_id"), explode(keys).as("k"))
      .groupBy(col("doc_id"), col("k"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c") * (col("c") - 1)).as("num"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        round(col("num").cast("double") /
          (col("n_tokens") * (col("n_tokens") - 1)), 6).as("simpson"))
  }

  /** Shannon token entropy per document — the information-density
    * twin of [[simpsonDiversity]]: H = log2(N) − Σ c·log2(c)/N over
    * the per-type counts c (equivalently −Σ p·log2 p). Low entropy =
    * repetitive/template text, the classic "junk or boilerplate"
    * quality signal next to Gopher's structural rules.
    *
    * Same hash-keyed counting as Simpson (128-bit ShingleHashes(1)
    * keys — no token strings in the shuffle; two nested map-combined
    * aggregates, one corpus shuffle). FP contract: c and N are exact
    * integers, log2 differs cross-engine by ≤1 ulp, and a per-doc sum
    * has ≤ n_types terms — the divergence reaching the ROUND(6) is
    * ~1e-14, five orders below the rounding boundary (the curate_dsir
    * argument at smaller magnitudes), so the oracle stays exact in
    * practice where text_fluency's corpus-sized log-sums could not.
    */
  def tokenEntropy(spark: SparkSession, dir: String): DataFrame =
    tokenEntropy(Tables.documents(spark, dir))

  def tokenEntropy(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val toks = split(col("text"), " ")
    val keys = arrays_zip(
      column(graft.functions.ShingleHashes(expression(toks), 1, 0)).as("h1"),
      column(graft.functions.ShingleHashes(expression(toks), 1, 1)).as("h2"))
    Par.ensure(docs)
      .filter(size(split(col("text"), " ")) >= 1)
      .select(col("doc_id"), explode(keys).as("k"))
      .groupBy(col("doc_id"), col("k"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c").cast("double") * log2(col("c").cast("double")))
          .as("clc"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        round(log2(col("n_tokens").cast("double")) -
          col("clc") / col("n_tokens").cast("double"), 6).as("entropy"))
  }

  /** Gopher quality-rule flags (Rae et al. 2021, app. A1.1 — the
    * rule set MassiveWeb was filtered with, and the baseline every
    * later corpus paper cites): per-doc booleans for
    *  - word count within [minWords, maxWords];
    *  - mean word length within [minMeanLen, maxMeanLen] — computed
    *    EXACTLY as (chars − separators)/words, no token explode:
    *    for single-space splitting, Σ|token| ≡ length(text)−(n−1);
    *  - ≥ minAlphaFrac of words containing an alphabetic character;
    *  - ≥ minStopHits occurrences from the shared [[StopWords]] list
    *    (the paper's "2 of a stop-word set" ersatz-LM-quality rule).
    * All integer/ratio arithmetic (one correctly-rounded division per
    * ratio) — bit-reproducible cross-engine, full oracle. The only
    * shuffle is the per-doc token aggregate for the alpha/stopword
    * counts; everything else is map-side column algebra.
    */
  def gopherFlags(docs: DataFrame,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopHits: Long = 2L): DataFrame = {
    val tk = split(col("text"), " ")
    val base = docs.select(col("doc_id"),
      size(tk).cast("long").as("n_words"),
      ((length(col("text")) - (size(tk) - 1)).cast("double") /
        size(tk).cast("double")).as("mean_len"))
    val perTok = docs
      .select(col("doc_id"), explode(tk).as("t"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("t").rlike("[a-zA-Z]"), 1L).otherwise(0L))
          .as("n_alpha"),
        sum(when(col("t").isin(StopWords: _*), 1L).otherwise(0L))
          .as("n_stop"))
    base.join(perTok, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("f_word_count"),
        (col("mean_len") >= minMeanLen && col("mean_len") <= maxMeanLen)
          .as("f_mean_len"),
        (col("n_alpha").cast("double") / col("n_words").cast("double")
          >= minAlphaFrac).as("f_alpha"),
        (col("n_stop") >= minStopHits).as("f_stop"))
      .withColumn("f_pass",
        col("f_word_count") && col("f_mean_len") &&
          col("f_alpha") && col("f_stop"))
  }

  /** Driver contract `curate_gopher`: ONE summary row — corpus size,
    * per-rule violation counts, and the pass count — at the published
    * bounds except minWords = 40 (the paper's 50 would reject most of
    * a ~60-token synthetic corpus for length alone and mask the other
    * rules; 40 keeps every rule live: 169 length + 112 stopword
    * violations at sf0.01).
    */
  def gopherSummary(spark: SparkSession, dir: String): DataFrame =
    gopherFlags(Tables.documents(spark, dir), minWords = 40L)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!col("f_word_count"), 1L).otherwise(0L))
          .as("fail_word_count"),
        sum(when(!col("f_mean_len"), 1L).otherwise(0L)).as("fail_mean_len"),
        sum(when(!col("f_alpha"), 1L).otherwise(0L)).as("fail_alpha"),
        sum(when(!col("f_stop"), 1L).otherwise(0L)).as("fail_stop"),
        sum(when(col("f_pass"), 1L).otherwise(0L)).as("n_pass"))

  /** The C4 rule set (Raffel et al., "Exploring the Limits of
    * Transfer Learning with a Unified Text-to-Text Transformer",
    * 2020, §2.2) — the OTHER canonical web filter next to Gopher's:
    * line-level structure rules (keep lines ending in terminal
    * punctuation; lines with ≥5 words), a ≥3-sentence page floor,
    * and page-level content gates (badword list, "lorem ipsum",
    * curly brace, "javascript"). Per-doc line COUNTS plus violation
    * flags; `f_pass` is the page-level gate.
    *
    * Scale shape: ONE map-only pass, everything codegen'd — the
    * line-level counts ride multiline-anchored `regexp_count`
    * ((?m)-patterns count matching LINES without splitting or
    * exploding anything; both engines are leftmost-match so an
    * anchored pattern fires at most once per line), the badword gate
    * is `arrays_overlap` against a broadcast-free literal array. No
    * shuffle, no HOF lambda (which would run interpreted).
    * All-integer/boolean outputs — rung-1 exact oracle.
    *
    * Cross-engine line-anchor contract: a LINE is a `\n`-separated
    * span of the CR-STRIPPED text. Java's multiline `$` also fires
    * before lone `CR`, U+0085, and U+2028 where RE2's fires only
    * before `\n` — so the text is normalized (`\r` removed) before
    * any line-anchored pattern, and Spark's patterns carry `(?d)`
    * (UNIX_LINES) so `^`/`$` see exactly the `\n` set RE2's `m` flag
    * sees. Badword matching follows the original filter: LOWERCASED
    * word spans split on non-alphanumerics (space-splitting would
    * let "casino." or "Casino" escape).
    */
  def c4Flags(docs: DataFrame, badwords: Seq[String],
      minSentences: Long = 3L): DataFrame = {
    require(badwords.nonEmpty, "c4Flags: empty badword list")
    require(badwords.forall(w => w.nonEmpty && w == w.toLowerCase),
      "c4Flags: badwords must be lowercase (matching lowercases the text)")
    val t = regexp_replace(col("text"), "\r", "")
    // Par.ensure: three multiline regexp_counts + the badword split
    // per doc ≫ one scan-copy shuffle on split-starved layouts; a
    // no-op with ample scan splits (the readability measurement)
    Par.ensure(docs).select(col("doc_id"),
      size(split(t, "\n")).cast("long").as("n_lines"),
      regexp_count(t, lit("(?dm)[.!?\"]$")).cast("long")
        .as("n_term_lines"),
      // explicit non-space class, NOT \S: Java's \S excludes \x0B
      // (vertical tab) while RE2's — the oracle engine's — includes
      // it; [^ \t\n\f\r] is the identical shared subset in both
      regexp_count(t, lit("(?dm)^(?:[^ \\t\\n\\f\\r]+ ){4}[^ \\t\\n\\f\\r]"))
        .cast("long").as("n_long_lines"),
      regexp_count(t, lit("[.!?]")).cast("long")
        .as("n_sentences"),
      arrays_overlap(split(lower(t), "[^a-z0-9]+"),
        typedLit(badwords)).as("f_badword"),
      (instr(lower(col("text")), "lorem ipsum") > 0).as("f_lorem"),
      (instr(col("text"), "{") > 0).as("f_brace"),
      (instr(lower(col("text")), "javascript") > 0).as("f_js"))
      .withColumn("f_pass",
        col("n_sentences") >= minSentences && !col("f_badword") &&
          !col("f_lorem") && !col("f_brace") && !col("f_js"))
  }

  /** Driver contract `curate_c4`: ONE summary row — corpus and line
    * totals, per-rule violation counts, pass count. The badword list
    * is a synthetic stand-in drawn from the corpus vocabulary (the
    * real filter ships an external list); the punctuation/sentence
    * counts are honestly DEGENERATE on this newline-free unpunctuated
    * corpus (every doc = 1 line, 0 sentences — the text_pii
    * zero-counts-ARE-the-audit convention), so the rule mechanics are
    * proven on planted multi-line fixtures in the spec instead.
    */
  def c4Summary(spark: SparkSession, dir: String): DataFrame =
    c4Flags(Tables.documents(spark, dir), badwords = Seq("slow", "big"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_lines")).as("total_lines"),
        sum(col("n_term_lines")).as("term_lines"),
        sum(col("n_long_lines")).as("long_lines"),
        sum(when(col("n_sentences") < 3L, 1L).otherwise(0L))
          .as("fail_sentences"),
        sum(when(col("f_badword"), 1L).otherwise(0L)).as("fail_badword"),
        sum(when(col("f_lorem"), 1L).otherwise(0L)).as("fail_lorem"),
        sum(when(col("f_brace"), 1L).otherwise(0L)).as("fail_brace"),
        sum(when(col("f_js"), 1L).otherwise(0L)).as("fail_js"),
        sum(when(col("f_pass"), 1L).otherwise(0L)).as("n_pass"))

  /** Readability scoring (Flesch reading-ease + Flesch-Kincaid grade,
    * Kincaid et al. 1975) — the audience-level signal education-
    * targeted curation thresholds on (the FineWeb-Edu family filters
    * "too advanced / too trivial" ends of exactly this axis). Counts
    * are the classic proxies, each a single codegen'd regexp over the
    * lowercased text:
    *
    *   words     = whitespace tokens (the shared tokenizer)
    *   sentences = max(count of `[.!?]+` runs, 1)  — floor avoids the
    *               ÷0 on unpunctuated docs (this corpus: all of them
    *               — the curate_c4 degenerate-counts convention; the
    *               mechanics are fixture-proven in the spec)
    *   syllables = count of `[aeiouy]+` vowel groups across the doc
    *               (spaces break groups, so this is the per-word sum;
    *               consonant-only tokens contribute 0 — documented
    *               proxy, not a dictionary)
    *
    *   ease  = 206.835 − 1.015·(w/s) − 84.6·(y/w)
    *   grade = 0.39·(w/s) + 11.8·(y/w) − 15.59
    *
    * Scale shape: ONE map-only pass, no shuffle, no explode — the
    * counts never materialize a token stream. FP: every count is an
    * exact integer; each division/multiplication/subtraction is one
    * correctly-rounded IEEE op applied in the SAME written order by
    * both engines (literal constants parse to identical doubles), so
    * the score is bit-identical cross-engine before the safety
    * ROUND(4) — rung-1/3 oracle. Docs with zero words drop (no
    * readability of nothing; both engines filter identically).
    */
  def readability(docs: DataFrame): DataFrame = {
    val t = lower(col("text"))
    // Par.ensure, deliberately: the op is logically map-only, but
    // regex cost ≫ shuffle cost, so when the SCAN can't parallelize
    // (few files / single parquet row group — the measured 100×
    // corpus shape: one row group ⇒ one split ⇒ one core, 51 s) a
    // RoundRobin repartition buys back all cores for ~1 scan-copy of
    // the text. Par.ensure is adaptive: with ample scan splits (any
    // healthy 100 TB layout) it is a NO-OP and the plan stays
    // Exchange-free
    val counted = Par.ensure(docs).select(col("doc_id"),
      // non-empty whitespace tokens == runs of non-space chars; the
      // regexp form stays inside codegen where an array-filter HOF
      // lambda would run interpreted
      regexp_count(t, lit("[^ ]+")).cast("long").as("words"),
      greatest(regexp_count(t, lit("[.!?]+")), lit(1)).cast("long")
        .as("sentences"),
      regexp_count(t, lit("[aeiouy]+")).cast("long").as("syllables"))
      .filter(col("words") > 0L)
    val wps = col("words").cast("double") / col("sentences").cast("double")
    val spw = col("syllables").cast("double") / col("words").cast("double")
    counted.select(col("doc_id"), col("words"), col("sentences"),
      col("syllables"),
      round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 4)
        .as("reading_ease"),
      round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 4)
        .as("fk_grade"))
  }

  /** Driver query `text_readability`: per-doc Flesch scores over the
    * corpus, doc_id-ordered. Full rung-1/3 oracle.
    */
  def readabilityScores(spark: SparkSession, dir: String): DataFrame =
    readability(Tables.documents(spark, dir)).orderBy(col("doc_id"))
}
