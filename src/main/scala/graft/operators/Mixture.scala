package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Training-mixture composition — the step between a curated corpus
  * and a training run: given TARGET domain proportions (the mixture
  * the model should see) and the OBSERVED corpus skew, derive a
  * deterministic per-domain sampling rate and apply it with the same
  * content-hash membership discipline as [[Sampling]] (membership is
  * a pure function of doc_id — re-runs, re-partitions, and corpus
  * growth never reshuffle which docs a domain keeps).
  *
  * Two passes by necessity (rates depend on observed counts): pass 1
  * is a count-only aggregate (at 100 TB: a column-pruned scan of one
  * string column, hash-partial combined, |domains| result rows);
  * pass 2 filters by the md5-nibble rank against the rate map, which
  * joins back as a broadcast of |domains| rows — the corpus never
  * shuffles at all.
  */
object Mixture {

  /** Per-domain keep-rate in sixteenths for a target mixture:
    * `rate_d = min(16, floor(16 * budget * w_d / n_d))` — the largest
    * nibble rate that keeps domain d's contribution at or under its
    * target share `w_d` of `budget` rows. Domains absent from
    * `weights` get weight 0 (dropped): a mixture is a whitelist.
    */
  def mixtureRates(docs: DataFrame, domainCol: String,
      weights: Map[String, Double], budgetShare: Double): DataFrame = {
    require(budgetShare > 0 && budgetShare <= 1.0)
    val wCase = weights.foldLeft(lit(0.0)) { case (acc, (k, w)) =>
      when(col(domainCol) === k, lit(w)).otherwise(acc)
    }
    val counts = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_obs"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    counts.crossJoin(broadcast(total))
      .select(col(domainCol), col("n_obs"),
        least(lit(16), floor(lit(16.0) * wCase
          * (col("n_total") * budgetShare) / col("n_obs")).cast("long"))
          .as("rate_sixteenths"))
  }

  /** 0-based hash-space rank of `id`'s first md5 hex nibble — the
    * same portable membership function as [[Sampling.inHashSample]]
    * (engine-agnostic: any md5 reproduces it).
    */
  private def nibbleRank(id: Column): Column = {
    val c = ascii(substring(md5(id.cast("string")), 1, 1))
    when(c >= ascii(lit("a")), c - ascii(lit("a")) + 10)
      .otherwise(c - ascii(lit("0")))
  }

  /** Apply a rate table from [[mixtureRates]]: keep a doc iff its
    * nibble rank falls under its domain's rate. The rate side is
    * |domains| rows — explicitly broadcast, so this is a map-only
    * stage over the corpus.
    */
  def applyMixture(docs: DataFrame, rates: DataFrame, idCol: String,
      domainCol: String): DataFrame =
    docs.join(broadcast(rates), Seq(domainCol))
      .filter(nibbleRank(col(idCol)) < col("rate_sixteenths"))
      .drop("n_obs", "rate_sixteenths")

  /** Driver query: rebalance the documents corpus toward a uniform
    * five-language mixture at half-corpus budget; report per-language
    * observed count, derived rate, and kept count.
    */
  def composeMixture(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val weights = Map("en" -> 0.2, "de" -> 0.2, "es" -> 0.2,
      "fr" -> 0.2, "zh" -> 0.2)
    val rates = mixtureRates(docs, "lang", weights, budgetShare = 0.5)
    docs.join(broadcast(rates), Seq("lang"))
      .groupBy(col("lang"), col("n_obs"), col("rate_sixteenths"))
      .agg(sum(when(nibbleRank(col("doc_id")) < col("rate_sixteenths"), 1L)
        .otherwise(0L)).as("n_kept"))
  }

  /** Whitespace token count of a doc — `len(string_split(text,' '))`,
    * the convention every text lane and the oracle share.
    */
  private def nToks(text: Column): Column = size(split(text, " ")).cast("long")

  /** TOKEN-budget mixture rates — what a pretraining run actually
    * specifies ("web 50 %, code 25 % … of a 10 T-token budget"), not
    * row proportions: `rate_d = min(1, w_d · budget / tokens_d)` at
    * 1/65536 granularity via [[Sampling.hashUnit16]] (the sixteenths
    * of [[mixtureRates]] are too coarse once rates come from token
    * ratios). Domains absent from `weights` get 0 — a mixture is a
    * whitelist. Same two-pass shape as [[mixtureRates]]: pass 1 is a
    * column-pruned token-count aggregate (|domains| result rows),
    * pass 2 broadcasts the rate table — the corpus never shuffles.
    *
    * Determinism doctrine: `w_d` should be DYADIC (0.5, 0.25, …) and
    * the budget an integer — then `w·budget` is exact, the one
    * division is IEEE-correctly-rounded (identical on every engine),
    * ×65536 is exact (power of two), and the floor lands on the same
    * integer everywhere: membership is cross-engine reproducible.
    */
  def tokenBudgetRates(docs: DataFrame, domainCol: String,
      weights: Map[String, Double], tokenBudget: Long): DataFrame = {
    val wCase = weights.foldLeft(lit(0.0)) { case (acc, (k, w)) =>
      when(col(domainCol) === k, lit(w)).otherwise(acc)
    }
    docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"), sum(nToks(col("text"))).as("toks_obs"))
      .select(col(domainCol), col("n_docs"), col("toks_obs"),
        floor(least(lit(1.0),
          wCase * lit(tokenBudget.toDouble) / col("toks_obs").cast("double"))
          * lit(65536.0)).as("rate_u16"))
      .filter(col("rate_u16") > 0)
  }

  /** Apply a token-budget rate table: keep a doc iff its hash-space
    * position falls under its domain's u16 rate. Broadcast join —
    * map-only over the corpus.
    */
  def applyTokenBudget(docs: DataFrame, rates: DataFrame, idCol: String,
      domainCol: String): DataFrame =
    docs.join(broadcast(rates.select(col(domainCol), col("rate_u16"))),
        Seq(domainCol))
      .filter(Sampling.hashUnit16(col(idCol)) < col("rate_u16"))
      .drop("rate_u16")

  /** Driver query `mix_token_budget`: compose a 2000-token corpus cut
    * weighted 1/2 src0, 1/4 src1, 1/8 src2+src3 (dyadic on purpose —
    * see [[tokenBudgetRates]]) and report, per kept source, the
    * observed token mass, the derived u16 rate, and the docs/tokens
    * actually kept.
    */
  def tokenBudgetMixture(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val weights = Map("src0" -> 0.5, "src1" -> 0.25,
      "src2" -> 0.125, "src3" -> 0.125)
    val rates = tokenBudgetRates(docs, "source", weights, tokenBudget = 2000L)
    docs.join(broadcast(rates), Seq("source"))
      .groupBy(col("source"), col("toks_obs"), col("rate_u16"))
      .agg(
        sum(when(Sampling.hashUnit16(col("doc_id")) < col("rate_u16"), 1L)
          .otherwise(0L)).as("docs_kept"),
        sum(when(Sampling.hashUnit16(col("doc_id")) < col("rate_u16"),
          nToks(col("text"))).otherwise(0L)).as("toks_kept"))
      .orderBy(col("source"))
  }

  /** EPOCH (UPSAMPLING) mixture — the half of the published LLM data
    * recipes the rate lanes above cannot express: every keep-rate so
    * far is ≤ 1 (downsample-only), but real mixtures REPEAT their
    * small high-quality sources (GPT-3 runs Wikipedia at ~3.4 epochs,
    * books at ~1.9, while web gets < 1; LLaMA similarly upsamples
    * books/Wikipedia). `epochExpand` applies a per-domain repeat
    * factor r_d = k + f: every doc of domain d is emitted k times,
    * plus once more iff its fixed hash position falls under f — so
    * the EXPECTED multiplicity is exactly r_d, membership of the
    * fractional copy is the deterministic [[Sampling.hashUnit16]]
    * contract (re-runs and corpus growth never flip which docs carry
    * the extra epoch), and each emitted row is tagged with its
    * `epoch` ordinal (0-based) so a training pipeline can interleave
    * or shuffle epochs downstream. r_d = 0 (or absent — a mixture is
    * a whitelist) drops the domain.
    *
    * Scale shape: PURE MAP — the repeat is a per-row
    * `explode(sequence)` fan-out sized by a broadcast-free CASE
    * column (the epoch map is a literal), no shuffle anywhere; output
    * size is Σ r_d·|d| by construction, which is the caller's stated
    * budget. Cross-engine exactness: k = floor(r) on the same IEEE
    * literal both engines parse, and the fractional gate compares
    * hashUnit16 < floor((r−k)·65536) — one subtract, one multiply,
    * one floor on identical doubles (the mix_token_budget doctrine).
    */
  /** Per-row copy count for an epoch map: k = floor(r) integer
    * copies plus one hash-gated fractional copy. ONE definition
    * shared by [[epochExpand]] (gate = the doc's own hash position)
    * and [[phasedSchedule]] (gate salted by phase) — a fix to the
    * gate arithmetic can never reach one lane and miss the other.
    */
  private def copiesCol(domainCol: String, epochs: Map[String, Double],
      gate: Column): Column = {
    require(epochs.values.forall(e => e >= 0.0 && e <= 1000.0),
      "epoch repeat factors must be in [0, 1000]")
    val eCase = epochs.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(domainCol) === k, lit(v)).otherwise(acc)
    }
    floor(eCase).cast("long") +
      when(gate < floor((eCase - floor(eCase)) * lit(65536.0))
        .cast("long"), 1L).otherwise(0L)
  }

  def epochExpand(docs: DataFrame, domainCol: String,
      epochs: Map[String, Double]): DataFrame = {
    val copies =
      copiesCol(domainCol, epochs, Sampling.hashUnit16(col("doc_id")))
    Par.ensure(docs)
      .withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .select(col("*"),
        explode(sequence(lit(0L), col("__copies") - 1)).as("epoch"))
      .drop("__copies")
  }

  /** Driver query `mix_epochs`: expand the corpus at src0×2.5,
    * src1×1.25, src2×0.75, src3×0 (integer-repeat, both fractional
    * branches, and the drop case all live) and report per source the
    * observed docs/tokens and the emitted docs/tokens — books-and-
    * Wikipedia-style upsampling as one summary row per source. The
    * oracle computes the closed form (Σ per-doc multiplicity) —
    * equal by construction since every emitted row carries its doc's
    * token count.
    */
  def epochMixture(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val epochs = Map("src0" -> 2.5, "src1" -> 1.25, "src2" -> 0.75)
    epochExpand(docs, "source", epochs)
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs_kept"),
        count(lit(1)).as("docs_emitted"),
        sum(nToks(col("text"))).as("toks_emitted"))
      .orderBy(col("source"))
  }

  /** Deterministic GLOBAL SHUFFLE + balanced sharding — the last step
    * before a training run: every published pipeline (T5's
    * preprocessing, Dolma, RedPajama) globally shuffles the curated
    * corpus and cuts it into equal shards so each data-loader worker
    * streams an unbiased slice in a reproducible order. The shuffle
    * key is `md5(id)` (the [[Sampling]] portability contract — any
    * engine reproduces the permutation), the shard assignment is
    * round-robin over the shuffled order, so shard sizes differ by at
    * most 1 BY CONSTRUCTION and `pos` is the doc's 0-based position
    * within its shard: `(shard, pos)` is a bijection onto
    * `[0, nShards) × [0, ceil(n/nShards))`.
    *
    * Scale shape — the TeraSort two-phase rank, NOT a global window
    * (a single `row_number() OVER (ORDER BY …)` funnels 100 TB
    * through one task): the md5 space is cut into `buckets`
    * contiguous RANGES on the first 8 hex chars (range, not modulo:
    * the bucket must be a PREFIX of the sort order so
    * per-bucket-rank + bucket-offset equals the global rank), ranks
    * are computed per-bucket in parallel, and the bucket offsets are
    * a `buckets`-row cumulative sum joined back as a broadcast. md5
    * uniformity keeps the ranges balanced at any corpus size; the
    * default bucket count derives from a count-only job at
    * ~1 M rows/bucket (the [[Similarity.semanticDedup]] derived-knob
    * doctrine — a FIXED bucket count is the scale trap).
    *
    * Cross-engine exactness (rung 1): the hex prefix is compared as a
    * STRING everywhere it orders — lowercase hex is ASCII-ordered
    * identically to its numeric value in both engines — and every
    * derived quantity (rank, offset, shard, pos) is integer
    * arithmetic.
    */
  /** ≈ n/targetBucketRows range buckets, floored at 16 — the default
    * width of the two-phase rank; shared by [[shardShuffle]] and
    * [[writeShards]] so the writer's single count job derives the
    * same knob the shuffle would.
    */
  private def derivedBuckets(n: Long, targetBucketRows: Long): Long =
    math.max(16L, (n + targetBucketRows - 1) / targetBucketRows)

  def shardShuffle(docs: DataFrame, idCol: String, nShards: Int,
      buckets: Int = -1, targetBucketRows: Long = 1L << 20): DataFrame =
    shardOrder(docs, idCol, lit(0L), nShards, buckets, targetBucketRows)
      .drop("phase")

  /** CURRICULUM sharding — the staged orderings real training runs
    * use (sequence-length warmup, easy-first curricula): global order
    * is (phase asc, md5(id)) — phase-MAJOR, shuffled WITHIN each
    * phase. Curricula stage difficulty coarsely rather than
    * strict-sorting by a float score (a strict sort correlates
    * adjacent batches and destroys within-phase i.i.d.-ness; the
    * phase column is where the caller quantizes their score). Same
    * balanced round-robin (shard, pos) bijection as [[shardShuffle]]
    * — and because pos order within a shard is the global order
    * restricted to that shard, every data-loader worker streams its
    * slice in phase-monotone order (spec'd).
    *
    * `phase` must be a deterministic integer expression over the row
    * (cross-engine reproducibility — the md5 portability contract
    * extended with one integer key). [[shardShuffle]] is the
    * constant-phase instance.
    */
  def curriculumShards(docs: DataFrame, idCol: String, phase: Column,
      nShards: Int, buckets: Int = -1,
      targetBucketRows: Long = 1L << 20): DataFrame =
    shardOrder(docs, idCol, phase.cast("long"), nShards, buckets,
      targetBucketRows)

  private def shardOrder(docs: DataFrame, idCol: String, phase: Column,
      nShards: Int, buckets: Int, targetBucketRows: Long): DataFrame = {
    require(nShards > 0, "shardShuffle: nShards must be positive")
    val b: Long =
      if (buckets > 0) buckets.toLong
      else derivedBuckets(docs.count(), targetBucketRows)
    // the bucket-offset table rides ONE window task (the only
    // single-partition stage here) and then a broadcast — 2^22 rows
    // ≈ tens of MB is the ceiling both of those stay comfortable at.
    // The derived default (~1 M rows/bucket) keeps b ≈ 10^5 even at
    // 100 TB; hitting this require means an explicit tiny
    // targetBucketRows (or huge `buckets`) pushed a corpus-sized
    // table through one task — raise targetBucketRows instead.
    require(b <= (1L << 22),
      s"shardShuffle: $b buckets exceed the single-task offset-table " +
        s"ceiling ${1L << 22} — raise targetBucketRows (rows/bucket) " +
        "so the bucket table stays driver/broadcast-sized")
    val key = md5(col(idCol).cast("string"))
    // v = numeric value of the first 8 hex chars, in [0, 2^32);
    // bkt = floor(v·b / 2^32) — contiguous, monotone in the key, so
    // ordering by (phase, bkt, key) IS ordering by (phase, key).
    val v = conv(substring(key, 1, 8), 16, 10).cast("long")
    val tagged = docs.select(col(idCol), phase.as("__p"), key.as("__k"),
      shiftright(v * lit(b), 32).as("__b"))
    val wIn = Window.partitionBy(col("__p"), col("__b"))
      .orderBy(col("__k"), col(idCol))
    val ranked = tagged
      .withColumn("__r", row_number().over(wIn).cast("long"))
    // offsets: one row per non-empty (phase, bucket) — bounded by
    // phases×b (phases are a handful by contract); the running sum
    // over those rows is the only single-partition window and it
    // never touches corpus-sized data
    val offs = ranked.groupBy(col("__p"), col("__b"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum(col("__n")).over(Window.orderBy(col("__p"), col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__p"), col("__b"), col("__off"))
    ranked.join(broadcast(offs), Seq("__p", "__b"))
      .withColumn("__g", col("__off") + col("__r") - 1)
      .select(col(idCol), col("__p").as("phase"),
        pmod(col("__g"), lit(nShards.toLong)).as("shard"),
        expr(s"__g div ${nShards}L").as("pos"))
  }

  /** Driver query `mix_curriculum`: sequence-length warmup over the
    * documents corpus — phase = min(3, whitespace tokens div 64)
    * (short docs first, the shortformer-style warmup), 8 shards.
    * FULL oracle: a plain global row_number over (phase, md5, id)
    * reproduces the permutation.
    */
  def curriculumAssign(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    curriculumShards(docs, "doc_id",
      least(lit(3L), call_function("div",
        size(split(col("text"), " ")).cast("long"), lit(64L))),
      nShards = 8)
  }

  /** Driver query `mix_shard_shuffle`: shuffle the documents corpus
    * into 8 balanced training shards; per-doc (shard, pos) — the
    * oracle recomputes the same permutation with a plain global
    * `row_number` over `md5(doc_id)` (equal because the range
    * buckets are a prefix of the sort order).
    */
  def shardShuffleAssign(spark: SparkSession, dir: String): DataFrame =
    shardShuffle(Tables.documents(spark, dir), "doc_id", nShards = 8)

  /** Persist the shards a data loader actually streams: full rows +
    * their [[shardShuffle]] assignment, PARTITIONED BY shard, rows
    * SORTED by `pos` — so a shard dir read in (slice, file) order IS
    * the reproducible training order, no read-side sort. Same
    * one-file-per-cell discipline as the ANN index writers
    * (repartition on the partition columns BEFORE the partitioned
    * write, or every task emits a file into every dir it touches —
    * tasks×cells small files).
    *
    * `filesPerShard` is the 100 TB knob: a single 100 GB shard file
    * is one write task and one read split — instead each shard is
    * cut into `filesPerShard` contiguous POS RANGES (`slice = pos div
    * ceil(shardRows / filesPerShard)` — pure integer arithmetic on
    * the already-global positions), written as `shard=k/slice=j/`
    * dirs; slices are equal-sized (last one ragged), and
    * concatenating a shard's slices in `j` order reproduces exactly
    * the single-file order (spec'd). Write parallelism becomes
    * nShards × filesPerShard tasks.
    */
  def writeShards(docs: DataFrame, idCol: String, path: String,
      nShards: Int, buckets: Int = -1, filesPerShard: Int = 1): Unit =
    writeShardsImpl(docs, idCol, None, path, nShards, buckets,
      filesPerShard)

  /** CURRICULUM-ordered shard writer (r15 VERDICT stretch 9):
    * [[curriculumShards]] composed into [[writeShards]] — phase-major
    * order is what a data loader actually STREAMS, not just an
    * assignment map. Each shard dir, read in (slice, pos) order, is
    * phase-monotone (pos is the global (phase, md5, id) rank
    * restricted to the shard — spec'd), the `phase` column rides
    * every row so a loader can detect phase boundaries without
    * recomputing the expression, and the slice layout is RESUME-SAFE:
    * slice j covers exactly pos ∈ [j·perSlice, (j+1)·perSlice), so
    * resuming an epoch at position p opens slice p div perSlice and
    * skips (p mod perSlice) rows — one file touched, no scan of the
    * earlier slices (spec'd).
    */
  def writeCurriculumShards(docs: DataFrame, idCol: String,
      phase: Column, path: String, nShards: Int, buckets: Int = -1,
      filesPerShard: Int = 1): Unit =
    writeShardsImpl(docs, idCol, Some(phase), path, nShards, buckets,
      filesPerShard)

  private def writeShardsImpl(docs: DataFrame, idCol: String,
      phase: Option[Column], path: String, nShards: Int, buckets: Int,
      filesPerShard: Int): Unit = {
    require(filesPerShard > 0, "writeShards: filesPerShard must be positive")
    // overwrite-over-lazy-input guard (the Layout.compact hazard):
    // the write path re-reads `docs`, so overwriting a directory the
    // scan still needs would destroy the input mid-read
    val outCanon = new java.io.File(path.stripPrefix("file:"))
      .getCanonicalPath
    val sep = java.io.File.separator
    require(!docs.inputFiles.exists { f =>
      val p = new java.io.File(f.stripPrefix("file:")).getCanonicalPath
      val pDir = new java.io.File(p).getParent
      // out at/above an input file: overwrite deletes it mid-read;
      // out INSIDE an input dir: the write pollutes later scans of it
      p == outCanon || p.startsWith(outCanon + sep) ||
        (pDir != null &&
          (outCanon == pDir || outCanon.startsWith(pDir + sep)))
    }, s"writeShards: output path ($path) overlaps an input file — " +
      "overwrite would delete or pollute data the lazy scan reads")
    // ONE count serves both derived knobs (the bucket width inside
    // shardShuffle and the slice width here) — the default path must
    // not scan the corpus twice for two numbers
    val needCount = buckets <= 0 || filesPerShard > 1
    val n = if (needCount) docs.count() else -1L
    val b = if (buckets > 0) buckets
      else math.toIntExact(derivedBuckets(n, 1L << 20))
    val assign = phase match {
      case None => shardShuffle(docs, idCol, nShards, b)
      case Some(p) => curriculumShards(docs, idCol, p, nShards, b)
    }
    val rows = docs.join(assign, Seq(idCol))
    if (filesPerShard == 1) {
      rows.repartition(col("shard"))
        .sortWithinPartitions(col("shard"), col("pos"))
        .write.mode("overwrite").partitionBy("shard").parquet(path)
    } else {
      // shard sizes differ by ≤1, so one ceil over the max shard size
      // (= ceil(n / nShards)) slices every shard identically
      val shardRows = (n + nShards - 1) / nShards.toLong
      val perSlice = math.max(1L, (shardRows + filesPerShard - 1) /
        filesPerShard.toLong)
      rows.withColumn("slice", expr(s"pos div ${perSlice}L"))
        .repartition(col("shard"), col("slice"))
        .sortWithinPartitions(col("shard"), col("slice"), col("pos"))
        .write.mode("overwrite").partitionBy("shard", "slice").parquet(path)
    }
  }

  /** PHASED data schedule — curriculum / "anneal" mixtures: modern
    * recipes (LLaMA 3's final-stage anneal, MiniCPM's two-phase WSD
    * schedule) end training with a phase whose domain weights differ
    * sharply from the main run — high-quality sources upweighted, the
    * web tail dropped. One epoch-map per phase; every emitted row is
    * tagged (phase, epoch) so the loader streams phases in order.
    *
    * Scale shape: ONE corpus scan — per-phase multiplicities are
    * literal CASE columns carried in an exploded P-entry struct array
    * (map-side fan-out, like [[epochExpand]]'s, no shuffle, no
    * per-phase re-scan). The fractional-copy gate is SALTED BY PHASE
    * (hash of "id#phase") so the docs carrying the extra epoch are
    * INDEPENDENT draws per phase — an anneal must not systematically
    * re-see the main phase's fractional picks; within one phase the
    * [[epochExpand]] stability contract holds unchanged (re-runs,
    * repartition, and corpus growth never flip a member).
    */
  def phasedSchedule(docs: DataFrame, domainCol: String,
      phases: Seq[(String, Map[String, Double])]): DataFrame = {
    require(phases.nonEmpty, "phasedSchedule: need at least one phase")
    require(phases.map(_._1).distinct.size == phases.size,
      "phasedSchedule: duplicate phase name")
    val entries = phases.map { case (name, epochs) =>
      val gate = Sampling.hashUnit16(
        concat(col("doc_id").cast("string"), lit("#" + name)))
      struct(lit(name).as("phase"),
        copiesCol(domainCol, epochs, gate).as("copies"))
    }
    Par.ensure(docs)
      .select(col("*"), explode(array(entries: _*)).as("__ph"))
      .filter(col("__ph.copies") > 0)
      .select(col("*"), col("__ph.phase").as("phase"),
        explode(sequence(lit(0L), col("__ph.copies") - 1)).as("epoch"))
      .drop("__ph")
  }

  /** Driver query `mix_anneal`: a two-phase schedule — "main" runs
    * the broad mixture (src0 dominant, tail fractional), "anneal"
    * re-runs the high-quality sources at multi-epoch weights and
    * DROPS src2 entirely (the whitelist contract per phase). One
    * summary row per (phase, source): distinct docs kept, rows and
    * tokens emitted. Oracle = the closed form per phase, unioned.
    */
  def annealMixture(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val phases = Seq(
      "main" -> Map("src0" -> 1.0, "src1" -> 0.5,
        "src2" -> 0.25, "src3" -> 0.25),
      "anneal" -> Map("src0" -> 0.25, "src1" -> 2.5, "src3" -> 3.0))
    phasedSchedule(docs, "source", phases)
      .groupBy(col("phase"), col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs_kept"),
        count(lit(1)).as("docs_emitted"),
        sum(nToks(col("text"))).as("toks_emitted"))
      .orderBy(col("phase"), col("source"))
  }

  /** Temperature-scaled mixture rates (the multilingual-pretraining
    * rebalance of mBERT/XLM-R: sample domain d with probability
    * ∝ n_d^(1/T), T > 1 flattening the head so low-resource domains
    * survive). T = 2 exactly — p_d ∝ √n_d — because IEEE `sqrt` is
    * CORRECTLY ROUNDED on every engine (general `pow` is not): graft
    * trades the free-T knob for bit-reproducible membership.
    *
    * FP discipline ("cents" doctrine, see Temporal): each √n_d is
    * quantized to integer hundredths — `sqrt_c = round(100·√n_d)` —
    * so the normalizer Σ sqrt_c is an INTEGER sum, exact in any
    * order; the expected kept count `budget·sqrt_c_d/Σ sqrt_c` then
    * involves exact integer products and one correctly-rounded
    * division. rate_d = min(1, that/n_d) at u16 granularity.
    */
  /** DoReMi-style domain REWEIGHT step (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    * one multiplicative-weights update of the per-domain mixture from
    * a per-doc loss signal — domains with above-corpus-average excess
    * loss UPWEIGHT (they are under-learned), below-average ones
    * downweight. The paper's exponentiated-gradient
    * α ∝ α·exp(η·excess) is applied in its LINEARIZED
    * multiplicative-weights form α ∝ α·(1 + η·excess) (the
    * Arora–Hazan–Kale MW update, first-order equal for small
    * η·excess): `exp` is a transcendental whose last ulp differs
    * between libm and java.lang.Math, and graft trades the exact
    * exponential for bit-reproducible weights — the sample_temperature
    * T=2 precedent.
    *
    * FP "cents" doctrine: per-domain and corpus mean losses quantize
    * to integer hundredths (ONE correctly-rounded division each);
    * excess, the η product, and the basis-point factor are then exact
    * integer arithmetic; the final normalization is one
    * correctly-rounded division per domain at u16 granularity.
    * `floorBp` keeps every domain alive (DoReMi's uniform-mixing
    * term, as a hard floor).
    *
    * `lossC` is the CALLER's per-doc loss column — a real deployment
    * feeds the proxy model's per-doc log-loss; the driver lane
    * instantiates a deterministic stand-in (token count), which
    * exercises identical update mechanics. One aggregation shuffle at
    * domain cardinality; everything downstream is broadcast.
    */
  def doremiReweight(docs: DataFrame, domainCol: String, lossC: Column,
      etaBpPerCent: Long = 2L, floorBp: Long = 100L): DataFrame = {
    val dom = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_obs"), sum(lossC).as("loss_sum"))
      .select(col(domainCol), col("n_obs"),
        round(lit(100.0) * col("loss_sum").cast("double") /
          col("n_obs").cast("double"), 0).cast("long").as("mean_loss_c"))
    val tot = docs.agg(
      round(lit(100.0) * sum(lossC).cast("double") /
        count(lit(1)).cast("double"), 0).cast("long")
        .as("corpus_mean_c"))
    val fac = dom.crossJoin(broadcast(tot))
      .select(col(domainCol), col("n_obs"), col("mean_loss_c"),
        (col("mean_loss_c") - col("corpus_mean_c")).as("excess_c"))
      .withColumn("factor_bp",
        greatest(lit(floorBp),
          lit(10000L) + lit(etaBpPerCent) * col("excess_c")))
    val z = fac.agg(sum(col("factor_bp")).as("__z"))
    fac.crossJoin(broadcast(z))
      .select(col(domainCol), col("n_obs"), col("mean_loss_c"),
        col("excess_c"), col("factor_bp"),
        floor(lit(65536.0) * col("factor_bp").cast("double") /
          col("__z").cast("double")).cast("long").as("weight_u16"))
  }

  /** Driver query `mix_doremi`: one reweight step over the four
    * sources from uniform, loss proxied by whitespace token count —
    * longer-doc (higher-mass) sources read as higher-loss and
    * upweight, the mechanics a real per-doc log-loss column would
    * drive identically.
    */
  def doremiMixture(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    doremiReweight(docs, "source",
      size(split(col("text"), " ")).cast("long"))
  }

  def temperatureRates(docs: DataFrame, domainCol: String,
      docBudget: Long): DataFrame = {
    val counts = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_obs"))
      .select(col(domainCol), col("n_obs"),
        round(sqrt(col("n_obs").cast("double")) * lit(100.0), 0)
          .cast("long").as("sqrt_c"))
    val tot = counts.agg(sum(col("sqrt_c")).as("sqrt_tot"))
    counts.crossJoin(broadcast(tot))
      .select(col(domainCol), col("n_obs"), col("sqrt_c"),
        floor(least(lit(1.0),
          (lit(docBudget) * col("sqrt_c")).cast("double") /
            (col("sqrt_tot") * col("n_obs")).cast("double"))
          * lit(65536.0)).as("rate_u16"))
  }

  /** Driver query `sample_temperature`: rebalance the five-language
    * corpus at T = 2 toward a 250-doc budget; report per language the
    * observed count, the quantized √, the derived u16 rate, and the
    * kept count — the head (en, 218 docs) downsamples hardest, the
    * tail keeps proportionally more, exactly the temperature contract.
    */
  def temperatureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val rates = temperatureRates(docs, "lang", docBudget = 250L)
    docs.join(broadcast(rates), Seq("lang"))
      .groupBy(col("lang"), col("n_obs"), col("sqrt_c"), col("rate_u16"))
      .agg(sum(when(Sampling.hashUnit16(col("doc_id")) < col("rate_u16"), 1L)
        .otherwise(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }
}
