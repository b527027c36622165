package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic, reproducible sampling — the split discipline a
  * training-data pipeline needs: membership is a pure function of the
  * row's id (content-hash), never of RNG state, partitioning, or
  * execution order. Re-running on a re-partitioned 100 TB corpus
  * yields byte-identical splits; adding rows never reshuffles
  * existing assignments (stable holdouts).
  *
  * Granularity is sixteenths via the first md5 hex nibble — coarse on
  * purpose: it is portable to ANY engine with md5 (the DuckDB oracle
  * included), auditable by eye, and fine enough for split work.
  */
object Sampling {

  private val HexOrder = "0123456789abcdef"

  /** True iff the row falls in the first `sixteenths`/16 of the hash
    * space of `id`.
    */
  def inHashSample(id: Column, sixteenths: Int): Column = {
    require(sixteenths >= 0 && sixteenths <= 16)
    val nibble = substring(md5(id.cast("string")), 1, 1)
    nibble.isin(HexOrder.take(sixteenths).map(_.toString): _*)
  }

  /** Keep ~sixteenths/16 of rows, deterministically by id. */
  def hashSample(df: DataFrame, idCol: String, sixteenths: Int): DataFrame =
    df.filter(inHashSample(col(idCol), sixteenths))

  /** Tag every row train/val: first `trainSixteenths`/16 of the hash
    * space trains, the rest validates. A stable split: new ids never
    * move old rows across the boundary.
    */
  def trainValSplit(df: DataFrame, idCol: String,
      trainSixteenths: Int = 14): DataFrame =
    df.withColumn("split",
      when(inHashSample(col(idCol), trainSixteenths), lit("train"))
        .otherwise(lit("val")))

  /** Stratified deterministic sampling: a different keep-rate (in
    * sixteenths) per stratum value — the "downsample dominant
    * languages / upweight rare ones" knob of corpus curation, with the
    * same stability contract as [[hashSample]] (pure function of id,
    * per-stratum membership never reshuffles as other strata change;
    * strata missing from `rates` keep `defaultSixteenths`). Pure
    * column algebra: the rate map becomes a CASE chain — no join, no
    * shuffle.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Int], defaultSixteenths: Int = 16): DataFrame = {
    val rate = rates.foldLeft(lit(defaultSixteenths)) { case (acc, (k, v)) =>
      require(v >= 0 && v <= 16, s"rate for $k out of [0,16]")
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    // nibble rank < rate  ⇔  member of the stratum's first rate/16
    val nibble = substring(md5(col(idCol).cast("string")), 1, 1)
    val rank = locate0(nibble)
    df.filter(rank < rate)
  }

  /** 0-based position of a hex nibble in "0123456789abcdef" (codegen'd
    * arithmetic on the char, no lookup join).
    */
  private def locate0(nibble: Column): Column = {
    val c = ascii(nibble)
    when(c >= ascii(lit("a")), c - ascii(lit("a")) + 10)
      .otherwise(c - ascii(lit("0")))
  }

  /** The row's position in the hash space as an integer in [0, 65536)
    * — the first FOUR md5 nibbles (1/65536 granularity, vs the
    * sixteenths' 1/16). Same portability doctrine: pure nibble
    * arithmetic any md5-capable engine reproduces bit-for-bit.
    */
  def hashUnit16(id: Column): Column = {
    val h = md5(id.cast("string"))
    (0 until 4).map(i =>
      locate0(substring(h, i + 1, 1)) * (1 << (4 * (3 - i)))).reduce(_ + _)
  }

  /** Per-row PROBABILITY-weighted deterministic sampling: keep a row
    * iff its fixed hash position falls below `weight` (clamped to
    * [0,1]) — the "keep high-quality docs at full rate, downsample
    * the tail proportionally" knob. Same stability contract as
    * [[hashSample]]: membership is a pure function of (id, weight) —
    * re-runs, re-partitions and corpus growth never flip a row, and
    * RAISING a row's weight only ever ADDS it (monotone, spec). Pure
    * map-side column algebra, zero shuffle.
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column): DataFrame =
    df.filter(hashUnit16(col(idCol)) <
      least(lit(1.0), greatest(lit(0.0), weight)) * 65536.0)

  /** Driver-contract queries. */
  def sampleDocuments(spark: SparkSession, dir: String): DataFrame =
    hashSample(Tables.documents(spark, dir), "doc_id", 4)
      .select(col("doc_id"), col("lang"), col("n_chars"))

  def stratifiedCounts(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(spark, dir), "doc_id", "lang",
      Map("en" -> 4, "zh" -> 16, "es" -> 8))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))

  def splitCounts(spark: SparkSession, dir: String): DataFrame =
    trainValSplit(Tables.documents(spark, dir), "doc_id")
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))

  /** Driver contract: length-weighted downsampling — short docs kept
    * proportionally to size, ≥2000-char docs always.
    */
  def weightedDocuments(spark: SparkSession, dir: String): DataFrame =
    weightedSample(Tables.documents(spark, dir), "doc_id",
      col("n_chars").cast("double") / lit(2000.0))
      .select(col("doc_id"), col("lang"), col("n_chars"))

  /** EXACTLY-k deterministic sample: rank every row by the md5 of its
    * id and keep the k smallest — the fixed-size eval-set cut that
    * [[hashSample]]'s rate-based contract can't give (a rate keeps
    * n/mod ± binomial noise; evals want exactly k rows, stable across
    * re-runs and appends-that-don't-change-the-k-smallest). Ranking
    * by a hash, not by id, de-correlates the sample from insertion
    * order. Plans as TakeOrderedAndProject: each task keeps its local
    * k, the driver merges task heads — no global sort, no shuffle of
    * the corpus.
    */
  def fixedSample(df: DataFrame, idCol: String, k: Int): DataFrame =
    df.withColumn("__h", md5(col(idCol).cast("string").cast("binary")))
      .orderBy(col("__h")).limit(k)

  /** Driver contract: a fixed 25-doc eval cut of the corpus. */
  def fixedDocuments(spark: SparkSession, dir: String): DataFrame =
    fixedSample(Tables.documents(spark, dir), "doc_id", 25)
      .select(col("doc_id"), col("__h").as("h"))
}
