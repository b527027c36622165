package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins/aggregations.
  *
  * AQE's skew-join splitting (on by default in graft sessions) handles
  * most cases at runtime; these are the explicit forms for when the
  * skew is KNOWN (a handful of mega-keys at 100 TB) and the plan
  * should never materialize a hot partition in the first place.
  */
object Skew {

  /** Salted inner equi-join on `key`: the left side gets a
    * deterministic salt in [0, factor) (hashed from the whole row via
    * monotonically_increasing_id-free xxhash of the key + a row
    * discriminator column), the right side is replicated `factor`
    * times, and the join key becomes (key, salt) — a hot key's rows
    * spread over `factor` partitions instead of one.
    *
    * `discriminator` must be a left column that varies within a key
    * (any unique-ish id) so the salt actually distributes.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      discriminator: String, factor: Int = 8): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(key), col(discriminator)), lit(factor.toLong)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-prefiltered inner equi-join: build a bloom filter of the
    * build side's keys (distributed treeAggregate via
    * `df.stat.bloomFilter` — driver holds only the BITS, ~1.2 MB for
    * 10^6 keys at 1% fpp), then drop probe rows that cannot match
    * BEFORE the shuffle. With a selective build side this removes the
    * bulk of the probe side's shuffle I/O — the classic sketch-pruned
    * join for fact⋈filtered-dim at 100 TB when the dim is too big to
    * broadcast but its KEY SET sketches small. Bloom false positives
    * only let extra rows through to the exact join — results are
    * identical to the plain join (equality spec).
    *
    * The probe predicate is the native codegen'd
    * [[graft.functions.BloomMightContain]]; the filter bytes ride the
    * plan like a scalar-subquery constant. For filters much larger
    * than ~10 MB prefer a broadcast semi-join instead.
    */
  def bloomPrefilteredJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    val bf = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    probe
      .filter(column(graft.functions.BloomMightContain(
        expression(col(probeKey)), bos.toByteArray)))
      .join(build, col(probeKey) === col(buildKey))
  }

  /** Two-phase (salted) aggregation: partial sums per (key, salt),
    * then final combine per key. Spark's map-side partial aggregation
    * already gives this for algebraic aggs; the explicit form matters
    * for high-cardinality combiners (collect-like, exact distinct)
    * where one reducer would otherwise hold a mega-key's whole group.
    */
  def saltedDistinctCount(df: DataFrame, key: String, value: String,
      factor: Int = 8): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(value)), lit(factor.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(value)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n_distinct"))

  /** Count-min-sketch hot-key estimates (Cormode & Muthukrishnan
    * 2005): candidates come from a cheap SAMPLE's top-k, their counts
    * from a one-pass CMS over the FULL data (`df.stat.countMinSketch`
    * tree-aggregates per-partition sketches; the driver holds only
    * the eps×confidence-sized counter grid, never keys). The sketch
    * never undercounts, so a hot key surfaced by the sample gets a
    * certified-at-least estimate — the cheap pre-join skew probe when
    * even [[graft.operators.BatchQueries.heavyHitterUsers]]'s exact
    * two-phase aggregate is too much (its shuffle carries every
    * distinct key; this carries a fixed-size grid per partition).
    * Estimates are upper bounds within eps·N at the given confidence.
    * `key` must be an integral column (point queries go through the
    * sketch's long hashing); string keys need only an estimateCount
    * overload swap.
    */
  def cmsHotKeys(df: DataFrame, key: String, k: Int = 15,
      sampleFraction: Double = 0.1, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cms = df.stat.countMinSketch(key, eps, confidence, seed)
    val candidates = df.sample(withReplacement = false, sampleFraction, seed)
      .groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col(key))
      .limit(k)
      .select(col(key).cast("long")).as[Long].collect()
    candidates.toSeq
      .map(c => (c, cms.estimateCount(java.lang.Long.valueOf(c))))
      .toDF(key, "est_count")
      .orderBy(col("est_count").desc, col(key))
  }
}
