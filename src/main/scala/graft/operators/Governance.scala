package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Corpus governance — the operational layer a 100 TB training-data
  * pipeline runs continuously, beyond one-shot analytics:
  *
  *  - deletion propagation (right-to-be-forgotten): purge every trace
  *    of a tombstoned entity across the fact chain, with an audit;
  *  - leakage-safe dataset splits: train/val membership decided per
  *    near-dup CLUSTER, never per document, so a near-copy of a
  *    training doc can never land in the holdout;
  *  - cluster representative selection: keep the best-quality member
  *    of each near-dup cluster (not merely the smallest id);
  *  - incremental (delta-vs-corpus) dedup: classify each newly
  *    ingested document against the existing corpus without
  *    re-clustering the corpus.
  *
  * All pure column algebra over the same primitives the dedup family
  * proves out (ShingleWindows hashes, md5 hash-space splits,
  * min-label components).
  */
object Governance {

  /** Remove every row of `df` whose `key` appears in `tombstones`.
    * A plain left-anti equi-join: Catalyst broadcasts the tombstone
    * side when it fits (the usual GDPR case — deletion requests are
    * tiny next to the corpus) and falls back to a shuffled anti-join
    * when it does not; no broadcast hint, so a large tombstone set
    * can never OOM the driver.
    */
  def purge(df: DataFrame, tombstones: DataFrame, key: String): DataFrame =
    df.join(tombstones.select(col(key)).distinct(), Seq(key), "left_anti")

  /** Cascading purge audit over the customer → orders → lineitem
    * chain: tombstoned customers (a deterministic 1/16 hash sample —
    * standing in for a deletion-request table) take their orders, and
    * those orders take their line items. Emits one audit row per
    * table: total rows and rows the purge would remove.
    *
    * Scale shape: the cascade is two semi-joins, each shuffling on
    * its own fact key (o_custkey, then l_orderkey) with the counts
    * reduced map-side; nothing is collected and nothing is
    * broadcast-forced, so the same plan runs when the tombstone set
    * is a billion keys.
    */
  def purgeAudit(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val tomb = cust
      .filter(Sampling.inHashSample(col("c_custkey"), 1))
      .select(col("c_custkey"))
    val purgedOrders = orders.join(tomb,
      col("o_custkey") === col("c_custkey"), "left_semi")
    val purgedLi = li.join(purgedOrders.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    def audit(name: String, all: DataFrame, purged: DataFrame): DataFrame =
      all.agg(count(lit(1)).as("n_rows"))
        .crossJoin(purged.agg(count(lit(1)).as("n_purged")))
        .select(lit(name).as("tbl"), col("n_rows"), col("n_purged"))
    audit("customer", cust, tomb)
      .unionByName(audit("orders", orders, purgedOrders))
      .unionByName(audit("lineitem", li, purgedLi))
  }

  /** Leakage-safe train/val split: membership is a pure function of
    * the near-dup cluster's canonical id, so every near-duplicate
    * lands on the SAME side of the boundary. Hashing doc_id instead
    * (the naive split) puts ~1/16 of each cluster's members in the
    * holdout — eval contamination by construction. Same determinism
    * contract as [[Sampling]]: re-runs and re-partitions never move a
    * cluster, and new singleton docs never reshuffle old ones.
    */
  def clusterSafeSplit(docs: DataFrame, pairs: DataFrame,
      trainSixteenths: Int = 14): DataFrame =
    Dedup.canonicalIds(docs, pairs)
      .withColumn("split",
        when(Sampling.inHashSample(col("canonical_id"), trainSixteenths),
          lit("train")).otherwise(lit("val")))

  /** Driver contract: split on the exact tau=0.8 near-dup graph
    * (LSH-accelerated, equals brute force — see
    * [[Dedup.minhashLshPairs]]).
    */
  def clusterSafeSplitDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    clusterSafeSplit(docs, Dedup.minhashLshPairs(docs))
  }

  /** One representative per near-dup cluster: the highest
    * `quality_score` member ([[TextAnalysis.qualityScores]]), doc_id
    * breaking ties. "Keep the smallest id" (exact dedup's pick) is
    * arbitrary; a curation pipeline keeps the BEST copy — the one
    * whose boilerplate wasn't truncated, whose encoding survived.
    *
    * The argmax is algebraic — `max(struct(quality, -doc_id))` —
    * so it combines map-side and a viral mega-cluster collapses
    * BEFORE the shuffle; no per-cluster sort, no hot-task window
    * (the dedup_segment r6 lesson, applied from the start).
    */
  def keepBestPerCluster(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val quality = TextAnalysis.qualityScores(docs)
      .select(col("doc_id"), col("quality_score"))
    Dedup.canonicalIds(docs, pairs)
      .join(quality, "doc_id")
      .groupBy(col("canonical_id"))
      .agg(
        max(struct(col("quality_score").as("q"),
          (-col("doc_id")).as("nid"))).as("m"),
        count(lit(1)).as("n_members"))
      .select(col("canonical_id"), (-col("m.nid")).as("keep_id"),
        col("m.q").as("quality_score"), col("n_members"))
  }

  def keepBestDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    keepBestPerCluster(docs, Dedup.minhashLshPairs(docs))
  }

  /** Cross-source PRIORITY dedup — the SlimPajama/Dolma policy twin
    * of [[keepBestPerCluster]]: when the same text appears in several
    * SOURCES, keep the copy from the most trusted one (curated corpus
    * beats web crawl), not the highest-scoring one — source identity,
    * not content quality, is the tiebreaker a mixture designer wants
    * when provenance drives licensing/quality guarantees.
    *
    * `priority` is a (source, rank) table, rank 0 = most preferred —
    * dimension-sized, broadcast. The keeper of each exact-dup group
    * is `min(struct(rank, doc_id, source))` — algebraic, so it
    * combines map-side and a viral mega-group collapses BEFORE the
    * shuffle (no per-group sort, no window; the keepBest discipline).
    * A source absent from the priority table (or a NULL source, which
    * no rank row can match) FAILS LOUDLY: an inner join would
    * silently drop the whole unranked source — silent data loss in a
    * keeper — and any default rank is a policy decision the caller
    * must make explicitly. The guard is a `coalesce(rank,
    * raise_error(...))` inside the one existing pass — loud, lazy
    * (no eager pre-scan job; the plan stays composable), and free:
    * the corpus is scanned once and the md5 group key remains the
    * only shuffle.
    */
  def keepByPriority(docs: DataFrame, priority: DataFrame): DataFrame =
    docs.join(broadcast(priority), Seq("source"), "left")
      .withColumn("rank", coalesce(col("rank"), raise_error(concat(
        lit("keepByPriority: source without a priority rank: "),
        coalesce(col("source"), lit("<null>")),
        lit(" — extend the priority table (an unranked source would " +
          "otherwise be silently dropped)")))))
      .groupBy(md5(col("text")).as("h"))
      .agg(min(struct(col("rank"), col("doc_id"), col("source"))).as("m"),
        count(lit(1)).as("n_members"))
      .select(col("m.doc_id").as("keep_id"),
        col("m.source").as("kept_source"), col("n_members"))

  /** Driver contract `dedup_priority`: priority = lexicographic
    * source order (src0 most trusted — a deterministic stand-in for
    * the curated>web ranking a real pipeline configures), keep one
    * doc per exact-text group. Full rung-1 oracle (argmin via
    * window twin).
    */
  def priorityDedupDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val priority = docs.select(col("source")).distinct()
      .withColumn("rank",
        row_number().over(Window.orderBy(col("source"))).cast("long"))
    // no trailing sort (r17): presentation-only (row-sorted compare)
    keepByPriority(docs, priority)
  }

  /** Incremental (delta-vs-corpus) dedup: classify each new document
    * as `exact_dup` (byte-identical to a corpus doc), `near_dup`
    * (n-gram Jaccard ≥ tau against some corpus doc), or `novel` —
    * WITHOUT touching corpus-vs-corpus pairs. This is the steady
    * state of a production pipeline: the corpus index is maintained
    * once; each ingest batch only probes it, so per-batch work is
    * O(|delta| × avg df), not O(|corpus|²).
    *
    * Same exactness machinery as [[Dedup.ngramJaccardPairs]]: 128-bit
    * ShingleWindows keys, size-ratio pruning inside the join, and the
    * optional `maxDf` hot-shingle cap (identical recall contract).
    * The df>1 prune does NOT apply here — a shingle occurring once on
    * each side is exactly the match we're probing for.
    */
  def incrementalDedup(corpus: DataFrame, delta: DataFrame,
      n: Int = 4, tau: Double = 0.5,
      maxDf: Int = Int.MaxValue): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    def exploded(docs: DataFrame, idAs: String, szAs: String): DataFrame = {
      val toks = split(col("text"), " ")
      Par.ensure(docs)
        .filter(size(split(col("text"), " ")) >= n)
        .select(col("doc_id").as(idAs),
          column(graft.functions.ShingleWindows(expression(toks), n)).as("hp"))
        .select(col(idAs), size(col("hp")).as(szAs), explode(col("hp")).as("p"))
        .select(col(idAs), col(szAs), col("p.h1").as("h1"), col("p.h2").as("h2"))
    }
    val probe = exploded(delta, "doc_id", "sz_d")
    val indexAll = exploded(corpus, "corpus_id", "sz_c")
    val index = if (maxDf == Int.MaxValue) indexAll else {
      val hot = indexAll.groupBy(col("h1"), col("h2"))
        .agg(count(lit(1)).as("df")).filter(col("df") > maxDf)
        .select(col("h1"), col("h2"))
      indexAll.join(broadcast(hot), Seq("h1", "h2"), "left_anti")
    }
    val near = probe.join(index,
        probe("h1") === index("h1") && probe("h2") === index("h2") &&
        probe("sz_d") >= index("sz_c") * tau &&
        index("sz_c") >= probe("sz_d") * tau)
      .groupBy(col("doc_id"), col("corpus_id"), col("sz_d"), col("sz_c"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard", round(col("common").cast("double") /
        (col("sz_d") + col("sz_c") - col("common")), 6))
      .filter(col("jaccard") >= tau)
      .select(col("doc_id")).distinct()
    val exact = delta.select(col("doc_id"), md5(col("text")).as("th"))
      .join(corpus.select(md5(col("text")).as("th")).distinct(), Seq("th"),
        "left_semi")
      .select(col("doc_id"))
    delta.select(col("doc_id"))
      .join(exact.withColumn("is_exact", lit(true)), Seq("doc_id"), "left")
      .join(near.withColumn("is_near", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_exact"), lit("exact_dup"))
          .when(col("is_near"), lit("near_dup"))
          .otherwise(lit("novel")).as("status"))
  }

  /** Driver contract: the deterministic 15/16 of the hash space is
    * the standing corpus; the remaining 1/16 is the incoming batch.
    */
  def incrementalDedupDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    incrementalDedup(
      docs.filter(Sampling.inHashSample(col("doc_id"), 15)),
      docs.filter(!Sampling.inHashSample(col("doc_id"), 15)))
  }
}
