package graft

import org.apache.spark.sql.functions._
import graft.operators.{Governance, Sampling}

class GovernanceSpec extends GraftSpecBase {
  import spark.implicits._

  test("purge removes exactly the tombstoned keys and is idempotent") {
    initLog()
    val facts = Seq((1L, "a"), (2L, "b"), (2L, "c"), (3L, "d"))
      .toDF("k", "v")
    val tomb = Seq(2L, 9L).toDF("k") // 9 purges nothing
    val once = Governance.purge(facts, tomb, "k")
    assert(once.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    assert(Governance.purge(once, tomb, "k").count() == once.count())
  }

  test("clusterSafeSplit never splits a near-dup pair across train/val") {
    initLog()
    val docs = spark.range(100).select(col("id").as("doc_id"),
      lit("irrelevant text").as("text"))
    // chains {1-2-3}, {10-11}, rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Governance.clusterSafeSplit(docs, pairs)
    // every cluster is entirely on one side
    val sides = out.groupBy(col("canonical_id"))
      .agg(countDistinct(col("split")).as("n_sides"))
    assert(sides.agg(max(col("n_sides"))).head.getLong(0) == 1L)
    // cluster members share the min label and the split is the
    // canonical id's hash cell, not the member's
    val m = out.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(m(1L)._1 == 1L && m(2L)._1 == 1L && m(3L)._1 == 1L)
    assert(m(2L)._2 == m(1L)._2 && m(3L)._2 == m(1L)._2)
    assert(m(10L)._1 == 10L && m(11L)._1 == 10L)
    val trainFrac = out.filter(col("split") === "train").count().toDouble /
      out.count()
    assert(trainFrac > 0.6 && trainFrac < 1.0) // 14/16 nominal
  }

  test("doc-id splitting leaks; cluster splitting provably cannot") {
    initLog()
    // a pair whose members hash to DIFFERENT doc-id cells — the leak
    // that motivates the operator (doc 3 -> 'val' cell, doc 4 -> 'train'
    // cell under 14/16; found by scanning md5 nibbles)
    val nib = (i: Long) => java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes).map("%02x".format(_)).mkString.head
    val leakPair = (0L to 200L).sliding(2).collectFirst {
      case Seq(a, b) if "ef".contains(nib(a)) != "ef".contains(nib(b)) =>
        (a, b)
    }.get
    val docs = Seq(leakPair._1, leakPair._2).toDF("doc_id")
      .withColumn("text", lit("t"))
    val naive = docs.withColumn("split",
      when(Sampling.inHashSample(col("doc_id"), 14), lit("train"))
        .otherwise(lit("val")))
    assert(naive.select(col("split")).distinct().count() == 2L) // the leak
    val safe = Governance.clusterSafeSplit(docs,
      Seq(leakPair).toDF("id_a", "id_b"))
    assert(safe.select(col("split")).distinct().count() == 1L)
  }

  test("keepBestPerCluster picks max quality, doc_id tie-break") {
    initLog()
    // doc 2 has the highest uniq_ratio in cluster {1,2,3}; docs 5,6 are
    // an identical-text cluster (quality tie -> keep min doc_id)
    val docs = Seq(
      (1L, "x x x x"),          // uniq 1/4
      (2L, "b c d e"),          // uniq 1, no stopwords -> best
      (3L, "y y z z"),          // uniq 1/2
      (4L, "solo doc here"),    // singleton
      (5L, "t u v w"), (6L, "t u v w")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Governance.keepBestPerCluster(docs, pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((2L, 1.0, 3L)))
    assert(out(4L)._1 == 4L && out(4L)._3 == 1L)
    assert(out(5L) == ((5L, 1.0, 2L)))
  }

  test("keepByPriority keeps the trusted source's copy; doc_id tie-break") {
    initLog()
    val docs = Seq(
      (1L, "web", "same text"),     // dup group: curated copy wins
      (2L, "curated", "same text"),
      (3L, "web", "only on web"),   // singleton keeps itself
      (4L, "curated", "twin"),      // same-source dup: min doc_id
      (5L, "curated", "twin")
    ).toDF("doc_id", "source", "text")
    val priority = Seq(("curated", 0L), ("web", 1L)).toDF("source", "rank")
    val out = Governance.keepByPriority(docs, priority).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out == Map(
      2L -> (("curated", 2L)), // beat doc 1 on source rank
      3L -> (("web", 1L)),
      4L -> (("curated", 2L)))) // tie -> min doc_id
  }

  test("keepByPriority refuses an incomplete priority table loudly") {
    initLog()
    val docs = Seq((1L, "web", "t"), (2L, "academic", "t"))
      .toDF("doc_id", "source", "text")
    val priority = Seq(("web", 0L)).toDF("source", "rank")
    // lazy guard: the plan builds fine, the ACTION raises with the
    // offending source named somewhere in the failure chain
    def chain(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} | ${chain(t.getCause)}"
    val e = intercept[Exception] {
      Governance.keepByPriority(docs, priority).collect()
    }
    assert(chain(e).contains("academic"), chain(e))
    // a NULL source fails with the placeholder, not an opaque NPE
    val withNull = Seq((1L, "web", "t"), (2L, null, "t"))
      .toDF("doc_id", "source", "text")
    val e2 = intercept[Exception] {
      Governance.keepByPriority(withNull, priority).collect()
    }
    assert(chain(e2).contains("<null>"), chain(e2))
  }

  test("keepByPriority plan: broadcast priority, algebraic argmin " +
      "(no window over the corpus)") {
    initLog()
    val docs = Seq((1L, "a", "t")).toDF("doc_id", "source", "text")
    val priority = Seq(("a", 0L)).toDF("source", "rank")
    val plan = Governance.keepByPriority(docs, priority)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(!plan.contains("Window"), "argmin must be the algebraic agg")
  }

  test("incrementalDedup classifies exact/near/novel against the corpus only") {
    initLog()
    val corpus = Seq(
      (1L, "the quick brown fox jumps over dogs"),
      (2L, "q w e r t y u i")).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "the quick brown fox jumps over dogs"), // byte-equal to 1
      (11L, "q w e r t y u z"),                     // J=4/6 vs doc 2
      (12L, "completely different content here now"),
      (13L, "too short")).toDF("doc_id", "text")    // <4 tokens: never near
    val out = Governance.incrementalDedup(corpus, delta)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(10L -> "exact_dup", 11L -> "near_dup",
      12L -> "novel", 13L -> "novel"))
  }

  test("incrementalDedup ignores delta-vs-delta duplicates") {
    initLog()
    val corpus = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    // two identical NEW docs: both novel (the batch dedups itself via
    // Dedup.exact afterwards; this operator is strictly delta-vs-corpus)
    val delta = Seq((10L, "z y x w v u t s"), (11L, "z y x w v u t s"))
      .toDF("doc_id", "text")
    val out = Governance.incrementalDedup(corpus, delta)
      .collect().map(r => r.getString(1))
    assert(out.toSeq == Seq("novel", "novel"))
  }

  test("incrementalDedup maxDf: hot-overlap pairs follow the documented recall contract") {
    initLog()
    // 20 boilerplate docs whose shingles are mostly corpus-hot, plus one
    // cold distinctive doc. Delta 100 near-matches doc 3 THROUGH hot
    // shingles; delta 101 near-matches doc 50 through cold ones.
    val corpus = ((0L until 20L).map(i => (i, s"hot hot hot hot tail$i x y z"))
      :+ (50L, "n1 n2 n3 n4 n5 n6 n7 n8")).toDF("doc_id", "text")
    val delta = Seq(
      (100L, "hot hot hot hot tail3 x y w"),  // J=4/6 vs doc 3, overlap hot
      (101L, "n1 n2 n3 n4 n5 n6 n7 w"))       // J=4/6 vs doc 50, overlap cold
      .toDF("doc_id", "text")
    val un = Governance.incrementalDedup(corpus, delta)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(un == Map(100L -> "near_dup", 101L -> "near_dup"))
    // capped: the all-hot-overlap pair is missed (the contract: a pair is
    // found iff enough of its overlap survives the cap); cold pairs are
    // untouched
    val capped = Governance.incrementalDedup(corpus, delta, maxDf = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(capped == Map(100L -> "novel", 101L -> "near_dup"))
  }
}
