package graft

import org.apache.spark.sql.functions._
import graft.operators.Mixture

class MixtureSpec extends GraftSpecBase {
  import spark.implicits._

  private def md5Nibble(id: Long): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Integer.parseInt(hex.substring(0, 1), 16)
  }

  private val docs = ((0L until 4L).map(i => (i, "a")) ++
    (100L until 108L).map(i => (i, "b")) ++
    (200L until 204L).map(i => (i, "c"))).toDF("doc_id", "domain")

  test("mixtureRates derives the per-domain sixteenth rate from the skew") {
    initLog()
    val rates = Mixture.mixtureRates(docs, "domain",
      Map("a" -> 0.5, "b" -> 0.5), budgetShare = 0.375)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // budget = 16 * 0.375 = 6 rows; target 3 each:
    // a: floor(16 * .5 * 6 / 4)  = 12/16ths of 4 docs ≈ 3
    // b: floor(16 * .5 * 6 / 8)  =  6/16ths of 8 docs ≈ 3
    // c: not in the mixture -> rate 0 (whitelist semantics)
    assert(rates == Map("a" -> ((4L, 12L)), "b" -> ((8L, 6L)),
      "c" -> ((4L, 0L))))
  }

  test("rate saturates at 16 when the target exceeds the domain's supply") {
    initLog()
    val rates = Mixture.mixtureRates(docs, "domain",
      Map("a" -> 1.0), budgetShare = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rates("a") == 16L) // wants 16 rows from 4 docs: keep all
  }

  test("applyMixture membership is the md5 nibble rank — pure function of id") {
    initLog()
    val rates = Mixture.mixtureRates(docs, "domain",
      Map("a" -> 0.5, "b" -> 0.5), budgetShare = 0.375)
    val kept = Mixture.applyMixture(docs, rates, "doc_id", "domain")
      .select(col("doc_id")).as[Long].collect().toSet
    val expected = ((0L until 4L).filter(md5Nibble(_) < 12) ++
      (100L until 108L).filter(md5Nibble(_) < 6)).toSet
    assert(kept == expected)
    assert(!kept.exists(_ >= 200L)) // whitelist: domain c fully dropped
  }

  test("membership is stable under corpus growth at fixed rates") {
    initLog()
    val rates = Mixture.mixtureRates(docs, "domain",
      Map("a" -> 0.5, "b" -> 0.5), budgetShare = 0.375)
    val grown = docs.union(Seq((300L, "a"), (301L, "b"))
      .toDF("doc_id", "domain"))
    val keptSmall = Mixture.applyMixture(docs, rates, "doc_id", "domain")
      .select(col("doc_id")).as[Long].collect().toSet
    val keptGrown = Mixture.applyMixture(grown, rates, "doc_id", "domain")
      .select(col("doc_id")).as[Long].collect().toSet
    // every original member survives; growth only ADDS members
    assert(keptSmall.subsetOf(keptGrown))
  }
}
