package graft

import org.apache.spark.sql.functions._
import graft.operators.Affinity

class AffinitySpec extends GraftSpecBase {
  import spark.implicits._

  private val baskets = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "c"),
    (4L, "a"),
    (5L, "b"), (5L, "c")).toDF("basket", "item")

  test("basketPairs counts co-occurrence and lift exactly") {
    initLog()
    val out = Affinity.basketPairs(baskets, "basket", "item").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // N=5 baskets; cnt a=4, b=3, c=3
    // (a,b): 2 baskets, lift = 2/4*5/3 = 0.833333
    // (a,c): 2, lift = 0.833333; (b,c): 2, lift = 2/3*5/3 = 1.111111
    assert(out(("a", "b")) == ((2L, 0.833333)))
    assert(out(("a", "c")) == ((2L, 0.833333)))
    assert(out(("b", "c")) == ((2L, 1.111111)))
    assert(out.size == 3)
  }

  test("within-basket duplicates count once") {
    initLog()
    val dup = baskets.unionAll(Seq((1L, "a"), (1L, "a")).toDF("basket", "item"))
    val out = Affinity.basketPairs(dup, "basket", "item").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("a", "b")) == 2L)
  }

  test("top-k is deterministic: count desc, then pair asc") {
    initLog()
    val out = Affinity.basketPairs(baskets, "basket", "item", k = 2).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("a", "b"), ("a", "c")))
  }

  test("maxBasket drops pathological containers before the pair join") {
    initLog()
    // basket 99 holds 40 items -> 780 pairs; capped at 10 it contributes none
    val mega = (0 until 40).map(i => (99L, s"m$i")).toDF("basket", "item")
    val out = Affinity.basketPairs(baskets.unionAll(mega), "basket", "item",
      k = 1000, maxBasket = 10)
    assert(out.count() == 3L)
    // and the cap changes N: 5 normal baskets remain
    val lift = out.filter(col("item_a") === "b" && col("item_b") === "c")
      .head.getDouble(3)
    assert(lift == 1.111111)
  }
}
