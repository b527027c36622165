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

  private def md5U16(id: Long): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Integer.parseInt(hex.substring(0, 4), 16)
  }

  // a: 4 docs x 4 tokens = 16 tokens; b: 8 docs x 2 tokens = 16;
  // c: 4 docs x 1 token (not in the mixture)
  private val tokDocs = ((0L until 4L).map(i => (i, "a", "t t t t")) ++
    (100L until 108L).map(i => (i, "b", "t t")) ++
    (200L until 204L).map(i => (i, "c", "t"))).toDF("doc_id", "domain", "text")

  test("tokenBudgetRates: u16 rates from token mass, dyadic-exact") {
    initLog()
    val rates = Mixture.tokenBudgetRates(tokDocs, "domain",
      Map("a" -> 0.5, "b" -> 0.25), tokenBudget = 16L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // a: min(1, .5*16/16)  = .5  -> 32768 exactly (all dyadic)
    // b: min(1, .25*16/16) = .25 -> 16384
    // c: weight 0 -> rate 0 -> filtered out (whitelist)
    assert(rates == Map("a" -> 32768L, "b" -> 16384L))
  }

  test("applyTokenBudget membership is hashUnit16 — pure function of id") {
    initLog()
    val rates = Mixture.tokenBudgetRates(tokDocs, "domain",
      Map("a" -> 0.5, "b" -> 0.25), tokenBudget = 16L)
    val kept = Mixture.applyTokenBudget(tokDocs, rates, "doc_id", "domain")
      .select(col("doc_id")).as[Long].collect().toSet
    val expected = ((0L until 4L).filter(md5U16(_) < 32768) ++
      (100L until 108L).filter(md5U16(_) < 16384)).toSet
    assert(kept == expected)
    assert(!kept.exists(_ >= 200L))
  }

  test("temperatureRates: T=2 flattens the head, tail keeps full rate") {
    initLog()
    val docs = ((0L until 16L).map(i => (i, "big")) ++
      (100L until 104L).map(i => (i, "mid")) ++
      (200L until 201L).map(i => (i, "rare"))).toDF("doc_id", "domain")
    val rates = Mixture.temperatureRates(docs, "domain", docBudget = 7L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // sqrt_c: big 400, mid 200, rare 100; tot 700
    // big:  7*400/700 = 4 of 16 -> rate .25 -> 16384
    // mid:  7*200/700 = 2 of 4  -> rate .5  -> 32768
    // rare: 7*100/700 = 1 of 1  -> rate 1   -> 65536 (kept in full)
    assert(rates == Map(
      "big" -> ((16L, 400L, 16384L)),
      "mid" -> ((4L, 200L, 32768L)),
      "rare" -> ((1L, 100L, 65536L))))
    // the temperature contract: head keep-RATE strictly below tail's
    assert(rates("big")._3 < rates("mid")._3)
    assert(rates("mid")._3 < rates("rare")._3)
  }

  test("epochExpand: integer repeats exact, fractional epoch " +
      "deterministic and near its rate, zero drops, epoch ordinals") {
    initLog()
    import spark.implicits._
    val docs = (0L until 400L).map { i =>
      val src = s"s${i % 4}"
      (i, s"w1 w2 w3 w4", src)
    }.toDF("doc_id", "text", "source")
    val out = Mixture.epochExpand(docs, "source",
      Map("s0" -> 3.0, "s1" -> 1.5, "s2" -> 0.5))
    val byDoc = out.groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("k"), max(col("epoch")).as("maxe"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
    // s0: EVERY doc exactly 3 copies, epochs 0..2
    val s0 = byDoc.filter(_._2._1 == "s0")
    assert(s0.size == 100 && s0.values.forall(v => v._2 == 3L && v._3 == 2L))
    // s1: every doc 1 or 2 copies; expected fraction ~0.5 of docs
    // carry the extra epoch (hash membership — deterministic, so the
    // exact count is fixed; just bound it sanely for the fixture)
    val s1 = byDoc.filter(_._2._1 == "s1")
    assert(s1.size == 100 && s1.values.forall(v => v._2 == 1L || v._2 == 2L))
    val extra = s1.values.count(_._2 == 2L)
    assert(extra > 25 && extra < 75, s"fractional epoch kept $extra/100")
    // s2 (r<1): a strict subset survives, single copies only
    val s2 = byDoc.filter(_._2._1 == "s2")
    assert(s2.nonEmpty && s2.size < 100 && s2.values.forall(_._2 == 1L))
    // s3 absent from the map: dropped entirely
    assert(!byDoc.values.exists(_._1 == "s3"))
    // determinism: the same call emits the identical multiset
    val again = Mixture.epochExpand(docs.repartition(7), "source",
        Map("s0" -> 3.0, "s1" -> 1.5, "s2" -> 0.5))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == byDoc.map { case (d, v) => d -> v._2 })
  }

  test("driver lanes: token budget and temperature summaries are stable") {
    initLog()
    val tb = Mixture.tokenBudgetMixture(spark, sf).collect()
    assert(tb.length == 4) // the four whitelisted sources
    tb.foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(2) <= 65536L)
      assert(r.getLong(4) <= r.getLong(1)) // kept tokens <= observed
    }
    val ts = Mixture.temperatureSample(spark, sf).collect()
    assert(ts.length == 5) // five languages
    ts.foreach(r => assert(r.getLong(4) <= r.getLong(1)))
  }

  private def md5Hex(id: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("shardShuffle: balanced round-robin over the md5 permutation; " +
      "bucket count never changes the answer") {
    initLog()
    val docs = (0L until 103L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val out = Mixture.shardShuffle(docs, "doc_id", nShards = 7, buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 103)
    // (shard, pos) is a bijection; shard sizes differ by at most 1
    assert(out.map(t => (t._2, t._3)).distinct.length == 103)
    val sizes = out.groupBy(_._2).map(_._2.length)
    assert(sizes.max - sizes.min <= 1 && sizes.sum == 103)
    // equals the literal global row_number over (md5(id), id)
    val expect = (0L until 103L).sortBy(id => (md5Hex(id), id)).zipWithIndex
      .map { case (id, r) => (id, (r % 7).toLong, (r / 7).toLong) }.toSet
    assert(out.toSet == expect)
    // the range buckets are a prefix of the sort order, so ANY bucket
    // count reproduces the identical permutation
    val out64 = Mixture
      .shardShuffle(docs.repartition(5), "doc_id", nShards = 7, buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out64 == out.toSet)
    // the offset table rides one window task + a broadcast: a bucket
    // count past the single-task ceiling must refuse loudly instead
    // of pushing a corpus-sized table through one task
    val e = intercept[IllegalArgumentException](Mixture.shardShuffle(
      docs, "doc_id", nShards = 7, buckets = (1 << 22) + 1))
    assert(e.getMessage.contains("ceiling"), e.getMessage)
  }

  test("curriculumShards: phase-major order (shuffled within phase), " +
      "per-shard pos order is phase-monotone, constant phase " +
      "degenerates to shardShuffle") {
    initLog()
    // phase = id % 3 — three deterministic difficulty stages
    val docs = (0L until 103L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val out = Mixture.curriculumShards(docs, "doc_id",
        pmod(col("doc_id"), lit(3L)), nShards = 7, buckets = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 103)
    // bijection + balance (the shardShuffle contract preserved)
    assert(out.map(t => (t._3, t._4)).distinct.length == 103)
    val sizes = out.groupBy(_._3).map(_._2.length)
    assert(sizes.max - sizes.min <= 1 && sizes.sum == 103)
    // equals the literal global row_number over (phase, md5(id), id)
    val expect = (0L until 103L)
      .sortBy(id => (id % 3, md5Hex(id), id)).zipWithIndex
      .map { case (id, r) =>
        (id, id % 3, (r % 7).toLong, (r / 7).toLong) }.toSet
    assert(out.toSet == expect)
    // within every shard, phase never decreases as pos increases —
    // the property a data-loader worker's stream depends on
    out.groupBy(_._3).values.foreach { rows =>
      val phases = rows.sortBy(_._4).map(_._2)
      assert(phases.zip(phases.tail).forall { case (a, b) => a <= b },
        s"non-monotone phases in a shard: ${phases.toSeq}")
    }
    // bucket count never changes the answer (the prefix-order lemma
    // now over (phase, bkt, key))
    val out64 = Mixture.curriculumShards(docs.repartition(5), "doc_id",
        pmod(col("doc_id"), lit(3L)), nShards = 7, buckets = 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out64 == out.toSet)
    // constant phase ≡ shardShuffle bit-for-bit
    val flat = Mixture.curriculumShards(docs, "doc_id", lit(0L),
        nShards = 7, buckets = 8)
      .drop("phase").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = Mixture.shardShuffle(docs, "doc_id", nShards = 7,
        buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(flat == plain)
  }

  test("phasedSchedule: per-phase closed-form multiplicities; the " +
      "fractional gate draws independently per phase") {
    initLog()
    val docs = (0L until 200L).map(i => (i, "web")).toDF("doc_id", "source")
    def u16(id: Long, salt: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((id.toString + salt).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 4), 16)
    }
    // same 1.5-epoch map in both phases: integer copy always, the
    // fractional extra gated by the PHASE-salted hash
    val out = Mixture.phasedSchedule(docs, "source",
        Seq("a" -> Map("web" -> 1.5), "b" -> Map("web" -> 1.5)))
      .groupBy(col("phase"), col("doc_id"))
      .agg(count(lit(1)).as("k"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    (0L until 200L).foreach { id =>
      Seq("a", "b").foreach { p =>
        val expect = 1L + (if (u16(id, "#" + p) < 32768) 1L else 0L)
        assert(out((p, id)) == expect, s"doc $id phase $p")
      }
    }
    // independence: the extra-epoch doc sets differ between phases
    val extraA = (0L until 200L).filter(id => out(("a", id)) == 2L).toSet
    val extraB = (0L until 200L).filter(id => out(("b", id)) == 2L).toSet
    assert(extraA != extraB,
      "phase-salted gates must not reuse one phase's picks")
    // ~half carry the extra epoch in each phase (0.5 fractional)
    assert(extraA.size > 60 && extraA.size < 140)
  }

  test("writeShards: one file per shard dir, rows inside in training " +
      "(pos) order, nothing lost") {
    initLog()
    val docs = (0L until 60L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-shards-").toString
    try {
      Mixture.writeShards(docs, "doc_id", dir, nShards = 4, buckets = 8)
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
      assert(shardDirs.length == 4)
      var seen = Set.empty[Long]
      shardDirs.foreach { d =>
        val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1,
          s"${d.getName}: ${files.length} data files, expected 1")
        // a single small file is one scan split — read order is file
        // order, which must be the training (pos) order
        val rows = spark.read.parquet(d.toString).collect()
        val poss = rows.map(_.getAs[Long]("pos"))
        assert(poss.toSeq == poss.sorted.toSeq, d.getName)
        assert(poss.head == 0L && poss.last == poss.length - 1L)
        seen ++= rows.map(_.getAs[Long]("doc_id"))
      }
      assert(seen == (0L until 60L).toSet)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("writeShards refuses an output path that overlaps its input") {
    initLog()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-shardguard-").toString
    try {
      val in = s"$dir/in"
      (0L until 10L).map(i => (i, s"d$i")).toDF("doc_id", "text")
        .write.parquet(in)
      val docs = spark.read.parquet(in)
      val e = intercept[IllegalArgumentException](
        Mixture.writeShards(docs, "doc_id", in, nShards = 2, buckets = 4))
      assert(e.getMessage.contains("overlaps"), e.getMessage)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("writeShards multi-file: slices are contiguous pos ranges; " +
      "concatenating them in slice order is the single-file order") {
    initLog()
    val docs = (0L until 61L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-slices-").toString
    try {
      Mixture.writeShards(docs, "doc_id", dir, nShards = 4, buckets = 8,
        filesPerShard = 3)
      // shard sizes 16/15/15/15 → perSlice = ceil(16/3) = 6
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
      assert(shardDirs.length == 4)
      val ref = Mixture.shardShuffle(docs, "doc_id", 4, buckets = 8)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(0)))
        .groupBy(_._1)
        .map { case (s, v) => s -> v.sortBy(_._2).map(_._3).toSeq }
      shardDirs.foreach { d =>
        val shard = d.getName.stripPrefix("shard=").toLong
        val slices = d.listFiles().filter(_.getName.startsWith("slice="))
          .sortBy(_.getName.stripPrefix("slice=").toLong)
        assert(slices.length >= 2 && slices.length <= 3, d.getName)
        slices.foreach(sd => assert(
          sd.listFiles().count(_.getName.endsWith(".parquet")) == 1))
        val concat = slices.flatMap { sd =>
          val rows = spark.read.parquet(sd.toString).collect()
          val poss = rows.map(_.getAs[Long]("pos"))
          assert(poss.toSeq == poss.sorted.toSeq, sd.getName)
          rows.map(_.getAs[Long]("doc_id"))
        }.toSeq
        assert(concat == ref(shard), s"shard $shard")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("writeCurriculumShards: each shard streams phase-monotone in " +
      "pos order, phase rides the rows, slices are resume-safe pos " +
      "ranges, nothing lost") {
    initLog()
    // phase = doc_id div 20 -> 3 phases of 20 docs (a deterministic
    // integer expression, the curriculum contract)
    val docs = (0L until 60L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val phase = expr("doc_id div 20L")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-curshards-").toString
    try {
      Mixture.writeCurriculumShards(docs, "doc_id", phase, dir,
        nShards = 4, buckets = 8, filesPerShard = 2)
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
      assert(shardDirs.length == 4)
      // reference assignment: the curriculumShards map
      val ref = Mixture.curriculumShards(docs, "doc_id", phase,
          nShards = 4, buckets = 8)
        .collect()
        .map(r => (r.getAs[Long]("shard"),
          (r.getAs[Long]("pos"), r.getAs[Long]("doc_id"),
            r.getAs[Long]("phase"))))
        .groupBy(_._1).map { case (s, v) =>
          s -> v.map(_._2).sortBy(_._1).toSeq }
      // shard sizes 15 each -> perSlice = ceil(15/2) = 8
      val perSlice = 8L
      var seen = Set.empty[Long]
      shardDirs.foreach { d =>
        val shard = d.getName.stripPrefix("shard=").toLong
        val slices = d.listFiles().filter(_.getName.startsWith("slice="))
          .sortBy(_.getName.stripPrefix("slice=").toLong)
        assert(slices.nonEmpty, d.getName)
        val concat = slices.zipWithIndex.flatMap { case (sd, j) =>
          val rows = spark.read.parquet(sd.toString).collect()
            .sortBy(_.getAs[Long]("pos"))
          val poss = rows.map(_.getAs[Long]("pos"))
          // RESUME-SAFE: slice j covers exactly
          // pos ∈ [j·perSlice, (j+1)·perSlice) ∩ shard — resuming at
          // pos p opens slice p div perSlice only
          assert(poss.forall(p => p / perSlice == j.toLong),
            s"${d.getName}/${sd.getName}: pos range ${poss.toSeq}")
          rows
        }
        val poss = concat.map(_.getAs[Long]("pos"))
        assert(poss.toSeq == poss.sorted.toSeq && poss.head == 0L)
        // phase-monotone per shard, and the carried phase column
        // matches the expression recomputed from the row
        val phases = concat.map(_.getAs[Long]("phase"))
        assert(phases.toSeq == phases.sorted.toSeq,
          s"shard $shard not phase-monotone: ${phases.toSeq}")
        concat.foreach(r => assert(
          r.getAs[Long]("phase") == r.getAs[Long]("doc_id") / 20L))
        // the streamed order IS the assignment map's order
        assert(concat.map(r => (r.getAs[Long]("pos"),
            r.getAs[Long]("doc_id"), r.getAs[Long]("phase"))).toSeq ==
          ref(shard), s"shard $shard order diverged from the map")
        seen ++= concat.map(_.getAs[Long]("doc_id"))
      }
      assert(seen == (0L until 60L).toSet)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("doremiReweight: hand-computed MW step — high-loss domain " +
      "upweights, low-loss downweights, the floor keeps a collapsing " +
      "domain alive, weights are exact integers") {
    initLog()
    import spark.implicits._
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 20L),   // mean 15.00 → 1500c
      (3L, "b", 30L), (4L, "b", 40L))   // mean 35.00 → 3500c
      .toDF("doc_id", "source", "loss")
    // corpus mean 25.00 → 2500c; excess a = −1000, b = +1000
    // factors: a 10000−2000 = 8000, b 12000; Z = 20000
    // weights: floor(65536·8000/20000)=26214, floor(65536·12000/20000)=39321
    val got = graft.operators.Mixture
      .doremiReweight(docs, "source", col("loss"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got("a") == ((2L, 1500L, -1000L, 8000L, 26214L)), got("a"))
    assert(got("b") == ((2L, 3500L, 1000L, 12000L, 39321L)), got("b"))
    // floor: a domain 90+ cents below the corpus mean would go
    // non-positive — the uniform-mixing floor pins it at floorBp
    val skew = Seq((1L, "tiny", 1L), (2L, "huge", 200L),
      (3L, "huge", 200L), (4L, "huge", 200L))
      .toDF("doc_id", "source", "loss")
    val f = graft.operators.Mixture
      .doremiReweight(skew, "source", col("loss"))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(f("tiny") == 100L, f.toString)   // clamped, not negative
    assert(f("huge") > 10000L)
  }
}
