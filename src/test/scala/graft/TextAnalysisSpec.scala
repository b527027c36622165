package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, TextAnalysis}

class TextAnalysisSpec extends GraftSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the cat sat on the mat", "en", "s", 22L),
    (1L, "alpha bravo charlie delta echo foxtrot golf hotel india", "en", "s", 55L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("token counts: whitespace and regex tokens") {
    initLog()
    val r = TextAnalysis.tokenCounts(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(0L).getAs[Long]("n_ws_tokens") == 6L)
    assert(r(0L).getAs[Long]("n_re_tokens") == 6L)
    assert(r(0L).getAs[Long]("n_chars_m") == 22L)
  }

  test("quality: stopword and uniqueness ratios") {
    initLog()
    val r = TextAnalysis.qualityScores(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // "the" twice + "on" = 3 stopwords of 6 tokens
    assert(math.abs(r(0L).getAs[Double]("stop_ratio") - 0.5) < 1e-9)
    // 5 distinct of 6
    assert(math.abs(r(0L).getAs[Double]("uniq_ratio") - 5.0 / 6) < 1e-6)
    val q = r(1L).getAs[Double]("quality_score")
    assert(q >= 0.0 && q <= 1.0)
  }

  test("fingerprint: only docs with >= 8 tokens, stable value") {
    initLog()
    val out = TextAnalysis.fingerprints(docs).collect()
    assert(out.length == 1 && out.head.getAs[Long]("doc_id") == 1L)
    val again = TextAnalysis.fingerprints(docs).collect()
    assert(out.head.getAs[String]("fingerprint") ==
      again.head.getAs[String]("fingerprint"))
  }

  test("langid emits a known label per doc") {
    initLog()
    val out = TextAnalysis.languageId(docs).collect()
    val labels = TextAnalysis.LangMarkers.map(_._1).toSet
    assert(out.forall(r => labels.contains(r.getAs[String]("lang_pred"))))
    // doc 0 is English-marked ("the" twice)
    assert(out.find(_.getAs[Long]("doc_id") == 0L).get
      .getAs[String]("lang_pred") == "en")
  }

  test("trained n-gram langid recovers distinctive languages") {
    initLog()
    // synthetic corpora with genuinely distinct character statistics
    def mk(lang: String, words: Seq[String], n: Int) =
      (0 until n).map(i => (lang + i, lang,
        Seq.tabulate(30)(j => words((i + j) % words.size)).mkString(" ")))
    val train = (
      mk("en", Seq("the", "quick", "brown", "fox", "jumps", "with"), 8) ++
      mk("de", Seq("über", "schnell", "zeitung", "straße", "mädchen", "größe"), 8) ++
      mk("fr", Seq("être", "déjà", "français", "où", "château", "élève"), 8))
      .map { case (id, lang, text) => (id.hashCode.toLong, text, lang) }
      .toDF("doc_id", "text", "lang")
    val profiles = TextAnalysis.trainLangProfiles(train, topM = 120)
    val pred = TextAnalysis.classifyLang(train, profiles)
      .join(train.select(col("doc_id"), col("lang")), "doc_id")
    val acc = pred.filter(col("lang_pred") === col("lang")).count().toDouble /
      pred.count()
    assert(acc >= 0.9, s"accuracy $acc")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunking: stride windows cover the doc, tail kept, md5 stable") {
    initLog()
    val toks80 = (0 until 80).map(i => s"t$i")
    val d = Seq(
      (0L, toks80.mkString(" "), "en", "s", 0L),
      (1L, "alpha bravo charlie", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.chunkDocs(d, window = 32, stride = 24).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) -> r).toMap
    // 80 tokens, window 32, stride 24: starts 0/24/48, all full-width
    assert(out.keys.count(_._1 == 0L) == 3)
    assert(Seq(0L, 1L, 2L).forall(c =>
      out((0L, c)).getAs[Long]("n_chunk_tokens") == 32L))
    assert(out((0L, 1L)).getAs[String]("chunk_md5") ==
      md5hex(toks80.slice(24, 56).mkString(" ")))
    // short doc: one chunk, whole doc
    assert(out.keys.count(_._1 == 1L) == 1)
    assert(out((1L, 0L)).getAs[Long]("n_chunk_tokens") == 3L)
    assert(out((1L, 0L)).getAs[String]("chunk_md5") ==
      md5hex("alpha bravo charlie"))
  }

  test("chunking invariants hold for every length 1..100 under three geometries") {
    initLog()
    for ((w, s) <- Seq((32, 24), (10, 10), (5, 3))) {
      val d = (1 to 100).map(n =>
        (n.toLong, (0 until n).map(i => s"t$i").mkString(" "), "en", "s", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val got = TextAnalysis.chunkDocs(d, window = w, stride = s).collect()
        .groupBy(_.getAs[Long]("doc_id"))
      (1 to 100).foreach { n =>
        val chunks = got(n.toLong).sortBy(_.getAs[Long]("chunk_id"))
        val expectChunks = 1 + math.ceil(math.max(0, n - w) / s.toDouble).toInt
        assert(chunks.length == expectChunks, s"n=$n w=$w s=$s")
        // sizes: full windows except a possibly-short tail; tail non-empty
        chunks.dropRight(1).foreach(c =>
          assert(c.getAs[Long]("n_chunk_tokens") == w.toLong))
        val tail = chunks.last.getAs[Long]("n_chunk_tokens")
        assert(tail >= 1 && tail <= w)
        // coverage: last chunk reaches the final token
        val lastStart = (chunks.length - 1).toLong * s
        assert(lastStart + tail == n.toLong, s"n=$n w=$w s=$s tail=$tail")
        // content: every chunk md5 matches a locally computed slice
        chunks.foreach { c =>
          val st = c.getAs[Long]("chunk_id").toInt * s
          val expect = (st until math.min(st + w, n))
            .map(i => s"t$i").mkString(" ")
          assert(c.getAs[String]("chunk_md5") == md5hex(expect))
        }
      }
    }
  }

  test("normalization is idempotent and canonical on nasty inputs") {
    initLog()
    val nasty = Seq(
      "", "   ", "!!!", "a", "A  B\tC", "ÉÈê çà ÜSS", "日本語 テスト",
      "mixed   CASE,with;punct!and2 numbers", "--=[]{}()<>--", "a" * 500,
      "tab\tnewline mix  \t ", "ünïcödé wörds")
      .zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = nasty.select(col("doc_id"),
      TextAnalysis.normalized(col("text")).as("n1"),
      TextAnalysis.normalized(TextAnalysis.normalized(col("text"))).as("n2"))
      .collect()
    out.foreach { r =>
      val n1 = r.getAs[String]("n1")
      assert(n1 == r.getAs[String]("n2"), s"idempotence: '$n1'")
      assert(!n1.contains("  "), "no double spaces")
      assert(n1 == n1.trim, "trimmed")
      assert(n1 == n1.toLowerCase, "lowercased")
    }
  }

  test("contamination counts shared benchmark shingles, excludes benchmark") {
    initLog()
    val d = Seq(
      (20L, "a b c d e f g h", "en", "s", 0L), // benchmark (20 % 20 == 0)
      (1L, "a b c d x y z w", "en", "s", 0L), // shares exactly "a b c d"
      (2L, "p q r s t u v w2", "en", "s", 0L)) // shares nothing
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.contamination(d, n = 4).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("doc_id") == 1L)
    assert(out.head.getAs[Long]("n_shared") == 1L)
    // general form: caller-supplied benchmark table, same answer
    val probe = d.filter(col("doc_id") =!= 20L)
    val bench = d.filter(col("doc_id") === 20L).select(col("doc_id"), col("text"))
    val gen = TextAnalysis.contamination(probe, bench, n = 4).collect()
    assert(gen.length == 1 && gen.head.getAs[Long]("doc_id") == 1L &&
      gen.head.getAs[Long]("n_shared") == 1L)
  }

  test("repetition: top-bigram share on a hand-computed doc") {
    initLog()
    val d = Seq((0L, "a b a b a b", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.repetitionScores(d).collect().head
    // bigrams: "a b","b a","a b","b a","a b" -> 5 total, top 3
    assert(r.getAs[Long]("n_2grams") == 5L)
    assert(r.getAs[Long]("top_count") == 3L)
    assert(math.abs(r.getAs[Double]("top_share") - 0.6) < 1e-9)
  }

  test("top-ngrams: hash-keyed form equals string-keyed form incl. boundary ties") {
    initLog()
    // df: "x y"=2, "a b"=2, "c d"=2, rest 1. k=2 must keep the two
    // lexicographically smallest of the three-way tie — the exact
    // boundary case the threshold + string-recovery design exists for.
    val d = Seq(
      (0L, "x y x y a b", "en", "s", 0L),
      (1L, "x y c d", "en", "s", 0L),
      (2L, "a b c d", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ref = d
      .filter(size(split(col("text"), " ")) >= 2)
      .select(explode(graft.operators.Dedup.shingles(col("text"), 2)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("gram")).limit(2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = TextAnalysis.topNgrams(d, n = 2, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == ref)
    assert(got == Seq(("a b", 2L), ("c d", 2L)))
  }

  test("normalization lowercases, strips punctuation, collapses spaces") {
    initLog()
    val d = Seq(
      (0L, "  Hello,   WORLD!! Café #42 中文。 ", "en", "s", 0L),
      (1L, "already clean text", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val norm = d.select(col("doc_id"),
      TextAnalysis.normalized(col("text")).as("n")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("n")).toMap
    assert(norm(0L) == "hello world café 42 中文")
    assert(norm(1L) == "already clean text")
    val out = TextAnalysis.normalizeDocs(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Long]("n_norm_tokens") == 5L)
    assert(out(0L).getAs[String]("norm_md5") == md5hex(norm(0L)))
  }

  test("pii scrub counts and redacts planted emails/ips/phones") {
    initLog()
    val d = Seq(
      (0L, "mail a@b.com and c.d+x@e.org ip 10.0.0.1 tel +1 (555) 123-4567 end",
        "en", "s", 0L),
      (1L, "no pii here", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.piiScrub(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Long]("n_emails") == 2L)
    assert(out(0L).getAs[Long]("n_ips") == 1L)
    assert(out(0L).getAs[Long]("n_phones") == 1L)
    assert(out(0L).getAs[String]("scrubbed_md5") ==
      md5hex("mail <EMAIL> and <EMAIL> ip <IP> tel <PHONE> end"))
    assert(out(1L).getAs[Long]("n_emails") == 0L)
    assert(out(1L).getAs[String]("scrubbed_md5") == md5hex("no pii here"))
  }

  test("multimodal: frame offsets and decode stub batch shape") {
    initLog()
    val text300 = ("x" * 299) + "y"
    val d = Seq((0L, text300, "en", "s", 300L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val frames = Multimodal.frameSample(d).collect()
    assert(frames.length == 1, "3 frames, stride 10 -> only frame 0 sampled")
    assert(frames.head.getAs[Long]("byte_offset") == 0L)
    val meta = Multimodal.binaryMeta(d).collect().head
    assert(meta.getAs[Long]("n_bytes") == 300L)
    assert(meta.getAs[Long]("n_pixels") ==
      meta.getAs[Long]("width") * meta.getAs[Long]("height"))
    val decoded = Multimodal.decodeFramesStub(spark, sf).limit(5).collect()
    assert(decoded.forall(f => f.width > 0 && f.height > 0))
  }

  test("multimodal: resize plan preserves aspect ratio within bounds") {
    initLog()
    val meta = Multimodal.binaryMeta(
      graft.sources.Tables.documents(spark, sf))
    val out = Multimodal.resizePlan(meta, maxSide = 224).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("out_w") <= 224 && r.getAs[Long]("out_h") <= 224)
      assert(r.getAs[Long]("out_w") > 0 && r.getAs[Long]("out_h") > 0)
    }
  }

  test("multimodal: stub features flow into ANN similarity") {
    initLog()
    val feats = Multimodal.extractFeaturesStub(spark, sf)
      .toDF("doc_id", "frame_idx", "embedding")
      .limit(50)
      .select(
        org.apache.spark.sql.functions.monotonically_increasing_id().as("vec_id"),
        org.apache.spark.sql.functions.col("embedding"),
        org.apache.spark.sql.functions.lit(0).as("label"))
    val nn = graft.operators.Similarity.annBruteForce(feats.cache(), 2, 3)
    assert(nn.count() > 0)
  }

  test("simpsonDiversity: hand-checked rational, short docs filtered") {
    initLog()
    val d = Seq((0L, "a a b"), (1L, "x"), (2L, "w w w w"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.simpsonDiversity(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(1L)) // single token: index undefined, filtered
    // "a a b": N=3, counts {2,1} -> 2/(3*2)
    assert(out(0L).getAs[Long]("n_tokens") == 3L)
    assert(out(0L).getAs[Long]("n_types") == 2L)
    assert(out(0L).getAs[Double]("simpson") == 0.333333)
    // constant doc: probability 1 by definition
    assert(out(2L).getAs[Double]("simpson") == 1.0)
  }

  test("collocations: planted pair tops by lift, floor drops noise") {
    initLog()
    // "x y" always adjacent (8 times, each its only occurrence of x/y)
    // amid filler; the shuffled-filler docs reuse a..h in OTHER
    // contexts so every filler pair's constituents out-count their
    // pairing (lift < x y's); a 1-occurrence pair is cut by the floor
    val filler = (0 until 8).map(i => (i.toLong, "a b c d e x y f g h"))
    val dilute = (0 until 8).map(i => (50L + i, "a c e g b d f h"))
    val noise = Seq((100L, "q r"))
    val d = (filler ++ dilute ++ noise).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .collocations(d, minCount = 5, k = 5).collect()
    assert(out.nonEmpty)
    // x y: P(xy)=8/Nb, P(x)=P(y)=8/N1 -> lift = (8/Nb)·N1²/64 — the
    // pair whose constituents occur ONLY together must rank first
    assert(out.head.getAs[String]("gram") == "x y")
    assert(out.head.getAs[Long]("n_pair") == 8L)
    assert(!out.map(_.getAs[String]("gram")).contains("q r"))
    // every emitted lift is positive and finite
    assert(out.forall(r => r.getAs[Double]("lift") > 0))
  }

  test("tokenEntropy: degenerate, uniform, and hand-computed cases") {
    initLog()
    val docs = Seq(
      (1L, "same same same same"),          // H = 0
      (2L, "a b c d e f g h"),              // uniform 8 -> H = 3
      (3L, "a a b b"),                      // H = 1
      (4L, "a a a b")                       // H = 2 - 3*log2(3)/4
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 1L, 0.0)))
    assert(out(2L) == ((8L, 8L, 3.0)))
    assert(out(3L) == ((4L, 2L, 1.0)))
    val h4 = BigDecimal(2.0 - 3.0 * (math.log(3.0) / math.log(2.0)) / 4.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(4L)._3 - h4) < 2e-6, s"got ${out(4L)._3} want $h4")
  }

  test("gopherFlags: each rule fires on its designed violator only") {
    initLog()
    val docs = Seq(
      // passes all: 6 words, mean len (29-5)/6=4.0, all alpha, 2 stops
      (1L, "the cat sat on a mattress"),
      // too short (3 words)
      (2L, "the a word"),
      // mean word length too high (one 60-char token: 70/6 > 10)
      (3L, "the a " + "x" * 60 + " be cd ef"),
      // alpha ratio: 3 of 6 tokens numeric -> 0.5 < 0.8 (mean 24/6=4)
      (4L, "the a 11111 22222 33333 wordy"),
      // no stopwords at all
      (5L, "cats sit under warm blankets quietly")
    ).toDF("doc_id", "text")
    val f = TextAnalysis.gopherFlags(docs, minWords = 4L)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5), r.getBoolean(6)))).toMap
    assert(f(1L) == ((true, true, true, true, true)))
    assert(f(2L)._1 == false && f(2L)._5 == false)
    assert(f(3L)._2 == false, s"doc3 flags ${f(3L)}")
    assert(f(4L)._3 == false)
    assert(f(5L)._4 == false)
    // designed violators fail ONLY their rule (word-count doc aside,
    // short docs can also trip ratios — doc 2 keeps stop hits >= 2)
    assert(f(3L)._1 && f(3L)._4)
    assert(f(4L)._1 && f(4L)._2 && f(4L)._4)
    assert(f(5L)._1 && f(5L)._2 && f(5L)._3)
  }

  test("curate_gopher summary: counts reconcile at sf") {
    initLog()
    val row = TextAnalysis.gopherSummary(spark, sf).head()
    val n = row.getAs[Long]("n_docs")
    assert(n > 0)
    assert(row.getAs[Long]("n_pass") <= n)
    // every failure count is within [0, n]
    Seq("fail_word_count", "fail_mean_len", "fail_alpha", "fail_stop")
      .foreach { c =>
        val v = row.getAs[Long](c)
        assert(v >= 0 && v <= n, s"$c = $v")
      }
  }

  test("c4Flags: line rules count real lines; each page gate fires " +
      "on its designed violator only") {
    initLog()
    val docs = Seq(
      // 3 lines: two end in terminal punct, two have >= 5 words;
      // 3 sentences -> passes everything
      (1L, "This page has five sentences total.\nshort line\n" +
        "Every criterion is satisfied here today. Yes! Really."),
      // fine structure but a badword ("casino") on the list
      (2L, "A clean line with many words here.\n" +
        "Then a casino advert appears. Sad. End."),
      // lorem ipsum boilerplate — the canonical CAPITALIZED form
      (3L, "Some Lorem Ipsum filler text lives here. Two. Three."),
      // curly brace = leftover code/template
      (4L, "function() { return 1; } is code. Two. Three."),
      // javascript warning line
      (5L, "Please enable JavaScript to view. This. Site."),
      // too few sentences (1 < 3)
      (6L, "One single sentence only lives here."),
      // CRLF endings: CR is stripped before the line anchors, so both
      // lines count as terminal (Java-vs-RE2 $ semantics align)
      (7L, "Ends right here.\r\nSecond line has five words." +
        "\r\nAlso a third one now."),
      // badword capitalized AND punctuation-adjacent: the word-span
      // split (lowercase, non-alphanumeric) still catches it
      (8L, "Visit our Casino. Right now! Please do.")
    ).toDF("doc_id", "text")
    val f = TextAnalysis.c4Flags(docs, badwords = Seq("casino", "poker"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(f(1L).getAs[Long]("n_lines") == 3L)
    assert(f(1L).getAs[Long]("n_term_lines") == 2L) // "short line" doesn't
    assert(f(1L).getAs[Long]("n_long_lines") == 2L)
    assert(f(1L).getAs[Long]("n_sentences") == 4L) // . . ! .
    assert(f(1L).getAs[Boolean]("f_pass"), f(1L).toString)
    assert(f(2L).getAs[Boolean]("f_badword") &&
      !f(2L).getAs[Boolean]("f_pass"))
    assert(f(3L).getAs[Boolean]("f_lorem") && !f(3L).getAs[Boolean]("f_pass"))
    assert(f(4L).getAs[Boolean]("f_brace") && !f(4L).getAs[Boolean]("f_pass"))
    assert(f(5L).getAs[Boolean]("f_js") && !f(5L).getAs[Boolean]("f_pass"))
    assert(f(6L).getAs[Long]("n_sentences") == 1L &&
      !f(6L).getAs[Boolean]("f_pass"))
    assert(f(7L).getAs[Long]("n_lines") == 3L)
    assert(f(7L).getAs[Long]("n_term_lines") == 3L,
      "CR before LF must not defeat the terminal-punctuation anchor")
    assert(f(8L).getAs[Boolean]("f_badword"),
      "capitalized, punctuation-adjacent badword must still match")
    // designed violators trip ONLY their own page gate
    Seq(3L, 4L, 5L, 6L, 7L).foreach(id =>
      assert(!f(id).getAs[Boolean]("f_badword"), id.toString))
    Seq(2L, 4L, 5L, 6L, 7L, 8L).foreach(id =>
      assert(!f(id).getAs[Boolean]("f_lorem"), id.toString))
  }

  test("curate_c4 summary: totals reconcile; corpus degeneracy is " +
      "the documented one (single-line, zero-sentence docs)") {
    initLog()
    val row = TextAnalysis.c4Summary(spark, sf).head()
    val n = row.getAs[Long]("n_docs")
    assert(n > 0)
    // newline-free corpus: exactly one line per doc, none terminal
    assert(row.getAs[Long]("total_lines") == n)
    assert(row.getAs[Long]("term_lines") == 0L)
    assert(row.getAs[Long]("fail_sentences") == n)
    assert(row.getAs[Long]("n_pass") == 0L)
    assert(row.getAs[Long]("fail_badword") <= n)
  }

  test("readability: hand-computed Flesch counts and scores") {
    initLog()
    import spark.implicits._
    val docs = Seq(
      (0L, "The cat sat. It ran fast!"), // 6 words, 2 sentences, 6 syl
      (1L, "alpha beta gamma"),          // no punctuation: floor s=1
      (2L, "pfft"),                      // vowel-free (y counts): 0 syl
      (3L, " "),                         // zero words: dropped
      (4L, "What?! Really?!")            // multi-char runs: 2 sentences
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.readability(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(3L), "zero-word doc must drop")
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d0 = got(0L)
    assert(d0.getAs[Long]("words") == 6L)
    assert(d0.getAs[Long]("sentences") == 2L)
    assert(d0.getAs[Long]("syllables") == 6L)
    assert(d0.getAs[Double]("reading_ease") ==
      r4(206.835 - 1.015 * 3.0 - 84.6 * 1.0))
    assert(d0.getAs[Double]("fk_grade") ==
      r4(0.39 * 3.0 + 11.8 * 1.0 - 15.59))
    assert(got(1L).getAs[Long]("sentences") == 1L, "unpunctuated floor")
    assert(got(2L).getAs[Long]("syllables") == 0L)
    assert(got(4L).getAs[Long]("sentences") == 2L,
      "a ?! run is ONE sentence boundary")
    assert(got(4L).getAs[Long]("words") == 2L)
  }

  test("readability plan: no explode, no join; at most the adaptive " +
      "scan-parallelize RoundRobin") {
    initLog()
    val plan = graft.operators.TextAnalysis
      .readability(graft.sources.Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("generate"), "no explode expected")
    assert(!plan.contains("Join"), "map-only: no join expected")
    // the only allowed Exchange is Par.ensure's RoundRobin (it fires
    // here because the tiny local input yields 1 scan split; ample-
    // split layouts skip it)
    assert(!plan.contains("hashpartitioning"),
      "no key shuffle expected: " + plan.take(1200))
  }

  test("CharBigramSet == the charBigrams HOF on corpus text and " +
      "every short-text edge (drop-in contract)") {
    initLog()
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import spark.implicits._
    def native(c: org.apache.spark.sql.Column) =
      column(graft.functions.CharBigramSet(expression(c)))
    // edge fixtures: empty, 1 char, 1 non-BMP char, surrogate pairs
    // inside bigrams, U+0000 pairs (the packed-key-0 case), repeats
    // (dedup + first-occurrence order), and a 2-char doc
    val edges = Seq(
      "", "a", "😀", "ab",
      "a😀b😀a",       // emoji is ONE bigram char
      "\u0000\u0000\u0000a\u0000",         // NUL pairs: key 0 is valid
      "abababab", "aaaa", "banana bandana"
    ).toDF("text")
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select(col("text")).limit(400)
    for (df <- Seq(edges, corpus)) {
      val rows = df.select(
          graft.operators.TextAnalysis.charBigramsHof(col("text")).as("hof"),
          native(col("text")).as("nat"),
          col("text"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"mismatch on ${r.getString(2).take(40).map(_.toInt)}")
      }
      assert(rows.nonEmpty)
    }
  }

  test("CharBigramSet stays inside WholeStageCodegen (no interpreted " +
      "lambda in the fluency hot path once swapped)") {
    initLog()
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    // a parquet-backed source (a local Seq constant-folds to
    // LocalTableScan and never enters codegen at all)
    val df = graft.sources.Tables.documents(spark, sf).limit(2)
      .select(column(graft.functions.CharBigramSet(
        expression(col("text")))).as("bgs"))
    // `*(n)` is the WholeStageCodegen marker in the compact plan form
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("char_bigram_set") && l.trim.matches("""^\+?-?\s*\*\(\d+\).*""")),
      "expected char_bigram_set inside a codegen stage: " + plan.take(800))
    assert(df.collect().forall(_.getSeq[String](0).nonEmpty))
  }
}
