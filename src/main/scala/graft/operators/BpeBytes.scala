package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** BYTE-LEVEL BPE with regex pre-tokenization — the GPT-2 tokenizer
  * shape (Radford et al. 2019, the released encoder.py): UTF-8 bytes
  * remapped to 256 printable unicode symbols, pre-tokens cut by the
  * GPT-2 split regex (contractions, optional-leading-space word/number
  * runs, punctuation runs, whitespace), and the SAME merge machinery
  * as [[Bpe]] over that symbol stream. This closes the r14 "Missing
  * (b)" gap: the char-granularity lane tokenizes within
  * whitespace-split words, which diverges from every shipping
  * tokenizer on punctuation, contractions and non-ASCII — token
  * BUDGETS denominated in char-lane counts misprice exactly the
  * messy-text tail.
  *
  * Documented variant: the original split regex ends
  * `…|\s+(?!\S)|\s+`; the lookahead alternative exists to leave the
  * last space of a whitespace run attached to the following word. RE2
  * (DuckDB's engine) has no lookahead, so graft ships the regex
  * WITHOUT it — behavior differs only on runs of ≥ 2 whitespace
  * characters followed by a non-space ("a  b" → ["a", "  ", "b"]
  * here vs GPT-2's ["a", " ", " b"]); single-space text (the corpus
  * class) is identical. Java regex and RE2 agree on this pattern
  * (fixture-pinned in the spec).
  *
  * The byte remap is RELATIONAL, not a UDF: hex(word) (both engines
  * hex UTF-8 bytes) → 2-char groups → a broadcast 256-row
  * (hex byte → SEP-prefixed symbol) table → ordered reassembly. It
  * runs per DISTINCT pre-token (vocab-scale, Heap's-bounded), never
  * per corpus row, and works on arbitrary bytes — "café" is five
  * symbols (é is two bytes), exactly GPT-2's behavior.
  *
  * Scale shape: identical to [[Bpe]] — one corpus scan to the
  * pre-token vocab, training over the vocab table, corpus encode via
  * a word-keyed join of per-word id fragments.
  */
object BpeBytes {

  /** GPT-2 bytes_to_unicode: printable latin-1 ranges map to
    * themselves, every other byte to 256+n in byte order. 256 DISTINCT
    * single chars, all printable, none whitespace — so the SEP-string
    * merge machinery and the `([^ ])` repr regex apply unchanged.
    * Space (0x20) lands on 'Ġ' (U+0120), newline on 'Ċ' — the familiar
    * GPT-2 vocab artifacts.
    */
  val BytesToUnicode: Array[Char] = {
    val keep = (('!' to '~') ++ ('¡' to '¬') ++
      ('®' to 'ÿ')).map(_.toInt).toSet
    val out = Array.ofDim[Char](256)
    var n = 0
    for (b <- 0 until 256) {
      if (keep(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  private val UnicodeToByte: Map[Char, Int] =
    BytesToUnicode.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Driver-side reference remap (specs, decode). */
  def byteEncode(s: String): String =
    s.getBytes("UTF-8").map(b => BytesToUnicode(b & 0xff)).mkString

  /** Inverse remap: symbols back to UTF-8 bytes back to text. */
  def byteDecode(s: String): String =
    new String(s.map(c => UnicodeToByte(c).toByte).toArray, "UTF-8")

  /** The simplified GPT-2 split regex (see the object doc for the
    * dropped-lookahead variant note).
    */
  val PreTokenRegex: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"""

  /** (doc_id, wpos, word): ordered pre-tokens per document — the
    * byte path's positional tokenizer (regex alternatives each consume
    * ≥ 1 char, so no empty tokens exist).
    */
  private def preTokens(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(regexp_extract_all(col(textCol),
          lit(PreTokenRegex), lit(0))))
      .withColumnRenamed("pos", "wpos").withColumnRenamed("col", "word")

  /** The broadcast 256-row remap table: (hex byte → SEP-prefixed
    * remapped symbol).
    */
  private def byteMap(spark: SparkSession): DataFrame =
    broadcast(spark.createDataFrame(
        (0 until 256).map(b =>
          (f"$b%02X", Bpe.Sep + BytesToUnicode(b).toString)))
      .toDF("hx", "psym"))

  /** (word, cnt, repr): distinct pre-tokens with counts and the
    * SEP-prefixed byte-symbol representation — the byte path's
    * [[Bpe.wordCounts]]. The remap join runs once per (distinct word ×
    * byte), vocab-scale; the ordered-reassembly transform lambda is
    * interpreted but per-vocab-row (the postings_head convention).
    */
  def byteVocab(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = Par.ensure(docs)
      .select(explode(regexp_extract_all(col(textCol),
        lit(PreTokenRegex), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    toks
      .select(col("word"), col("cnt"),
        posexplode(regexp_extract_all(upper(hex(col("word"))),
          lit(".."), lit(0))))
      .withColumnRenamed("pos", "bpos").withColumnRenamed("col", "hx")
      .join(byteMap(docs.sparkSession), Seq("hx"))
      .groupBy(col("word"), col("cnt"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("bpos"), col("psym")))),
        x => x.getField("psym")), "").as("repr"))
  }

  /** Byte-level merge training — [[Bpe.trainMergesBatchedFromVocab]]
    * over the remapped vocab (same batching rule, same proof).
    */
  def trainMergesBytes(docs: DataFrame, rounds: Int = Bpe.TrainRounds,
      textCol: String = "text", batch: Int = 64): Seq[(String, String)] =
    Bpe.trainMergesBatchedFromVocab(byteVocab(docs, textCol), rounds,
      batch)

  /** (sym, token_id) under the GPT-2 id layout at byte granularity:
    * base symbols = every distinct corpus byte symbol, sorted (bounded
    * ≤ 256 + merges); merge outputs take B+rank−1. Same collation
    * note as [[Bpe.symbolIds]] — remapped symbols live below U+0400,
    * where UTF-8, UTF-16 and codepoint orders coincide.
    */
  def symbolIdsBytes(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val alphabet = byteVocab(docs, textCol)
      .select(explode(split(col("repr"), Bpe.Sep)).as("sym"))
      .filter(length(col("sym")) > 0)
      .distinct().collect().map(_.getString(0)).sorted
    val rows = alphabet.zipWithIndex.toSeq
      .map { case (s, i) => (s, i.toLong) } ++
      merges.zipWithIndex.map { case ((l, r), i) =>
        (l + r, alphabet.length + i.toLong) }
    rows.toDF("sym", "token_id")
  }

  /** Per-doc BYTE-LEVEL BPE encode — (doc_id, n_tokens, ids_csv),
    * the [[Bpe.encodeDocs]] shape with the regex tokenizer and byte
    * symbols. Same scale shape: everything per-token runs at VOCAB
    * scale; the corpus word stream joins per-word csv fragments with
    * position and one per-doc aggregation splices them (the join ships
    * unhinted — the char lane's measured broadcast-crossover note).
    */
  def encodeDocsBytes(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val vocab = byteVocab(docs, textCol)
      .select(col("word"),
        split(Bpe.applyMerges(col("repr"), merges), Bpe.Sep).as("arr"))
      .select(col("word"),
        slice(col("arr"), lit(2), size(col("arr")) - 1).as("syms"))
    val vocabIds = vocab
      .select(col("word"), posexplode(col("syms")))
      .withColumnRenamed("pos", "spos").withColumnRenamed("col", "sym")
      .join(broadcast(symbolIdsBytes(docs, merges, textCol)), Seq("sym"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_syms"),
        array_join(transform(array_sort(collect_list(struct(
            col("spos"), col("token_id")))),
          x => x.getField("token_id").cast("string")), ",")
          .as("word_csv"))
    preTokens(docs, textCol, idCol).join(vocabIds, Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("n_syms")).as("n_tokens"),
        array_join(transform(array_sort(collect_list(struct(
            col("wpos"), col("word_csv")))),
          x => x.getField("word_csv")), ",").as("ids_csv"))
  }

  /** Per-(dir, rounds) merge memo — the [[Bpe.cachedMerges]]
    * convention for the byte family.
    */
  private val mergeCacheBytes =
    new java.util.concurrent.ConcurrentHashMap[(String, Int),
      Seq[(String, String)]]()

  private[graft] def cachedMergesBytes(spark: SparkSession, dir: String,
      rounds: Int = Bpe.TrainRounds): Seq[(String, String)] =
    mergeCacheBytes.computeIfAbsent((dir, rounds),
      // incremental trainer over the byte vocab (the Bpe.cachedMerges
      // convention — collect the Heap's-bounded vocab, zero-job
      // rounds). The trainer splits its input per CHAR, so it is fed
      // the REMAPPED word ([[byteEncode]] — injective, chars ≡ byte
      // symbols), never the raw pre-token (whose multi-byte chars
      // would be one symbol instead of two)
      _ => Bpe.trainIncrementalFromVocab(
        Bpe.collectVocabGuarded(
          Tables.documents(spark, dir)
            .select(explode(regexp_extract_all(col("text"),
              lit(PreTokenRegex), lit(0))).as("word"))
            .groupBy(col("word")).agg(count(lit(1)).as("cnt")),
          "cachedMergesBytes", Bpe.MaxIncrementalVocabRows)
          .map { case (w, c) => (byteEncode(w), c) }, rounds))

  /** Driver query `tok_encode_bpe_bytes`: per-doc GPT-2-shape token-id
    * sequences under byte merges trained on the same corpus.
    */
  def encodeLane(spark: SparkSession, dir: String): DataFrame =
    encodeDocsBytes(Tables.documents(spark, dir),
      cachedMergesBytes(spark, dir))

  // ------------------------------------------------------------------
  // Oracle SQL
  // ------------------------------------------------------------------

  /** The regex as a single-quoted SQL literal. */
  private def sqlRegex: String = PreTokenRegex.replace("'", "''")

  /** 256-row VALUES remap table — generated from the SAME
    * [[BytesToUnicode]] the Spark side broadcasts, so the two engines
    * cannot disagree by construction.
    */
  private def byteMapValues: String =
    (0 until 256).map(b =>
      s"('${f"$b%02X"}', chr(1)||chr(${BytesToUnicode(b).toInt}))")
      .mkString(",\n           ")

  /** Oracle for `tok_encode_bpe_bytes`: the byte-level w0 (regex
    * pre-tokens → hex pairs → the VALUES remap → ordered reassembly),
    * the SHARED per-round merge CTEs ([[Bpe.roundCtes]]), byte
    * alphabet ids, and positional reassembly over regex pre-tokens.
    */
  def encodeBytesOracleSql(rounds: Int = Bpe.TrainRounds): String = {
    val mids = (1 to rounds).map(k =>
      s"SELECT l||r AS sym, CAST((SELECT nb FROM bcnt) + $k - 1 " +
        s"AS BIGINT) AS token_id FROM b$k").mkString("\n  UNION ALL ")
    s"""WITH bm(hx, psym) AS (VALUES
       |           $byteMapValues),
       |pt AS (SELECT unnest(regexp_extract_all(text, '$sqlRegex'))
       |         AS word FROM documents),
       |w0c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
       |        FROM pt GROUP BY word),
       |hb AS (SELECT word, cnt,
       |         unnest(regexp_extract_all(upper(hex(word)), '..')) AS hx,
       |         unnest(range(1,
       |           len(regexp_extract_all(upper(hex(word)), '..')) + 1))
       |           AS i
       |       FROM w0c),
       |w0 AS MATERIALIZED (SELECT word, cnt,
       |        string_agg(m.psym, '' ORDER BY i) AS repr
       |      FROM hb JOIN bm m USING (hx) GROUP BY word, cnt)${
        Bpe.roundCtes(rounds)},
       |v AS (SELECT word, string_split(repr, chr(1))[2:] AS syms
       |      FROM w$rounds),
       |alpha AS (SELECT DISTINCT sym FROM (
       |  SELECT unnest(string_split(repr, chr(1))) AS sym FROM w0)
       |  WHERE sym <> ''),
       |bcnt AS (SELECT COUNT(*) AS nb FROM alpha),
       |aid AS (SELECT sym,
       |  CAST(row_number() OVER (ORDER BY sym) - 1 AS BIGINT)
       |    AS token_id FROM alpha),
       |sid AS (SELECT * FROM aid
       |  UNION ALL $mids),
       |wds AS (SELECT doc_id,
       |        unnest(regexp_extract_all(text, '$sqlRegex')) AS word,
       |        unnest(range(1,
       |          len(regexp_extract_all(text, '$sqlRegex')) + 1)) AS pos
       |        FROM documents),
       |js AS (SELECT w.doc_id, w.pos, unnest(v.syms) AS sym,
       |       unnest(range(1, len(v.syms) + 1)) AS spos
       |       FROM wds w JOIN v USING (word)),
       |tok AS (SELECT j.doc_id, j.pos, j.spos, s.token_id
       |        FROM js j JOIN sid s USING (sym))
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  string_agg(CAST(token_id AS VARCHAR), ',' ORDER BY pos, spos)
       |    AS ids_csv
       |FROM tok GROUP BY doc_id""".stripMargin
  }
}
