package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`:
  * language-ID (stopword/n-gram heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex), document fingerprinting.
  *
  * Everything is built from codegen'd `functions._` / higher-order array
  * functions — no UDFs — so the plan whole-stage-compiles and all counts are
  * exact integers (deterministic for the DuckDB oracle compare).
  */
object TextOps {

  /** tiny per-language marker lexicons for the heuristic language ID */
  private val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "with", "fast"),
    "es" -> Seq("el", "la", "de", "rapido", "tabla"),
    "fr" -> Seq("le", "la", "et", "vite", "table"),
    "de" -> Seq("der", "die", "und", "schnell", "tabelle"),
    "zh" -> Seq("biao", "kuai", "he", "da", "xiao"))

  private def words(text: Column): Column = split(text, " ")

  private def countIn(text: Column, vocab: Seq[String]): Column =
    size(filter(words(text), w => w.isin(vocab: _*)))

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")

  /** q43: frame-sampling plumbing for media payloads — stride-16 sampling
    * over the byte stream (text bytes stand in for media bytes; the decode
    * step is the stub, the Spark-side batch shape is real: sequence() +
    * transform() + aggregate(), all codegen, no UDF).
    */
  val frameSample: QueryDef = QueryDef("q43_frame_sample",
    (s, d) => {
      val stride = 16
      val positions = sequence(lit(1), length(col("text")), lit(stride))
      T.load(s, d, "documents")
        .select(col("doc_id"),
          size(positions).as("n_frames"),
          aggregate(
            transform(positions, i =>
              ascii(col("text").substr(i, lit(1))).cast("long")),
            lit(0L), (acc, v) => acc + v).as("frame_checksum"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        len(generate_series(1, CAST(length(text) AS INT), 16)) AS n_frames,
        CAST(list_sum(list_transform(generate_series(1, CAST(length(text) AS INT), 16),
          i -> ascii(substring(text, CAST(i AS INT), 1)))) AS BIGINT) AS frame_checksum
      FROM documents ORDER BY doc_id"""))

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------- token counting (exact)
    QueryDef("q27_token_counts",
      (s, d) => T.load(s, d, "documents")
        .withColumn("ws_tokens", size(words(col("text"))))
        .withColumn("re_tokens",
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0))))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ws_tokens")).as("sum_ws_tokens"),
          sum(col("re_tokens")).as("sum_re_tokens"))
        .orderBy(col("source")),
      Some("""SELECT source, count(*) AS n_docs,
        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_ws_tokens,
        CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS BIGINT) AS sum_re_tokens
        FROM documents GROUP BY source ORDER BY source""")),

    // --------------------------------- quality scoring (ratios, exact ints)
    QueryDef("q28_quality_scores",
      (s, d) => {
        val ws = words(col("text"))
        val nWords = size(ws)
        val nStop = size(filter(ws, w => w.isin(stopwords: _*)))
        val meanLenX100 = round(
          (col("n_chars").cast("double") * 100) / nWords, 0).cast("long")
        T.load(s, d, "documents")
          .withColumn("n_words", nWords)
          .withColumn("n_stop", nStop)
          .withColumn("mean_wordlen_x100", meanLenX100)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_words")).as("sum_words"),
            sum(col("n_stop")).as("sum_stop"),
            sum(col("mean_wordlen_x100")).as("sum_mwl"))
          .orderBy(col("lang"))
      },
      Some("""WITH q AS (SELECT lang,
          len(string_split(text, ' ')) AS n_words,
          len(list_filter(string_split(text, ' '),
            w -> w IN ('the','a','of','and','in','to','is'))) AS n_stop,
          CAST(round(n_chars * 100.0 / len(string_split(text, ' ')), 0)
            AS BIGINT) AS mean_wordlen_x100
        FROM documents)
        SELECT lang, count(*) AS n_docs,
          CAST(sum(n_words) AS BIGINT) AS sum_words,
          CAST(sum(n_stop) AS BIGINT) AS sum_stop,
          CAST(sum(mean_wordlen_x100) AS BIGINT) AS sum_mwl
        FROM q GROUP BY lang ORDER BY lang""")),

    // ----------------------------------------- heuristic language ID
    QueryDef("q29_lang_id",
      (s, d) => {
        val scored = markers.toSeq.sortBy(_._1).foldLeft(
          T.load(s, d, "documents")) { case (df, (l, vocab)) =>
          df.withColumn(s"score_$l", countIn(col("text"), vocab))
        }
        // argmax by score, ties by language name (greatest-struct trick)
        val pick = greatest(markers.keys.toSeq.sorted.map(l =>
          struct(col(s"score_$l").as("score"),
            lit(markersRank(l)).as("rank"), lit(l).as("lang"))): _*)
        scored.withColumn("pred_lang", pick.getField("lang"))
          .groupBy(col("lang"), col("pred_lang"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("pred_lang"))
      },
      Some(langIdOracle)),

    // -------------------------------- fingerprint: deterministic digests —
    // md5 over the salted record + a polynomial ROLLING hash of the text
    // (the Karp-Rabin fold (acc*31 + ascii) % 1000003; replaced round 1's
    // crc32, absent from DuckDB 1.0, so this is now fully oracle-backed)
    QueryDef("q30_fingerprints",
      (s, d) => T.load(s, d, "documents")
        .select(col("doc_id"),
          md5(concat_ws("|", col("lang"), col("source"), col("text")))
            .as("fingerprint"),
          Dedup.polyHash(col("text")).as("rolling_hash"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
        md5(concat_ws('|', lang, source, text)) AS fingerprint,
        ${Dedup.polyHashSql("text")} AS rolling_hash
        FROM documents ORDER BY doc_id""")),

    // ---------------------------- corpus term stats: top-5 terms per lang
    QueryDef("q41_term_freq",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val terms = T.load(s, d, "documents")
          .select(col("lang"), explode(words(col("text"))).as("term"))
          .groupBy(col("lang"), col("term"))
          .agg(count(lit(1)).as("tf"),
            countDistinct(lit(1)).as("_one")) // exercise distinct agg path
          .drop("_one")
        val w = Window.partitionBy("lang")
          .orderBy(col("tf").desc, col("term"))
        terms.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("lang"), col("rk"), col("term"), col("tf"))
          .orderBy(col("lang"), col("rk"))
      },
      Some("""WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS term
          FROM documents),
        f AS (SELECT lang, term, count(*) AS tf FROM t GROUP BY lang, term),
        r AS (SELECT lang, term, tf, row_number() OVER
          (PARTITION BY lang ORDER BY tf DESC, term) AS rk FROM f)
        SELECT lang, rk, term, tf FROM r WHERE rk <= 5
        ORDER BY lang, rk""")),

    // ---------------- multimodal plumbing: opaque binary + typed metadata.
    // The decode/feature-extract step is a STUB (no image/audio libs in this
    // container): payload = utf8 bytes of text standing in for media bytes;
    // "decoded features" are deterministic functions of the binary. The
    // Spark-side plumbing (binary column, metadata struct, batch shape) is
    // real and oracle-checked via octet lengths.
    QueryDef("q31_multimodal_meta",
      (s, d) => T.load(s, d, "documents")
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          struct(col("lang").as("lang"), col("source").as("source"),
            col("n_chars").as("n_chars")).as("meta"))
        .select(col("doc_id"),
          octet_length(col("payload")).as("payload_bytes"),
          // stubbed "decode": first-8-byte digest of the media payload
          substring(upper(hex(col("payload"))), 1, 16).as("magic"),
          col("meta.lang").as("lang"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        CAST(octet_length(encode(text)) AS INT) AS payload_bytes,
        substring(upper(hex(encode(text))), 1, 16) AS magic,
        lang
        FROM documents ORDER BY doc_id"""))
  ) :+ frameSample


  private def markersRank(l: String): Int =
    markers.keys.toSeq.sorted.indexOf(l)

  /** DuckDB mirror of the argmax-by-(score, rank) language pick. */
  private lazy val langIdOracle: String = {
    val scoreExprs = markers.toSeq.sortBy(_._1).map { case (l, vocab) =>
      val inList = vocab.map(v => s"'$v'").mkString(",")
      s"len(list_filter(string_split(text, ' '), w -> w IN ($inList))) AS score_$l"
    }.mkString(",\n          ")
    val langs = markers.keys.toSeq.sorted
    val maxExpr = s"greatest(${langs.map(l => s"score_$l").mkString(", ")})"
    // ties resolve to the alphabetically-LAST language (same as the Spark
    // side's greatest-over-(score, rank) structs) => CASE in reverse order
    val caseExpr = langs.reverse.init.map(l =>
      s"WHEN score_$l = m THEN '$l'").mkString(" ")
    s"""WITH s AS (SELECT lang,
          $scoreExprs
        FROM documents),
        p AS (SELECT lang, $maxExpr AS m,
          CASE $caseExpr ELSE '${langs.head}' END AS pred_lang FROM s)
        SELECT lang, pred_lang, count(*) AS n
        FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang"""
  }
}
