package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps

/** Text-analysis operator family over `documents`: statistics, quality
  * scoring, token counting (whitespace + BPE-ish regex), heuristic
  * language-ID, and content fingerprinting. All scalar, all codegen'd
  * built-ins — one scan, no shuffle (except the langid groupBy rollup).
  */
object TextQueries {
  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  /** tiny per-language marker lexicons for the n-gram/stopword heuristic */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "es"),
    "fr" -> Seq("le", "la", "et", "est"),
    "de" -> Seq("der", "die", "und", "ist"))
  private val BpeTokenRx = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  private def inList(c: Column, words: Seq[String]): Column =
    size(filter(c, t => t.isin(words.map(lit(_)): _*)))
  private def inListSql(e: String, words: Seq[String]): String =
    s"len(list_filter($e, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"

  /** Per-document statistics: chars, words, distinct words, avg word
    * length, punctuation count, stopword count/ratio. */
  private def textStats(s: SparkSession, d: String): DataFrame = {
    val t = TextOps.tokens(col("text"))
    Tables.documents(s, d).select(
      col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars"),
      size(t).cast("bigint").as("n_words"),
      size(array_distinct(t)).cast("bigint").as("n_distinct"),
      (length(regexp_replace(col("text"), "\\s", "")).cast("double") /
        size(t).cast("double")).as("avg_word_len"),
      regexp_count(col("text"), lit("[^a-zA-Z0-9\\s]")).cast("bigint").as("n_punct"),
      inList(t, Stopwords).cast("bigint").as("n_stop"))
  }
  private val textStatsSql = {
    val t = TextOps.tokensSql("text")
    s"""SELECT doc_id,
       |  length(text) AS n_chars,
       |  len($t) AS n_words,
       |  len(list_distinct($t)) AS n_distinct,
       |  CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
       |    / CAST(len($t) AS DOUBLE) AS avg_word_len,
       |  len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct,
       |  CAST(${inListSql(t, Stopwords)} AS BIGINT) AS n_stop
       |FROM documents""".stripMargin
  }

  /** Composite quality score in [0,1]: explicit arithmetic over exact
    * ratios (length band, stopword ratio, lexical diversity). */
  private def qualityScore(s: SparkSession, d: String): DataFrame = {
    val t = TextOps.tokens(col("text"))
    val nWords = size(t).cast("double")
    val lenScore = least(nWords / lit(64.0), lit(1.0))
    val stopRatio = inList(t, Stopwords).cast("double") / nWords
    val diversity = size(array_distinct(t)).cast("double") / nWords
    Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      round(lenScore * 0.4 + least(stopRatio * 4.0, lit(1.0)) * 0.2 +
        diversity * 0.4, 6).as("quality"))
  }
  private val qualityScoreSql = {
    val t = TextOps.tokensSql("text")
    val nW = s"CAST(len($t) AS DOUBLE)"
    s"""SELECT doc_id, lang,
       |  round(least($nW / 64.0, 1.0) * 0.4
       |    + least(CAST(${inListSql(t, Stopwords)} AS DOUBLE) / $nW * 4.0, 1.0) * 0.2
       |    + CAST(len(list_distinct($t)) AS DOUBLE) / $nW * 0.4, 6) AS quality
       |FROM documents""".stripMargin
  }

  /** Token counting: whitespace tokens and a BPE-ish regex tokenization
    * (letter runs / digit runs / single punctuation). */
  private def tokenCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("bigint").as("ws_tokens"),
      regexp_count(lower(col("text")), lit(BpeTokenRx)).cast("bigint").as("bpe_tokens"),
      ceil(length(col("text")).cast("double") / 4.0).cast("bigint")
        .as("approx_llm_tokens"))
  private val tokenCountsSql =
    s"""SELECT doc_id,
       |  len(${TextOps.tokensSql("text")}) AS ws_tokens,
       |  len(regexp_extract_all(lower(text), '$BpeTokenRx')) AS bpe_tokens,
       |  CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS approx_llm_tokens
       |FROM documents""".stripMargin

  /** Heuristic language-ID: argmax of marker-lexicon hits (deterministic
    * first-wins tie-break), rolled up against the labeled lang column. */
  private def langId(s: SparkSession, d: String): DataFrame = {
    val t = TextOps.tokens(col("text"))
    val scores = LangMarkers.map { case (l, ws) => l -> inList(t, ws) }
    // chained CASE: first language with the maximal hit count wins
    val maxScore = greatest(scores.map(_._2): _*)
    val pred = scores.reverse.foldLeft[Column](lit("und")) { case (acc, (l, sc)) =>
      when(sc === maxScore && maxScore > 0, l).otherwise(acc)
    }
    Tables.documents(s, d)
      .select(col("lang"), pred.as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
  }
  private val langIdSql = {
    val t = TextOps.tokensSql("text")
    val scoreExprs = LangMarkers.map { case (l, ws) => l -> inListSql(t, ws) }
    val maxExpr = s"greatest(${scoreExprs.map(_._2).mkString(", ")})"
    val pred = scoreExprs.foldRight("'und'") { case ((l, sc), acc) =>
      s"CASE WHEN $sc = m AND m > 0 THEN '$l' ELSE $acc END"
    }
    s"""SELECT lang, pred_lang, COUNT(1) AS n FROM (
       |  SELECT lang, $pred AS pred_lang
       |  FROM (SELECT lang, text, $maxExpr AS m FROM documents))
       |GROUP BY lang, pred_lang""".stripMargin
  }

  /** Content fingerprints: whitespace-normalized 60-bit hash plus the
    * winnowing-style minimum shingle hash. */
  private def fingerprints(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextOps.fingerprint(col("text")).as("content_fp"),
      when(size(TextOps.shingles(col("text"))) > 0,
        array_min(transform(TextOps.shingles(col("text")),
          t => graft.functions.XHash.hash60(t))))
        .otherwise(lit(null).cast("long")).as("min_shingle_fp"))
  private val fingerprintsSql =
    s"""SELECT doc_id,
       |  ${TextOps.fingerprintSql("text")} AS content_fp,
       |  (SELECT MIN(${graft.functions.XHash.hash60Sql("sh")})
       |   FROM unnest(${TextOps.shinglesSql("text")}) AS u(sh)) AS min_shingle_fp
       |FROM documents""".stripMargin

  val all: Seq[Q] = Seq(
    Q("t1_text_stats", textStats, Some(textStatsSql)),
    Q("t2_quality_score", qualityScore, Some(qualityScoreSql)),
    Q("t3_token_counts", tokenCounts, Some(tokenCountsSql)),
    Q("t4_langid", langId, Some(langIdSql)),
    Q("t5_fingerprints", fingerprints, Some(fingerprintsSql)))
}
