package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * language ID (stopword n-gram heuristic), quality scoring, token
 * counting (whitespace + BPE-ish regex), and document fingerprinting
 * (polynomial rolling hash).
 *
 * Everything is a single narrow projection over codegen'd built-ins
 * (`regexp_extract_all`, higher-order `transform`/`aggregate`/`filter`)
 * — no UDFs, no shuffles, trivially scalable to 100 TB of documents.
 *
 * Cross-engine determinism: hashes derive from `md5` (identical
 * everywhere) and integer arithmetic mod a 31-bit prime, and every ratio
 * is one double division of exact integers — so a SQL oracle evaluating
 * the same expression shape reproduces results bit-for-bit.
 */
object TextOps {

  /** 31-bit prime modulus for all token-hash arithmetic (keeps products
    * within 63 bits under ANSI mode). */
  val P: Long = 2147483647L

  /** Word tokens: maximal `[a-z0-9]+` runs of the lowercased text. */
  val TokensExpr = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"

  /** 32-bit token hash from the md5 hex prefix — the engine-portable
    * hash primitive (same value in any engine with md5). */
  def tokHash32(inner: String): String =
    s"cast(conv(substring(md5($inner), 1, 8), 16, 10) as bigint)"

  def withTokens(docs: DataFrame): DataFrame =
    docs.withColumn("toks", expr(TokensExpr))

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Order matters: ties break to the first language. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "los", "y", "es", "no"),
    "fr" -> Seq("le", "la", "et", "est", "pas"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo"))

  /** (doc_id, predicted_lang): argmax of stopword hits, ties to the
    * alphabetically-first language. */
  def langId(docs: DataFrame): DataFrame = {
    val scored = LangProfiles.foldLeft(withTokens(docs)) { case (df, (lang, words)) =>
      val set = words.map(w => s"'$w'").mkString(", ")
      df.withColumn(s"s_$lang", expr(s"size(filter(toks, t -> t in ($set)))"))
    }
    val g = greatest(LangProfiles.map { case (l, _) => col(s"s_$l") }: _*)
    // reverse+foldLeft nests later langs deeper, so the outermost test is
    // the FIRST profile — deterministic tie-break order.
    val predicted = LangProfiles.reverse.foldLeft(lit("und")) { case (acc, (l, _)) =>
      when(col(s"s_$l") === g && g > 0, lit(l)).otherwise(acc)
    }
    scored.select(col("doc_id"), predicted.as("predicted_lang"))
  }

  /** Quality signals: token count, char count, punctuation ratio,
    * alphabetic ratio, stopword ratio, mean token length. */
  def quality(docs: DataFrame): DataFrame = {
    val stop = LangProfiles.flatMap(_._2).distinct.map(w => s"'$w'").mkString(", ")
    withTokens(docs)
      .withColumn("n_tok", expr("size(toks)"))
      .withColumn("n_char", length(col("text")))
      .withColumn("n_punct",
        length(col("text")) - length(regexp_replace(col("text"), "[.!?,;:]", "")))
      .withColumn("n_alpha",
        length(regexp_replace(col("text"), "[^a-zA-Z]", "")))
      .withColumn("n_stop", expr(s"size(filter(toks, t -> t in ($stop)))"))
      .withColumn("sum_tok_len",
        expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))"))
      .select(
        col("doc_id"), col("n_tok"), col("n_char"),
        (col("n_punct").cast("double") / col("n_char")).as("punct_ratio"),
        (col("n_alpha").cast("double") / col("n_char")).as("alpha_ratio"),
        (col("n_stop").cast("double") / col("n_tok")).as("stop_ratio"),
        (col("sum_tok_len").cast("double") / col("n_tok")).as("mean_tok_len"))
  }

  /** Whitespace token count + BPE-ish subword count (letter runs, digit
    * runs, and single non-alphanumerics each count as one token). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      expr(raw"size(regexp_extract_all(text, '\\S+', 0))").as("ws_tokens"),
      expr(raw"size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0))")
        .as("bpe_tokens"))

  /** Order-sensitive document fingerprint: left-fold polynomial rolling
    * hash `acc*131 + h(token) mod P` over the token sequence. Two docs
    * with the same tokens in different order fingerprint differently
    * (unlike set-based MinHash/SimHash). */
  def fingerprint(docs: DataFrame): DataFrame =
    withTokens(docs).select(
      col("doc_id"),
      expr(s"aggregate(toks, 0L, (acc, t) -> (acc * 131 + ${tokHash32("t")} % $P) % $P)")
        .as("fingerprint"))
}
