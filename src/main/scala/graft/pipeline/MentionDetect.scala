package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stage 1 — batched mention detection over interleaved docs.
 *
 * One narrow pass: `posexplode(spans)` keeps the span order as
 * `span_idx`, media spans are filtered out (they carry no triple), and
 * the relation mention is pulled out with a single codegen'd
 * `regexp_extract` (no UDF, stays inside WholeStageCodegen). The docs
 * table itself is never mutated — the span-sequence invariant
 * (kind, text, media_ref, order) is checked against the untouched input.
 */
object MentionDetect {

  /** `<alias> <relation> <alias>.` with the relation alternation compiled
    * from the vocabulary — anchored so partial junk never half-matches. */
  private def pattern: String = {
    val relAlt = Corpus.relations.map(java.util.regex.Pattern.quote).mkString("|")
    s"^(.+?) ($relAlt) (.+?)\\.$$"
  }

  /** docs(doc_id, spans) → mentions(doc_id, span_idx, subj_alias, rel, obj_alias).
    *
    * The three capture groups come from ONE regex match per span
    * ([[graft.expressions.RegexpExtractGroups]], native codegen) — the
    * built-in `regexp_extract` would re-match the same string once per
    * group. The groups array gets its own projection; the optimizer may
    * still push the isNotNull filter below it (re-evaluating the regex
    * for the filter unless subexpression elimination merges the two), so
    * the guarantee is one match per *group set*, not strictly one per
    * row — either way far cheaper than three regexp_extract calls. */
  def mentions(docs: DataFrame): DataFrame = {
    val p = pattern
    docs
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("span_idx", "span")))
      .where(col("span.kind") === "text")
      .select(col("doc_id"), col("span_idx"),
        graft.expressions.RegexpExtractGroups(col("span.text"), p).as("__g"))
      .where(col("__g").isNotNull) // text spans that parse as a mention
      .select(
        col("doc_id"),
        col("span_idx"),
        col("__g").getItem(0).as("subj_alias"),
        col("__g").getItem(1).as("rel"),
        col("__g").getItem(2).as("obj_alias"))
  }
}
