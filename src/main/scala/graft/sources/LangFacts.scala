package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multilingual-literal fact rewriting — the reference's MultilingualKB
 * load hook (kb/src/main/java/amie/data/MultilingualKB.java:11-23): for
 * every fact whose OBJECT is a language-tagged literal `label@lang`
 * (exactly one `@`, mirroring the reference's split-length-2 test), two
 * extra facts are emitted alongside the original:
 *
 *   (object, <label>, label)   (object, <lang>, lang)
 *
 * Chainable after any loader: `splitLangLiterals(TsvFacts.load(...))`.
 * One narrow codegen pass — no shuffle, no UDF.
 */
object LangFacts {

  private val LangLit = "^([^@]*)@([^@]*)$"

  def splitLangLiterals(triples: DataFrame): DataFrame = {
    val tagged = triples
      .where(col("obj").rlike(LangLit))
      .select(col("obj"), regexp_extract(col("obj"), LangLit, 1).as("l"),
        regexp_extract(col("obj"), LangLit, 2).as("g"))
    val labelFacts = tagged.select(col("obj").as("subj"),
      lit("<label>").as("pred"), col("l").as("obj"))
    val langFacts = tagged.select(col("obj").as("subj"),
      lit("<lang>").as("pred"), col("g").as("obj"))
    triples.select("subj", "pred", "obj").union(labelFacts).union(langFacts)
  }
}
