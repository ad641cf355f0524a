package graft.tools

import graft.sources.{RdfFacts, TsvFacts}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared fact-file loader for the CLI tools — format sniffed by
  * extension (the reference's amie.data.U.loadFiles dispatch,
  * kb/src/main/java/amie/data/U.java), `fmt` overrides. */
object FactInput {

  def sniff(path: String, fmt: String): String =
    if (fmt.nonEmpty) fmt
    else if (path.endsWith(".tsv") || path.endsWith(".csv")) "tsv"
    else if (path.endsWith(".nt")) "nt"
    else if (path.endsWith(".ttl") || path.endsWith(".n3")) "ttl"
    else "parquet"

  def load(spark: SparkSession, path: String, fmt: String = ""): DataFrame =
    sniff(path, fmt) match {
      case "tsv"     => TsvFacts.load(spark, path)
      case "nt"      => RdfFacts.loadNTriples(spark, path)
      case "ttl"     => RdfFacts.loadTurtle(spark, path)
      case "parquet" => spark.read.parquet(path).select("subj", "pred", "obj")
      case other     => sys.error(s"unknown input format: $other")
    }
}
