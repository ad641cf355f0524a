package graft.tools

import graft.Sessions
import graft.pipeline._
import org.apache.spark.sql.functions._

/** Scratch profiler: per-stage wall times of the pipeline at one
  * parallelism level (args: cores nDocs). */
object StageProf {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val nDocs = args.lift(1).map(_.toLong).getOrElse(200000L)
    val spark = Sessions.local(cores, "graft-prof")
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-prof").toString

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a  = f
      println(f"[prof] $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }

    val docs   = Corpus.generate(spark, nDocs, 10000)
    val p      = new Pipeline(spark, dir, nBuckets = cores)
    val docsDF = docs.toDF()

    val docsFp   = timed("docsFp") { Manifest.fingerprint(docsDF.select("doc_id")) }
    val mentions = timed("mentions") { p.stage("mentions", docsFp)(MentionDetect.mentions(docsDF)) }
    val aliasFp = timed("aliasFp") {
      Manifest.fingerprint(mentions.select(col("subj_alias").as("a"))
        .union(mentions.select(col("obj_alias").as("a"))).distinct())
    }
    val aliasMap = timed("alias_map(CC)") { p.stage("alias_map", aliasFp)(Canonicalize.aliasMap(mentions)) }
    val linked = timed("linked") {
      p.stage("linked", docsFp + "|" + aliasFp)(LinkScore.link(mentions, aliasMap))
    }
    timed("triples") {
      p.stage("triples", docsFp + "|" + aliasFp, partitionCols = Seq("bucket")) {
        linked
          .withColumn("bucket", pmod(xxhash64(col("subj")), lit(32)).cast("int"))
          .select(col("subj"), col("rel").as("pred"), col("obj"),
            col("doc_id").as("src_doc"), col("span_idx").as("src_span"), col("bucket"))
      }
    }
    spark.stop()
  }
}
