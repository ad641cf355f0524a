package graft.tools

import graft.Sessions
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Throwaway sub-step decomposition of dedup_ngram_jaccard (guide §1):
  * times each phase of the two-phase DF-capped shape separately so the
  * 7-8 s steady cost at sf0.1 can be attributed. Mirrors Dedup.ngramJaccard
  * internals; numbers go to OPTIMIZATION_r06.md only. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cores, "graft-ngram-probe")
    spark.sparkContext.setLogLevel("WARN")
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[ngram] $what%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); a
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val maxShingleDF = 50
    for (rep <- 1 to 2) {
      println(s"-- rep $rep")
      val sh = t("shingles checkpoint") {
        TextOps.withTokens(docs)
          .where(expr("size(toks) >= 2"))
          .select(col("doc_id"), col("source"),
            explode(array_distinct(expr(
              "transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))")))
              .as("ng")).localCheckpoint(true)
      }
      t("sh count")(println("  rows=" + sh.count()))
      val dfc = sh.groupBy("source", "ng").agg(count(lit(1)).as("dfc"))
        .where(col("dfc") <= maxShingleDF).select("source", "ng")
      t("dfc count")(println("  rows=" + dfc.count()))
      val capped = sh.join(dfc, Seq("source", "ng"), "left_semi")
      t("capped count")(println("  rows=" + capped.count()))
      val cand = capped.as("a").join(capped.as("b"),
          col("a.source") === col("b.source") && col("a.ng") === col("b.ng") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct().localCheckpoint(true)
      t("cand pairs (checkpoint counted)")(println("  rows=" + cand.count()))
      val inter = cand
        .join(sh.select(col("doc_id").as("doc_a"), col("ng")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("ng")), Seq("doc_b", "ng"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      t("inter agg")(println("  rows=" + inter.count()))
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val fin = inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
        .withColumn("jaccard",
          col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
        .where(col("jaccard") >= 0.3)
      t("final")(println("  rows=" + fin.count()))
    }
    spark.stop()
  }
}
