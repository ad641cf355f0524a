package graft.tools

import graft.Sessions
import graft.functions.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Empirical scale probe for the pair-producing operator family (the
 * Σ bucket² risk class: LSH band joins, shingle joins, cluster verify).
 * The sandbox ships test data up to sf0.1 (5k docs / 2k vectors), so the
 * probe synthesizes an sf1-equivalent corpus by deterministic K-fold
 * replication of the sf0.1 tables — each replica family carries BOTH
 * exact duplicates (odd replicas: byte-identical text — the
 * dup-heavy-crawl stress that makes uncapped LSH buckets quadratic) and
 * near-duplicates (even replicas: one appended token / an ε-perturbed
 * vector), so candidate volume grows the way a real crawl's would.
 *
 * Run:  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
 *       sbt "runMain graft.tools.ScaleProbe [K] [cores]"
 * Emits one JSON line: per-op seconds + result rows at K× sf0.1.
 * Results are recorded in BASELINE.md (§scale-probe).
 */
object ScaleProbe {

  /** K-fold replicated documents: doc_id remapped collision-free,
    * replica 0 = the original row. Deterministic (no RNG). */
  def blowUpDocs(docs: DataFrame, k: Int): DataFrame =
    docs
      .withColumn("__rep", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("doc_id", col("doc_id") * k + col("__rep"))
      .withColumn("text",
        when(col("__rep") === 0 || col("__rep") % 2 === 1, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("__rep"))))
      .withColumn("n_chars", length(col("text")))
      .drop("__rep")

  /** K-fold replicated embeddings: odd replicas identical, even replicas
    * perturbed by a per-replica ε on every coordinate (stays a cosine
    * near-duplicate of the original). */
  def blowUpEmbeddings(emb: DataFrame, k: Int): DataFrame =
    emb
      .withColumn("__rep", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("vec_id", col("vec_id") * k + col("__rep"))
      .withColumn("embedding",
        when(col("__rep") % 2 === 0, col("embedding"))
          .otherwise(expr(
            "transform(embedding, x -> CAST(x * (1.0 + __rep * 1e-4) + __rep * 1e-5 AS FLOAT))")))
      .drop("__rep")

  def main(args: Array[String]): Unit = {
    val k     = args.headOption.map(_.toInt).getOrElse(10)
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(
      Runtime.getRuntime.availableProcessors())
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.tune(SparkSession.builder(), cores, "graft-scale-probe")
      .master(s"local[$cores]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = blowUpDocs(spark.read.parquet(s"$sfDir/documents.parquet"), k)
        .persist()
      val emb = blowUpEmbeddings(spark.read.parquet(s"$sfDir/embeddings.parquet"), k)
        .persist()
      val nDocs = docs.count(); val nEmb = emb.count() // materialize inputs

      def timed(name: String, df: => DataFrame): String = {
        val t0   = System.nanoTime()
        val rows = df.count()
        val sec  = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[probe] $name%-22s $sec%8.2f s  ($rows rows)")
        f""""$name":{"sec":$sec%.2f,"rows":$rows}"""
      }

      val results = Seq(
        timed("dedup_exact",         Dedup.exact(docs)),
        timed("dedup_minhash_lsh",   Dedup.minhashLsh(docs)),
        timed("dedup_ngram_jaccard", Dedup.ngramJaccard(docs, minJaccard = 0.3, maxShingleDF = 50)),
        timed("dedup_simhash",       Dedup.simhashPairs(docs, maxHamming = 3)),
        timed("dedup_simhash_clusters", Dedup.simhashClusters(docs, maxHamming = 3)),
        timed("dedup_clusters",      Dedup.nearDupClusters(docs, minJaccard = 0.3)),
        timed("dedup_embedding",     Similarity.embeddingNearDups(emb, minCosine = 0.3)),
        timed("sim_lsh_topk",        Similarity.lshTopK(emb, bands = 2, planes = 8, k = 3)),
        timed("sim_ivf_topk",        Similarity.ivfTopK(emb, nLists = 128,
          nProbe = 8, nQueries = 10, k = 5)))

      println(s"""{"probe":"pair_ops_scale","k":$k,"docs":$nDocs,"vectors":$nEmb,"cores":$cores,${results.mkString(",")}}""")
    } finally spark.stop()
  }
}
