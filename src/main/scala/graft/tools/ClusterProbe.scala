package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: stage-by-stage timing of the near-dup clustering flow. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(32, "graft-clusterprobe")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.1f s"); a
    }
    val cand = t("minhashLsh+ckpt") { graft.functions.Dedup.minhashLsh(docs).localCheckpoint(true) }
    println("PROBE cand_rows " + cand.count())
    val sh = t("shingles+semi+ckpt") {
      graft.functions.Dedup.shinglesForProbe(docs).select("doc_id", "ng")
        .join(cand.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")).distinct(), Seq("doc_id"), "left_semi")
        .localCheckpoint(true)
    }
    println("PROBE sh_rows " + sh.count())
    val inter = t("inter+verify") {
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val i = sh.as("a").join(sh.as("b"),
          col("a.ng") === col("b.ng") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
        .join(cand, Seq("doc_a", "doc_b"), "left_semi")
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
        .where(col("inter").cast("double") / (col("sza") + col("szb") - col("inter")) >= 0.3)
        .select(lpad(col("doc_a").cast("string"), 20, "0").as("src"),
          lpad(col("doc_b").cast("string"), 20, "0").as("dst"))
        .localCheckpoint(true)
      println("PROBE verified_rows " + i.count()); i
    }
    t("cc") { println("PROBE cc_rows " + graft.plans.ConnectedComponents.run(inter).count()) }
    spark.stop()
  }
}
