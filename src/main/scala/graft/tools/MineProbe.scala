package graft.tools

import graft.SparkEntry
import graft.kb._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for the miner's batched template-job shape: times one
  * level-1-style dangling-template chunk with and without the
  * existential-dedup path, and prints the formatted plans. Diagnostic
  * only — not part of the driver contract. */
object MineProbe {
  def main(args: Array[String]): Unit = {
    val dir  = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val kb = SparkEntry.tpchTriples(spark, dir)
      .where(col("pred").isin("custNation", "suppNation", "nationRegion", "custRegion"))
      .distinct().cache()
    println(s"kb rows = ${kb.count()}")
    val stats = KGStats.compute(kb)

    val candCol = "__cand_rel"
    val head = Atom(Var("x"), Const("custNation"), Var("y"))
    // the hub dangling template: fresh var z0 joins nothing, y is a
    // 25-value hub — the worst level-1 shape
    val tpl  = Atom(Var("z0"), Var(candCol), Var("y"))

    def part(dedup: Boolean) = {
      val df =
        if (dedup) QueryBuilder.distinctableBindings(kb, Seq(head, tpl),
          Set("x", "y", candCol), Some(stats))
        else QueryBuilder.bindings(kb, Seq(head, tpl), Some(stats))
      df.groupBy(col(candCol))
        .agg(countDistinct(struct(col("x"), col("y"))).as("supp"))
    }

    def time(label: String, dedup: Boolean): Unit = {
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        val n  = part(dedup).collect().length
        println(f"$label rep $i: ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
      }
    }

    println("--- plan (dedup) ---")
    println(part(dedup = true).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    time("dedup  ", dedup = true)
    time("nodedup", dedup = false)
    time("dedup  ", dedup = true)
    spark.stop()
  }
}
