package graft.tools

import graft.{Sessions, SparkEntry}
import org.apache.spark.sql.SparkSession

/**
 * Plan inspector: print the formatted physical plan (and optionally the
 * AQE final plan after execution) of any [[SparkEntry.queries]] entry
 * against any table directory — the `.explain("formatted")` feedback
 * loop as a first-class tool, usable against the driver's sf dirs or the
 * scale probes' blown-up dirs.
 *
 * Run:  sbt "runMain graft.tools.ExplainQuery <dir> <query> [run] [cores]"
 *   `run` executes the query after explaining so AQE's runtime re-plan
 *   (broadcast conversion, skew splitting, coalesce) is shown too.
 */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.01")
    val name  = args.lift(1).getOrElse("kb_join_two_atoms")
    val run   = args.lift(2).contains("run")
    val cores = args.lift(3).map(_.toInt).getOrElse(
      Runtime.getRuntime.availableProcessors())
    val spark = Sessions.tune(SparkSession.builder(), cores, "graft-explain")
      .master(s"local[$cores]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"==== $name @ $dir ====")
      df.explain("formatted")
      if (run) {
        val t0 = System.nanoTime()
        val n  = df.count()
        println(f"rows=$n  sec=${(System.nanoTime() - t0) / 1e9}%.2f")
        println("==== AQE final plan ====")
        df.explain("formatted")
      }
    } finally spark.stop()
  }
}
