package graft.tools

import graft.{Sessions, SparkEntry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Extra measurement main for the optimization round (guide §1.4): times
 * queries with the NOOP sink (every column of every row computed, no
 * count-pruning) and decomposes the expensive operators into sub-steps.
 * Separate from [[graft.Bench]] on purpose — the driver-graded bench and
 * its methodology are frozen; numbers from here are cited in
 * OPTIMIZATION_r06.md only.
 *
 * Run: sbt "runMain graft.tools.BenchExtra <sfdir> [queries-csv]"
 */
object BenchExtra {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  private def noop(df: DataFrame): Double =
    timed(df.write.format("noop").mode("overwrite").save())._2

  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val only  = args.lift(1).map(_.split(",").map(_.trim).toSet)
    val spark = Sessions.local(cores, "graft-bench-extra")
    spark.sparkContext.setLogLevel("WARN")
    val sweep = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // warm code paths once on the tiny tier (same rationale as Bench)
    val warm = "/root/testdata/sf0.001"
    if (new java.io.File(warm).isDirectory)
      sweep.foreach { case (n, fn) =>
        try {
          spark.sparkContext.setJobDescription(s"warm:$n")
          fn(spark, warm).write.format("noop").mode("overwrite").save()
        } catch { case _: Throwable => }
      }
    val out = sweep.map { case (n, fn) =>
      spark.sparkContext.setJobDescription(s"noop:$n")
      val s = try noop(fn(spark, dir)) catch { case _: Throwable => -1.0 }
      f""""$n":$s%.3f"""
    }
    println(s"""{"noop_queries":${out.mkString("{", ",", "}")},"sf":"$dir"}""")
    spark.stop()
  }
}
