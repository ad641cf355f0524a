package graft.tools

/** Scratch timing harness: time one SparkEntry query at a given SF dir. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name  = args(0)
    val dir   = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.Sessions.local(32, "graft-timeone")
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n  = graft.SparkEntry.queries(name)(spark, dir).count()
    println(f"TIMEONE $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }
}
