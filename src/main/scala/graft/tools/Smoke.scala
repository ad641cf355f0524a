package graft.tools

import org.apache.spark.sql.SparkSession

/** Flagship demo: runs SparkEntry.entry (full fixture mining) and prints
  * the scored rules — the same call the driver smoke-checks. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    df.show(50, truncate = false)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
