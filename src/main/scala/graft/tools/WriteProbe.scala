package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** Scratch probe: raw parquet-write and shuffle scaling (args: cores). */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val spark = Sessions.local(cores, "graft-writeprobe")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed(name: String)(f: => Any): Unit = (1 to 2).foreach { r =>
      val t0 = System.nanoTime()
      f
      println(f"[wprobe] cores=$cores $name%-8s rep$r ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val df = spark.range(30000000L)
      .select($"id", concat(lit("entity_"), $"id" % 50000).as("s"),
        (xxhash64($"id") % 1000).as("h"))

    timed("cpu")     { df.select(bit_xor(xxhash64($"s", $"h"))).collect() }
    timed("shuffle") { df.groupBy("s").agg(count(lit(1))).select(bit_xor(col("count(1)"))).collect() }
    timed("write") {
      val d = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "wprobe").toString
      df.write.mode("overwrite").parquet(d)
    }
    spark.stop()
  }
}
