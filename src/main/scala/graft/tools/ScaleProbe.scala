package graft.tools

import graft.Sessions
import graft.pipeline.{Corpus, MentionDetect}
import org.apache.spark.sql.functions._

/** Scratch probe: wall time of isolated pipeline phases at a given
  * parallelism (args: cores nDocs [reps]). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val reps  = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = Sessions.local(cores, "graft-scaleprobe")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name: String)(f: => Any): Unit = (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      f
      println(f"[probe] cores=$cores $name%-10s rep$r ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val docs = Corpus.generate(spark, nDocs, 10000)
    timed("gen")     { docs.toDF().count() }
    timed("mention") { MentionDetect.mentions(docs.toDF()).count() }
    for (codec <- Seq("zstd", "snappy", "lz4")) {
      val d = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "probe").toString
      timed(s"write-$codec") {
        MentionDetect.mentions(docs.toDF()).write.mode("overwrite")
          .option("compression", codec).parquet(d)
      }
      timed(s"read-$codec") { spark.read.parquet(d).agg(count(lit(1))).collect() }
      println(s"[probe] bytes-$codec " + new java.io.File(d).listFiles
        .filter(_.getName.endsWith("parquet")).map(_.length).sum / 1048576 + " MiB")
    }
    spark.stop()
  }
}
