package graft.tools

import graft.Sessions
import graft.pipeline.{Corpus, Pipeline}

/** One benchmark level, meant to run inside a CPU-pinned JVM (Bench
  * spawns it under `taskset`): warm-up pilot + `reps` timed pipeline
  * runs; prints one parseable line.
  * args: cores nDocs nEntities reps */
object PipelineLevel {
  def main(args: Array[String]): Unit = {
    val Array(cores, nDocs, nEntities, reps) = args.map(_.toLong)
    val spark = Sessions.local(cores.toInt, s"graft-level-$cores")
    spark.sparkContext.setLogLevel("ERROR")
    val base = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(base), s"graft-level$cores").toString
    try {
      new Pipeline(spark, s"$dir/warmup", nBuckets = 32)
        .run(Corpus.generate(spark, 50000, nEntities.toInt), inputFp = Some("warmup"))
        .count()
      var triples = 0L
      val secs = (1 to reps.toInt).map { r =>
        val t0 = System.nanoTime()
        triples = new Pipeline(spark, s"$dir/main$r", nBuckets = 32)
          .run(Corpus.generate(spark, nDocs, nEntities.toInt),
            inputFp = Some(s"corpus:42:$nDocs:$nEntities")).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"GRAFT_LEVEL cores=$cores triples=$triples bestSec=${secs.min}%.3f")
    } finally {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(root))
        java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      spark.stop()
    }
  }
}
