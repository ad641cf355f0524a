package graft

import graft.pipeline.{Canonicalize, Corpus, MentionDetect}
import graft.streaming.StreamingIngest
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Incremental (Structured Streaming) construction: new doc batches are
  * appended exactly once across restarts of the stream. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streamed triples equal batch triples, incrementally and across restart") {
    val root   = Files.createTempDirectory("graft-stream").toString
    val docsIn = s"$root/docs"
    val out    = s"$root/triples"
    val chk    = s"$root/chk"

    // alias catalog from a bootstrap corpus (the slowly-evolving side)
    val boot     = Corpus.generate(spark, 400, 50)
    val aliasMap = Canonicalize.aliasMap(MentionDetect.mentions(boot.toDF()))
      .localCheckpoint(true)

    // batch 1 lands
    boot.toDF().where("doc_id like 'doc1%'").write.parquet(s"$docsIn/b1")
    StreamingIngest.start(spark, s"$docsIn/*", aliasMap, out, chk).awaitTermination()
    val n1 = spark.read.parquet(out).count()
    assert(n1 > 0)

    // batch 2 lands; a NEW query resumes from the same checkpoint
    boot.toDF().where("doc_id like 'doc2%'").write.parquet(s"$docsIn/b2")
    StreamingIngest.start(spark, s"$docsIn/*", aliasMap, out, chk).awaitTermination()
    val n2 = spark.read.parquet(out).count()
    assert(n2 > n1)

    // re-running with no new data must append NOTHING (exactly-once)
    StreamingIngest.start(spark, s"$docsIn/*", aliasMap, out, chk).awaitTermination()
    assert(spark.read.parquet(out).count() == n2)

    // and the streamed result equals the batch computation on the same docs
    val streamed = spark.read.parquet(out)
      .select("subj", "pred", "obj").distinct().count()
    val batch = graft.pipeline.LinkScore.link(
        MentionDetect.mentions(
          boot.toDF().where("doc_id like 'doc1%' or doc_id like 'doc2%'")),
        aliasMap)
      .select("subj", "rel", "obj").distinct().count()
    assert(streamed == batch)
  }
}
