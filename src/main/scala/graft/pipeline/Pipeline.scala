package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The KG-construction pipeline (BASELINE.json north_rule):
 *
 *   docs → MentionDetect → Canonicalize (CC over alias graph)
 *        → LinkScore (broadcast candidate join, top-1)
 *        → Materialize (subj, pred, obj, lineage), hash-bucketed by subj
 *
 * Every stage is a checkpointed parquet write with a `_manifest.json`
 * (per-partition rows + checksums = lineage; input fingerprint = resume
 * key). On restart, completed stages are skipped and their output reused
 * — `runsExecuted`/`runsSkipped` expose this for tests.
 *
 * Scale decisions (explicit, per north_rule):
 *  - the materialize shuffle is *salted*: head subjects (power-law) would
 *    otherwise pin whole hash buckets onto single tasks, so rows are
 *    repartitioned by (bucket, salt) with salt = xxhash64(doc,span) % S;
 *    the on-disk layout stays bucketed by subject hash (directory
 *    partition column `bucket`), which later rule-quality joins prune on;
 *  - AQE (adaptive + skew-join) is expected on in the session (Sessions);
 *  - the alias/candidate tables are vocabulary-sized → broadcast joins.
 */
final class Pipeline(
    spark: SparkSession,
    workDir: String,
    nBuckets: Int = 32,
    saltBits: Int = 3) {

  var runsExecuted: List[String] = Nil
  var runsSkipped: List[String]  = Nil

  private def stageDir(name: String) = s"$workDir/$name"

  /** Run one resumable stage: skip when a complete manifest matches the
    * input fingerprint, else compute → write parquet → write manifest. */
  def stage(name: String, inputFp: String, partitionCols: Seq[String] = Nil)(
      compute: => DataFrame): DataFrame = {
    val t0  = System.nanoTime()
    val out = stageImpl(name, inputFp, partitionCols)(compute)
    if (sys.env.contains("GRAFT_STAGE_TIMING"))
      System.err.println(f"[stage] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    out
  }

  private def subTimed[A](what: String)(f: => A): A =
    if (!sys.env.contains("GRAFT_STAGE_TIMING")) f
    else {
      val t0 = System.nanoTime()
      val a  = f
      System.err.println(f"[sub]   $what%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }

  private def stageImpl(name: String, inputFp: String, partitionCols: Seq[String])(
      compute: => DataFrame): DataFrame = {
    val dir = stageDir(name)
    Manifest.read(dir) match {
      case Some(m) if m.complete && m.inputFingerprint == inputFp =>
        runsSkipped ::= name
        spark.read.parquet(dir)
      case _ =>
        runsExecuted ::= name
        val df = compute
        // row count + content checksum captured DURING the write job
        // (observe = zero extra pass); per-file rows/bytes from parquet
        // footers (metadata only) — no re-read of the stage output.
        val obs     = new org.apache.spark.sql.Observation(s"graft_$name")
        val hashCol = coalesce(
          bit_xor(xxhash64(df.columns.map(col).toSeq: _*)), lit(0L))
        val w = df.observe(obs, count(lit(1)).as("rows"), hashCol.as("checksum"))
          .write.mode("overwrite")
        subTimed(s"$name:write") {
          (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
            .parquet(dir)
        }
        subTimed(s"$name:manifest") {
          Manifest.write(dir, StageManifest(
            stage = name,
            inputFingerprint = inputFp,
            totalRows = obs.get("rows").asInstanceOf[Long],
            globalChecksum = obs.get("checksum").asInstanceOf[Long],
            partitions = Manifest.footerStats(dir, spark.sparkContext.hadoopConfiguration),
            complete = true))
        }
        spark.read.parquet(dir)
    }
  }

  /**
   * Full run: docs → triples(subj, pred, obj, src_doc, src_span, bucket).
   *
   * @param inputFp optional caller-asserted input identity (e.g. the
   *                generator parameters, or a storage-layer snapshot id).
   *                When absent, a full data fingerprint pass is paid —
   *                at 10¹² docs the metadata-based identity is the only
   *                sane choice (Iceberg snapshot-id semantics).
   */
  def run(docs: Dataset[Doc], inputFp: Option[String] = None): DataFrame = {
    val docsDF = docs.toDF()
    val docsFp = inputFp.getOrElse(Manifest.fingerprint(docsDF.select("doc_id")))

    val mentions = stage("mentions", docsFp)(MentionDetect.mentions(docsDF))

    // downstream stages are deterministic functions of the docs input, so
    // the docs fingerprint + a stage tag is their resume identity — no
    // extra fingerprint pass over intermediate data
    val aliasFp  = docsFp + "|aliases"
    val aliasMap = stage("alias_map", aliasFp)(Canonicalize.aliasMap(mentions))

    // link scoring is fused into the materialize stage: the linked stream
    // is cheap to recompute from (mentions, alias_map) — persisting it
    // would double the heaviest I/O for no resume value
    stage("triples", docsFp + "|" + aliasFp, partitionCols = Seq("bucket")) {
      // the materialize exchange is the pipeline's dominant shuffle and
      // this VM (like any node) is memory-bandwidth-bound on row churn:
      // subj/rel/obj ship as dictionary-encoded LONGS through the shuffle
      // (bucket/salt computed before, from the string form) and decode
      // back via broadcast joins on the reduce side, just before the sink
      val best       = subTimed("best_cands") { LinkScore.bestCandidates(aliasMap).localCheckpoint(true) }
      val entityDict = subTimed("entity_dict") { LinkScore.entityDictionary(best).localCheckpoint(true) }
      val relDict    = LinkScore.relDictionary(mentions)
      // the salt lives only in the partitioning EXPRESSION (never a
      // materialized column — 8 fewer bytes per shuffled row), and the
      // narrow encoded rows are sorted by bucket right after the exchange:
      // the broadcast decode joins preserve the streamed side's order, so
      // the dynamic-partition write reuses this sort instead of re-sorting
      // the decoded (string-wide) rows
      val salted = LinkScore.linkEncoded(mentions, best, entityDict, relDict)
        .withColumn("bucket", pmod(xxhash64(col("subj")), lit(nBuckets)).cast("int"))
        .select("doc_id", "span_idx", "subj_id", "rel_id", "obj_id", "bucket")
        .repartition(col("bucket"),
          pmod(xxhash64(col("doc_id"), col("span_idx")), lit(1 << saltBits)))
        .sortWithinPartitions("bucket")
      salted
        .join(broadcast(entityDict.select(
          col("entity_id").as("subj_id"), col("canonical").as("subj"))), "subj_id")
        .join(broadcast(entityDict.select(
          col("entity_id").as("obj_id"), col("canonical").as("obj"))), "obj_id")
        .join(broadcast(relDict.select(col("rel_id"), col("rel").as("pred"))), "rel_id")
        .select(
          col("subj"), col("pred"), col("obj"),
          col("doc_id").as("src_doc"), col("span_idx").as("src_span"),
          col("bucket"))
    }
  }

  /** The emitted graph as a plain (subj, pred, obj) KB for rule mining. */
  def triples(): DataFrame =
    spark.read.parquet(stageDir("triples")).select("subj", "pred", "obj")
}
