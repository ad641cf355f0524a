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
 *  - the alias/entity dictionary joins are explicitly broadcast ONLY
 *    below a size gate ([[Pipeline.DictBroadcastMaxBytes]], measured on
 *    the written stage's parquet bytes): at 10¹² docs the canonical
 *    vocabulary can itself be billions of rows, and an unconditional
 *    `broadcast()` hint would OOM the driver exactly when the data gets
 *    interesting. Above the gate the join is left to Catalyst/AQE
 *    (shuffle-hash of dictionary vs mention stream) — slower, but it
 *    completes; the encoded-long payload keeps that shuffle narrow.
 */
final class Pipeline(
    spark: SparkSession,
    val workDir: String,
    nBuckets: Int = 32,
    saltBits: Int = 3) {

  var runsExecuted: List[String] = Nil
  var runsSkipped: List[String]  = Nil

  private def stageDir(name: String) = s"$workDir/$name"

  // Manifest writes (footer reads + JSON) are driver-only metadata work —
  // they overlap the NEXT stage's compute instead of serializing after
  // each write job. Crash-safety is unchanged: a stage missing its
  // manifest simply recomputes on restart (deterministically), and a
  // single-thread pool keeps manifest writes ordered. run() awaits all
  // pending manifests before returning.
  private val manifestPool = java.util.concurrent.Executors.newSingleThreadExecutor(
    (r: Runnable) => { val t = new Thread(r, "graft-manifest"); t.setDaemon(true); t })
  private val pendingManifests =
    scala.collection.mutable.ArrayBuffer[java.util.concurrent.Future[_]]()

  private def awaitManifests(): Unit = synchronized {
    pendingManifests.foreach(_.get())
    pendingManifests.clear()
  }

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

  private def stageImpl(name: String, inputFp0: String, partitionCols: Seq[String])(
      compute: => DataFrame): DataFrame = {
    // the fingerprint carries the on-disk LAYOUT version alongside the
    // input identity: a workDir written by an older stage layout (e.g.
    // the pre-entity-id triples schema) must recompute, not resume into
    // missing-column failures downstream
    val inputFp = s"layout=${Pipeline.LayoutVersion}|$inputFp0"
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
        val rows     = obs.get("rows").asInstanceOf[Long]
        val checksum = obs.get("checksum").asInstanceOf[Long]
        val hconf    = spark.sparkContext.hadoopConfiguration
        synchronized {
          pendingManifests += manifestPool.submit(new Runnable {
            def run(): Unit = subTimed(s"$name:manifest") {
              Manifest.write(dir, StageManifest(
                stage = name,
                inputFingerprint = inputFp,
                totalRows = rows,
                globalChecksum = checksum,
                partitions = Manifest.footerStats(dir, hconf),
                complete = true))
            }
          })
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
    // a prior failed run on the same workDir may have left a manifest
    // task pending against a stage dir this run is about to overwrite —
    // drain it first so the stale footer read can't race the recompute,
    // and always drain on exit (even a failing one) for the same reason
    awaitManifests()
    try runImpl(docs, inputFp)
    finally awaitManifests()
  }

  private def runImpl(docs: Dataset[Doc], inputFp: Option[String]): DataFrame = {
    val docsDF = docs.toDF()
    val docsFp = inputFp.getOrElse(Manifest.fingerprint(docsDF.select("doc_id")))

    val mentions = stage("mentions", docsFp)(MentionDetect.mentions(docsDF))

    // downstream stages are deterministic functions of the docs input, so
    // the docs fingerprint + a stage tag is their resume identity — no
    // extra fingerprint pass over intermediate data.
    //
    // The stage persists the full alias→(canonical, entity_id) catalog:
    // CC canonicalization, link-score re-ranking (bestCandidates) and the
    // dictionary id assignment are all vocabulary-sized driver-light
    // passes, and the graph table stores dictionary-encoded entity ids
    // (the only sane layout at 10¹² docs — AMIE's own KB is int-encoded),
    // so the decode catalog must survive with the table. One stage, not
    // three: each extra vocabulary-sized stage costs fixed write+manifest
    // +read latency that does not shrink with cores.
    val aliasFp   = docsFp + "|aliases"
    val aliasDict = stage("alias_map", aliasFp) {
      LinkScore.aliasDictionary(
        LinkScore.bestCandidates(Canonicalize.aliasMap(mentions)))
    }

    // link scoring is fused into the materialize stage: the linked stream
    // is cheap to recompute from (mentions, alias_map) — persisting it
    // would double the heaviest I/O for no resume value
    val out = stage("triples", docsFp + "|" + aliasFp, partitionCols = Seq("bucket")) {
      // The materialize exchange is the pipeline's dominant shuffle and
      // this VM (like any node) is bandwidth-bound on row churn: subject
      // and object ship as dictionary-encoded LONGS (bucket/salt computed
      // before the exchange, from the string form) and are NEVER decoded
      // — the sink keeps the ids, decode happens on read via
      // [[materialized]]. The relation stays a string: tiny cardinality
      // (parquet dictionary-encodes it away) and mining scans get
      // relation-filter pushdown on a physical column. The salt lives
      // only in the partitioning EXPRESSION (never a materialized column
      // — 8 fewer bytes per shuffled row); rows are sorted by bucket
      // after the exchange so the dynamic-partition writer reuses the
      // sort.
      LinkScore.linkEncoded(mentions, aliasDict,
        broadcastDict = dictFitsBroadcast("alias_map"))
        .withColumn("bucket", pmod(xxhash64(col("subj")), lit(nBuckets)).cast("int"))
        .select(col("doc_id").as("src_doc"), col("span_idx").as("src_span"),
          col("subj_id"), col("pred"), col("obj_id"), col("bucket"))
        .repartition(col("bucket"),
          pmod(xxhash64(col("src_doc"), col("src_span")), lit(1 << saltBits)))
        .sortWithinPartitions("bucket")
    }
    out
  }

  /** The emitted graph, entity ids decoded — (subj, pred, obj, src_doc,
    * src_span, bucket). Two broadcast joins against the vocabulary-sized
    * entity dictionary; relation filters and bucket pruning on the
    * decoded view still reach the parquet scan because `pred` and
    * `bucket` are physical columns of the encoded table. */
  def materialized(): DataFrame = {
    val dict = spark.read.parquet(stageDir("alias_map"))
      .select(col("entity_id"), col("canonical")).distinct()
    val hint: DataFrame => DataFrame =
      if (dictFitsBroadcast("alias_map")) broadcast else identity
    spark.read.parquet(stageDir("triples"))
      .join(hint(dict.select(col("entity_id").as("subj_id"),
        col("canonical").as("subj"))), "subj_id")
      .join(hint(dict.select(col("entity_id").as("obj_id"),
        col("canonical").as("obj"))), "obj_id")
      .select(col("subj"), col("pred"), col("obj"),
        col("src_doc"), col("src_span"), col("bucket"))
  }

  /** Size gate for the explicit dictionary-broadcast hints: the written
    * stage's parquet bytes (cheap driver listing of an already-local
    * metadata view — no data pass) against
    * [[Pipeline.DictBroadcastMaxBytes]]. A missing dir (stage not yet
    * written) gates TRUE — it only happens at test scale. */
  private def dictFitsBroadcast(stage: String): Boolean = {
    val p  = new org.apache.hadoop.fs.Path(stageDir(stage))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    !fs.exists(p) ||
      fs.listStatus(p).filter(_.isFile).map(_.getLen).sum <=
        Pipeline.DictBroadcastMaxBytes
  }

  /** The emitted graph as a plain (subj, pred, obj) KB for rule mining. */
  def triples(): DataFrame = materialized().select("subj", "pred", "obj")
}

object Pipeline {
  /** Bump whenever a stage's on-disk schema/layout changes — folded into
    * every stage fingerprint so old checkpoints invalidate explicitly.
    * v2 = entity-id-encoded triples + alias catalog with entity_id. */
  val LayoutVersion = 2

  /** Max written-parquet bytes of the alias/entity dictionary for which
    * the pipeline still FORCES broadcast joins (above it, Catalyst/AQE
    * decides — i.e. the dictionary shuffles). 256 MiB compressed ≈ a
    * low-GB in-memory hash relation: comfortably inside a production
    * executor/driver budget, far above `autoBroadcastJoinThreshold`'s
    * conservative 10 MB default — when the alternative is shuffling a
    * 10¹²-row mention stream, forcing the broadcast is right for every
    * dictionary that plausibly fits. Override: GRAFT_DICT_BROADCAST_MAX_BYTES. */
  val DictBroadcastMaxBytes: Long =
    sys.env.get("GRAFT_DICT_BROADCAST_MAX_BYTES").map(_.toLong)
      .getOrElse(256L << 20)
}
