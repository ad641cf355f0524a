package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`):
 *
 *  - brute-force cosine top-k — the exact baseline; a blocked cross join
 *    with one codegen'd fold per pair;
 *  - LSH-bucketed ANN — random-hyperplane signatures (Charikar '02):
 *    vectors land in 2^planes sign buckets, search only within the
 *    bucket. At 100 TB the bucket join replaces the quadratic cross
 *    join; recall is tuned by planes/band count.
 *
 * All dot products fold left-to-right over double-cast elements
 * (`aggregate(zip_with(...))`), so any engine evaluating the same fold
 * shape reproduces scores bit-for-bit — the property the DuckDB oracle
 * compare relies on. Hyperplane signs derive from md5 (engine-portable),
 * not from an RNG.
 */
object Similarity {

  /** cosine(a, b) as a Column expression over two array<float> columns. */
  def cosineExpr(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)),
       |          0D, (acc, v) -> acc + v)
       | / (sqrt(aggregate($a, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))
       |    * sqrt(aggregate($b, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))))
       |""".stripMargin.replace("\n", " "))

  /**
   * Exact top-k cosine neighbors for the query set `vec_id < nQueries`
   * (rank by score desc, then neighbor id — fully deterministic).
   */
  def bruteForceTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val q = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val pairs = q.join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosineExpr("qe", "ne"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  /** Components 1..this of every plane get their md5 sign PRECOMPUTED on
    * the driver (the hash depends only on (plane, index), never on data);
    * beyond it the in-plan md5 fallback applies. 512 covers every common
    * embedding width; raising it only grows a string literal. */
  private val MaxPrecomputedDim = 512

  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()

  /** '1'/'0' sign chars of plane `j` for components 1..MaxPrecomputedDim —
    * the SAME low-bit-of-md5("{j}_{i}") rule as the in-plan fallback,
    * evaluated once per plane on the driver. */
  private def signChars(j: Int): String =
    signCache.computeIfAbsent(j, _ => {
      val md = java.security.MessageDigest.getInstance("MD5")
      (1 to MaxPrecomputedDim).map { i =>
        md.reset()
        val d = md.digest(s"${j}_$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if ((d(0) & 1) == 1) '1' else '0'
      }.mkString
    })

  /** Signed projection of `embedding` onto deterministic hyperplane `j`:
    * component i has sign +1 iff the low bit of md5("{j}_{i}") is 1.
    * The sign matrix is hoisted to a driver-side literal (bit-identical
    * products in the same fold order as the md5 form — r5 computed one
    * md5 PER ELEMENT PER PLANE PER ROW here, the dominant cost of every
    * hyperplane-LSH operator); the md5 expression survives only as the
    * beyond-[[MaxPrecomputedDim]] fallback, lazily evaluated. */
  private def planeDot(j: Int): Column = expr(
    s"""aggregate(zip_with(embedding, sequence(1, size(embedding)), (x, i) ->
       |  (case when i <= $MaxPrecomputedDim
       |        then (case when substring('${signChars(j)}', i, 1) = '1' then 1.0D else -1.0D end)
       |        else (case when cast(conv(substring(md5(concat('$j', '_', cast(i as string))), 1, 2), 16, 10) as bigint) % 2 = 1
       |              then 1.0D else -1.0D end) end) * cast(x as double)),
       |  0D, (acc, v) -> acc + v)""".stripMargin.replace("\n", " "))

  /** 2^planes sign-bucket id per vector. */
  def lshBucket(emb: DataFrame, planes: Int): DataFrame = {
    val bucket = (0 until planes)
      .map(j => when(planeDot(j) >= 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)
    emb.withColumn("bucket", bucket)
  }

  /**
   * Banded multi-table hyperplane LSH — the MinHash banding idea applied
   * to Charikar sign hashes: `bands` INDEPENDENT hyperplane tables of
   * `planes` planes each (table b uses planes b·planes … b·planes+planes−1,
   * so band 0 equals the single-table [[lshBucket]] signature); a pair is
   * a candidate iff all signs agree in SOME band. This is the scale path
   * the fixed 2^planes single table lacks: bucket occupancy shrinks
   * geometrically as `planes` grows with n (keeping the bucket join
   * near-linear), while recall is recovered by OR-composing bands —
   * recall ≈ 1−(1−(1−θ/π)^planes)^bands for angle θ, tunable without
   * re-coupling to occupancy. One row per (vector, band).
   */
  def bandedBuckets(emb: DataFrame, bands: Int, planes: Int): DataFrame = {
    val bandBuckets = array((0 until bands).map { b =>
      (0 until planes)
        .map(j => when(planeDot(b * planes + j) >= 0, lit(1L << j)).otherwise(0L))
        .reduce(_ + _)
    }: _*)
    emb.select(col("vec_id"), col("embedding"),
        posexplode(bandBuckets).as(Seq("band", "bucket")))
  }

  /** Per-(band, bucket) occupancy cap — same rationale and star-overflow
    * semantics as [[Dedup.DefaultMaxBucket]]: a degenerate embedding
    * column (e.g. millions of zero or templated vectors landing in one
    * sign bucket) otherwise turns the candidate join quadratic. */
  val DefaultMaxBucket = 256

  /** Distinct candidate pairs (id_a < id_b) sharing any band bucket.
    * The (band, bucket) join key means cost ∝ Σ min(occupancy, cap)² per
    * band; dedup happens BEFORE any cosine is computed. */
  private def bandedCandidates(
      b: DataFrame, maxBucket: Int = DefaultMaxBucket): DataFrame =
    Dedup.cappedBucketPairs(b.select(col("vec_id"), col("band"), col("bucket")),
        Seq("band", "bucket"), "vec_id", maxBucket)
      .toDF("id_a", "id_b")

  /**
   * LSH-bucketed ANN: top-k cosine neighbors among candidates sharing
   * ANY band bucket (banded multi-table — see [[bandedBuckets]]). Each
   * candidate pair is scored ONCE (dedup before the cosine), then ranked
   * per query. Symmetric candidates: (a,b) produces both directions.
   */
  def lshTopK(emb: DataFrame, bands: Int, planes: Int, k: Int,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    // the symmetrization union consumes the candidate pairs twice — without
    // materialization the whole banded bucket join re-executes per side
    val cand = bandedCandidates(bandedBuckets(emb, bands, planes), maxBucket)
      .localCheckpoint(true)
    val sym = cand.union(cand.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .select(col("id_a").as("query_id"), col("id_b").as("neighbor_id"))
    val pairs = sym
      .join(emb.select(col("vec_id").as("query_id"), col("embedding").as("qe")), "query_id")
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")), "neighbor_id")
      .withColumn("score", cosineExpr("qe", "ne"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicates over the banded candidate set:
    * pairs sharing any band bucket with cosine ≥ minCosine, id_a < id_b.
    * Cost ∝ Σ per-band occupancy² + one cosine per DISTINCT candidate. */
  def embeddingNearDups(
      emb: DataFrame, minCosine: Double, bands: Int = 2, planes: Int = 8,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    bandedCandidates(bandedBuckets(emb, bands, planes), maxBucket)
      .join(emb.select(col("vec_id").as("id_a"), col("embedding").as("qe")), "id_a")
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("ne")), "id_b")
      .withColumn("cos", cosineExpr("qe", "ne"))
      .where(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /**
   * IVF (inverted-file) ANN — the second scale path next to [[lshTopK]]:
   * vectors are partitioned into `nLists` inverted lists keyed by their
   * nearest coarse centroid, and a query scores ONLY the members of its
   * `nProbe` nearest lists (candidates ∝ nProbe/nLists of the corpus,
   * recall tuned by nProbe).
   *
   * The coarse quantizer is DETERMINISTIC: the `nLists` vectors with the
   * smallest ids are the centroids. Production systems train k-means
   * here; that changes list QUALITY, not the distributed shape — which is
   * the operator: tiny broadcast centroid table → one dense scoring pass
   * (a broadcast nested-loop by construction, n×nLists cosines — linear
   * in n, NOT a candidate-generation quadratic) → hash-join from probed
   * lists to list members → per-query top-k window.
   *
   * Hot-list defense (same discipline as [[Dedup.cappedBucketPairs]]): a
   * degenerate corpus (zero / templated embeddings) sends most vectors to
   * ONE list, which as a single join key collapses the member join and
   * everything downstream into one task. Lists above `maxList` members
   * are split into ⌈size/maxList⌉ sub-lists by a hash of the member id,
   * and probes fan out to ALL sub-lists of each probed list — the
   * candidate SET is exactly the unsplit one (oracle stays exact, and
   * the nProbe == nLists ≡ brute-force property is preserved); only the
   * join key gains parallelism. Probe fan-out rides a broadcast of the
   * (list, sub) directory (≤ Σ⌈size/maxList⌉ rows).
   */
  val DefaultMaxList = 4096

  def ivfTopK(emb: DataFrame, nLists: Int, nProbe: Int, nQueries: Int,
      k: Int, maxList: Int = DefaultMaxList): DataFrame = {
    val cents = emb.orderBy("vec_id").limit(nLists)
      .select(col("vec_id").as("list_id"), col("embedding").as("ce"))
    // (vector × centroid) cosine rank, ties to the smaller list id — used
    // at rank 1 for assignment and at rank ≤ nProbe for query probing
    def ranked(v: DataFrame) = v
      .crossJoin(broadcast(cents))
      .withColumn("ccos", cosineExpr("embedding", "ce"))
      .withColumn("crk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("list_id"))))
    val assigned = ranked(emb).where(col("crk") === 1)
      .select(col("vec_id"), col("list_id"))
      .localCheckpoint(true) // feeds both the probe join and the member join
    val probes = ranked(emb.where(col("vec_id") < nQueries))
      .where(col("crk") <= nProbe)
      .select(col("vec_id").as("query_id"), col("list_id"))
    // hot-list split: members of an oversized list scatter across
    // sub-lists; the directory of live (list_id, sub_id) keys is tiny
    val sizes = assigned.groupBy("list_id").agg(count(lit(1)).as("__sz"))
    val members = assigned.join(broadcast(sizes), "list_id")
      .withColumn("sub_id",
        pmod(xxhash64(col("vec_id")),
          greatest(lit(1L), ceil(col("__sz") / lit(maxList)).cast("long"))))
      .select(col("vec_id").as("neighbor_id"), col("list_id"), col("sub_id"))
    val subDir = members.select("list_id", "sub_id").distinct()
    val cand = probes.join(broadcast(subDir), "list_id")
      .join(members, Seq("list_id", "sub_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      // already unique: each neighbor lives in exactly ONE (list, sub)
      // (rank-1 assignment + hash sub-id) and probe (list, sub) pairs are
      // distinct per query — no dedup shuffle
      .select("query_id", "neighbor_id")
    val scored = cand
      .join(emb.select(col("vec_id").as("query_id"), col("embedding").as("qe")), "query_id")
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")), "neighbor_id")
      .withColumn("score", cosineExpr("qe", "ne"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }
}
