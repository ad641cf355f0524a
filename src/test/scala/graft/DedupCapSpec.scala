package graft

import graft.functions.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LSH bucket-occupancy cap: on corpora whose buckets fit under the cap
  * the capped generators are IDENTICAL to the uncapped all-pairs join;
  * on a degenerate duplicate-heavy corpus (the 100-TB failure mode: one
  * band-signature bucket holding the whole corpus) they emit O(n) star
  * pairs instead of n² and the end-to-end clustering still groups every
  * duplicate. Also covers the exact-dedup composition in
  * [[Dedup.nearDupClusters]] (identical texts collapse to one
  * representative before shingling, output provably unchanged). */
class DedupCapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docsDF(rows: Seq[(Long, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source", "lang")
  }

  /** A varied corpus: no LSH bucket comes close to the 256 cap. */
  private lazy val varied = docsDF((1L to 60L).map { i =>
    (i, s"alpha beta gamma tok$i delta med${i % 7} epsilon zeta eta theta", "s1", "en")
  })

  test("cap off == cap on when no bucket overflows (minhash)") {
    val capped   = Dedup.minhashLsh(varied).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Dedup.minhashLsh(varied, maxBucket = 0).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == uncapped)
  }

  test("cap off == cap on when no bucket overflows (embedding LSH)") {
    import spark.implicits._
    val emb = (1 to 40)
      .map(i => (i.toLong, Array.fill(8)(((i % 5) + 1).toFloat / (i % 3 + 1)), "l1"))
      .toDF("vec_id", "embedding", "label")
    def pairs(cap: Int) = Similarity.embeddingNearDups(emb, minCosine = 0.2, maxBucket = cap)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(Similarity.DefaultMaxBucket) == pairs(0))
  }

  test("ngramJaccard upper-bound pruning: capped two-phase equals brute force, hot shingles counted") {
    // corpus with a HOT bigram ("zz zz" appears in every doc, df > cap)
    // plus rare distinguishing bigrams; the r6 candidate pruning (jaccard
    // upper bound from shared-capped counts + hot-shingle minima) must
    // reproduce the capped-semantics reference exactly: pairs sharing at
    // least one capped shingle, jaccard computed over FULL shingle sets.
    val texts = Map(
      1L -> "zz zz alpha beta gamma delta",
      2L -> "zz zz alpha beta gamma epsilon",  // near-dup of 1
      3L -> "zz zz alpha beta gamma delta",    // exact dup of 1
      4L -> "zz zz omega psi chi phi",         // shares only the hot shingle with 1-3
      5L -> "qq rr ss tt")                     // no hot shingle at all
    val docs = docsDF(texts.toSeq.map { case (i, t) => (i, t, "s1", "en") })
    val cap = 2 // "zz zz" has df 4 > cap; every other shingle df ≤ 2
    def shingleSet(t: String): Set[String] = {
      val toks = t.toLowerCase.split("\\s+").toSeq
      toks.sliding(2).map(_.mkString(" ")).toSet
    }
    val sh = texts.view.mapValues(shingleSet).toMap
    val dfCount = sh.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val expected = (for {
      a <- texts.keys; b <- texts.keys if a < b
      shared = sh(a) intersect sh(b)
      if shared.exists(ng => dfCount(ng) <= cap) // capped-candidate rule
      j = shared.size.toDouble / (sh(a) ++ sh(b)).size
      if j >= 0.3
    } yield (a, b, j)).toSet
    val got = Dedup.ngramJaccard(docs, minJaccard = 0.3, maxShingleDF = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected, s"got $got expected $expected")
    // sanity: (1,3) shares the rare "gamma delta" → candidate, jaccard 1.0;
    // pairs sharing ONLY hot shingles (anything with doc 4) are not
    // candidates — the documented capped-semantics recall trade, unchanged
    assert(got.exists(p => p._1 == 1L && p._2 == 3L && p._3 == 1.0))
    assert(!got.exists(p => p._2 == 4L))
  }

  test("degenerate corpus: one hot bucket produces O(n) star pairs, not n^2") {
    // 3000 exact duplicates share every minhash band signature — the
    // uncapped join would emit ~4 bands * 3000^2/2 pre-distinct pairs.
    val n = 3000
    val dup = docsDF((1L to n.toLong).map(i =>
      (i, "the same exact duplicated document body appears everywhere", "s1", "en")))
    val pairs = Dedup.minhashLsh(dup, maxBucket = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // star shape: every doc paired with the bucket representative (min id)
    assert(pairs.length == n - 1)
    assert(pairs.forall(_._1 == 1L))
  }

  test("overflow star pairs keep end-to-end clustering intact") {
    // 500 identical docs + 2 near-dups of each other + 1 singleton: the
    // identical block overflows a cap of 64, the near-dup pair does not.
    val base = (1L to 500L).map(i =>
      (i, "common crawl boilerplate page body repeated verbatim", "s1", "en"))
    val extra = Seq(
      (900L, "a quick brown fox jumps over the lazy dog today", "s1", "en"),
      (901L, "a quick brown fox jumps over the lazy dog tonight", "s1", "en"),
      (950L, "entirely unrelated standalone document text here", "s1", "en"))
    val out = Dedup.nearDupClusters(docsDF(base ++ extra), minJaccard = 0.3, maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to 500L).forall(out(_) == 1L)) // one cluster, min-id keeper
    assert(out(900L) == 900L && out(901L) == 900L)
    assert(out(950L) == 950L)
  }

  test("exact-dedup composition: nearDupClusters output is the uncomposed quotient") {
    // mixed corpus with exact dups, near dups and singletons; compare the
    // composed operator against a brute-force all-pairs jaccard clustering
    val rows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "s1", "en"),
      (2L, "alpha beta gamma delta epsilon zeta", "s1", "en"), // exact dup of 1
      (3L, "alpha beta gamma delta epsilon eta", "s1", "en"),  // near dup of 1
      (4L, "totally different content lives here now", "s1", "en"),
      (5L, "totally different content lives here now", "s1", "en"), // exact dup of 4
      (6L, "lonely document with unique words only", "s1", "en"))
    val out = Dedup.nearDupClusters(docsDF(rows), minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("simhashClusters == union-find over all-pairs simhashPairs (differential)") {
    // mixed corpus: exact dups, near dups (1-2 token flips on long shared
    // text keep Hamming small), unrelated singletons
    val rows = (1L to 30L).map { i =>
      val body = "shared content words common across docs one two three four five six seven eight"
      val txt =
        if (i <= 10) body                                  // exact-dup block
        else if (i <= 14) body + s" tail$i"                // near dups of the block
        else s"unique standalone document number $i with words " +
          s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g"
      (i, txt, "s1", "en")
    }
    val docs = docsDF(rows)
    // expected: union-find over the EXACT all-pairs Hamming graph
    val edges = Dedup.simhashPairs(docs, maxHamming = 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map((1L to 30L).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (1L to 30L).map(i => i -> find(i)).toMap
    val got = Dedup.simhashClusters(docs, maxHamming = 3, maxBucket = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
    // and the capped run (no bucket near the cap here) is identical
    val capped = Dedup.simhashClusters(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(capped == expected)
  }

  test("simhashClusters: duplicate-heavy corpus stays linear via exact-dedup composition") {
    // 2000 identical docs would make every simhash band bucket hot, but the
    // exact-dedup composition collapses them to ONE representative before
    // any fingerprinting — the LSH/verify phases see 3 docs total.
    val base = (1L to 2000L).map(i =>
      (i, "common crawl boilerplate page body repeated verbatim", "s1", "en"))
    // 24 shared tokens + one flipped token = Hamming 1 (measured), safely
    // under maxHamming 3 and band-coincident by pigeonhole
    val near = "entirely unrelated standalone document text here with many " +
      "stable tokens filling the vector alpha beta gamma delta epsilon " +
      "zeta eta theta iota kappa"
    val extra = Seq(
      (3000L, near, "s1", "en"),
      (3001L, near + " mu", "s1", "en"))
    val out = Dedup.simhashClusters(docsDF(base ++ extra), maxHamming = 3, maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to 2000L).forall(out(_) == 1L))
    assert(out(3000L) == 3000L) // near dup pair clusters to its min id
    assert(out(3001L) == 3000L)
  }

  test("ivfTopK with nProbe == nLists equals brute-force top-k") {
    import spark.implicits._
    // probing every list makes the candidate set = all vectors except self,
    // so IVF must reproduce the exact baseline ranking
    val emb = (0 until 30)
      .map(i => (i.toLong, Array.tabulate(8)(d => ((i * 7 + d * 3) % 11 - 5).toFloat / 3f), "l"))
      .toDF("vec_id", "embedding", "label")
    val ivf = Similarity.ivfTopK(emb, nLists = 6, nProbe = 6, nQueries = 5, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bf = Similarity.bruteForceTopK(emb, nQueries = 5, k = 4)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf == bf)
    // narrower probe returns a SUBSET ranking: each returned neighbor is
    // still ranked consistently (rank 1..k, no gaps per query)
    val narrow = Similarity.ivfTopK(emb, nLists = 6, nProbe = 2, nQueries = 5, k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    narrow.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.size).toSeq)
    }
  }

  test("ivfTopK hot-list split is output-invariant, incl. a degenerate one-list corpus") {
    import spark.implicits._
    // normal corpus: forcing aggressive splits (maxList 4) must not change
    // a single row vs the unsplit default
    val emb = (0 until 30)
      .map(i => (i.toLong, Array.tabulate(8)(d => ((i * 7 + d * 3) % 11 - 5).toFloat / 3f), "l"))
      .toDF("vec_id", "embedding", "label")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val split   = rows(Similarity.ivfTopK(emb, 6, 3, 5, 4, maxList = 4))
    val unsplit = rows(Similarity.ivfTopK(emb, 6, 3, 5, 4))
    assert(split == unsplit)
    // degenerate corpus: every embedding identical → rank-1 assignment
    // ties to list 0, ALL vectors land in one list. The split must cover
    // the whole hot list (probing all sub-lists = probing the list), so
    // nProbe == nLists still equals brute force — and the hot key is no
    // longer a single join partition.
    val flat = (0 until 40)
      .map(i => (i.toLong, Array.fill(8)(1.0f), "l"))
      .toDF("vec_id", "embedding", "label")
    val ivfFlat = rows(Similarity.ivfTopK(flat, 4, 4, 3, 5, maxList = 8))
    val bfFlat = Similarity.bruteForceTopK(flat, nQueries = 3, k = 5)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivfFlat == bfFlat)
  }

  test("cappedBucketPairs: small buckets all-pairs, overflow buckets star") {
    import spark.implicits._
    // bucket A: 3 members (under cap 3) -> 3 pairs; bucket B: 4 members
    // (over cap) -> 3 star pairs to min id
    val rows = Seq(
      ("A", 1L), ("A", 2L), ("A", 3L),
      ("B", 10L), ("B", 11L), ("B", 12L), ("B", 13L))
      .toDF("bkt", "id")
    val got = Dedup.cappedBucketPairs(rows, Seq("bkt"), "id", maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L), (10L, 13L)))
  }
}
