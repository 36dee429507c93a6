package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic guarantees of the dedup/similarity candidate generators that
  * the driver only rows-only-checks (engine-internal hashes): exact
  * duplicates are ALWAYS candidates (identical signatures survive any
  * banding), near-duplicates verify above the Jaccard threshold, and
  * unrelated docs don't flood the candidate set.
  */
class DedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while seventeen sleepy cats watch from a warm stone wall near the river"
  // one-word edit of `base` — high 3-gram Jaccard, not exact
  private val nearDup = base.replace("warm", "cold")
  private val other = "completely different content about spark catalyst " +
    "optimizer rules and whole stage code generation for analytic queries"

  private val corpus = docs(
    0L -> base, 1L -> base, // exact dups
    2L -> nearDup,
    3L -> other, 4L -> (other + " with a tail"),
    5L -> "tiny doc", // < 3 words: fallback shingle
    6L -> "tiny doc")

  test("exact duplicates are always MinHash candidates (both hash families)") {
    val xx = Dedup.minhashCandidates(spark, corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(xx.contains((0L, 1L)), s"xxhash64 candidates missed (0,1): $xx")
    assert(xx.contains((5L, 6L)), s"xxhash64 candidates missed (5,6): $xx")
    val ar = Dedup.minhashCandidatesArith(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ar.contains((0L, 1L)), s"arith candidates missed (0,1): $ar")
    assert(ar.contains((5L, 6L)), s"arith candidates missed (5,6): $ar")
  }

  test("near-duplicate pair verifies above the Jaccard threshold") {
    val out = Dedup.ngramJaccard(spark, corpus)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out.get((0L, 1L)).contains(1.0), s"exact pair jaccard != 1: $out")
    // one-word edit over ~23 words: 3 shingles differ of ~21
    val nd = out.get((0L, 2L)).orElse(out.get((1L, 2L)))
    assert(nd.exists(j => j > 0.7 && j < 1.0),
      s"near-dup pair missing or out of range: $out")
    assert(!out.keySet.exists { case (x, y) =>
      Set(x, y).subsetOf(Set(0L, 1L, 2L)) && Set(x, y).contains(3L) },
      s"unrelated doc paired with base cluster: $out")
  }

  test("SimHash: identical docs at Hamming 0, unrelated docs not paired") {
    // NOTE: a one-word edit on a ~23-distinct-word doc legitimately flips
    // more than maxHamming bits (vote margins are O(1) at this vocabulary
    // size), so near-dup recall is only asserted for exact duplicates here;
    // SimHash's sweet spot is large-vocabulary documents.
    val out = Dedup.simhashCandidates(spark, corpus)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Number](2).longValue))
      .toMap
    assert(out.get((0L, 1L)).contains(0L), s"exact pair hamming != 0: $out")
    assert(out.get((5L, 6L)).contains(0L), s"tiny exact pair missing: $out")
    assert(!out.contains((0L, 3L)) && !out.contains((1L, 3L)),
      s"unrelated docs paired: $out")
  }

  test("identical embeddings share an LSH signature and verify at cosine 1") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0f, 2.0f, -3.0f, 0.5f), 0),
      (1L, Array(1.0f, 2.0f, -3.0f, 0.5f), 0), // exact dup
      (2L, Array(1.01f, 2.0f, -3.0f, 0.5f), 0), // near dup
      (3L, Array(-5.0f, 0.1f, 4.0f, -2.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val sig = Similarity.intLshSignature(e, 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) == sig(1L), "identical vectors must share the signature")
    val pairs = Similarity.neardupLsh(spark, e)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.get((0L, 1L)).contains(1.0), s"exact pair cosine != 1: $pairs")
  }

  test("connected components converge on a 64-vertex path within the " +
    "O(log diameter) round bound (q59 regression: plain propagation " +
    "needs 63 rounds here and fails the 16-round require)") {
    import spark.implicits._
    // path 0-1-2-...-63 (diameter 63) plus one separate triangle and one
    // isolated pair: min-reachable labels are 0, 100, 200
    val path = (0L until 63L).map(i => (i, i + 1))
    val extra = Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L))
    val pairs = (path ++ extra).toDF("a", "b")
    val lbl = Similarity.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 63L).foreach(v => assert(lbl(v) == 0L, s"path vertex $v -> ${lbl(v)}"))
    Seq(100L, 101L, 102L).foreach(v => assert(lbl(v) == 100L))
    Seq(200L, 201L).foreach(v => assert(lbl(v) == 200L))
  }

  test("connected components match a local union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { g =>
      val n = 20 + rnd.nextInt(30)
      val pairs = Vector.fill(10 + rnd.nextInt(50))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      // local union-find truth: min reachable id per vertex
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val truth = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(v => v -> find(v)).toMap
      val got = Similarity.connectedComponents(
          pairs.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == truth, s"graph $g: spark=$got truth=$truth")
    }
  }
}
