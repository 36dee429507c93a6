package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite over the `documents` table — exact, bag-of-words,
  * n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale notes (100 TB design point):
  *  - exact / bag dedup: one hash-shuffle on a 128-bit digest; group sizes
  *    are tiny (true duplicates), no skew risk beyond pathological
  *    empty-text keys.
  *  - MinHash LSH: band signatures explode each doc into B rows (B=8 here),
  *    the candidate join is a self-equi-join on (band, band_hash) — the
  *    classic shingle->minhash->band->bucket-join plan. Bucket sizes are
  *    bounded by near-duplicate cluster size, not corpus size; a
  *    `count > threshold` guard drops degenerate buckets (boilerplate
  *    spam) before the quadratic within-bucket pairing.
  *  - SimHash: 64-bit signature per doc; candidate pairs via banded 16-bit
  *    chunks, verified by Hamming distance.
  */
object Dedup {

  /** Sorted distinct whitespace tokens — word-order-invariant content key. */
  private def bagKey(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(text, " ")))))

  val defs: Seq[QueryDef] = Seq(
    // -------------------------------------------------- exact duplicate sets
    QueryDef("q21_dedup_exact",
      (s, d) => {
        val grouped = T.load(s, d, "documents")
          .groupBy(col("source"), md5(col("text")).as("content_hash"))
          .agg(count(lit(1)).as("n"))
        grouped.groupBy(col("source"))
          .agg(sum(col("n")).as("n_docs"),
            count(lit(1)).as("n_distinct"),
            (sum(col("n")) - count(lit(1))).as("n_exact_dups"))
          .orderBy(col("source"))
      },
      Some("""WITH g AS (SELECT source, md5(text) AS h, count(*) AS n
          FROM documents GROUP BY source, md5(text))
        SELECT source, CAST(sum(n) AS BIGINT) AS n_docs, count(*) AS n_distinct,
          CAST(sum(n) - count(*) AS BIGINT) AS n_exact_dups
        FROM g GROUP BY source ORDER BY source""")),

    // ------------------------------------- word-bag (order-invariant) dedup
    QueryDef("q22_dedup_bag",
      (s, d) => T.load(s, d, "documents")
        .groupBy(bagKey(col("text")).as("bag_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_members"))
        .filter(col("n_members") > 1)
        .orderBy(col("bag_hash")),
      Some("""SELECT
          md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
            AS bag_hash,
          min(doc_id) AS keep_id, count(*) AS n_members
        FROM documents
        GROUP BY 1 HAVING count(*) > 1
        ORDER BY bag_hash""")),

    // ------------------------- exact-dedup survivor scan (keep min doc_id)
    QueryDef("q23_dedup_survivors",
      (s, d) => {
        val w = Window.partitionBy(md5(col("text")))
          .orderBy(col("doc_id"))
        T.load(s, d, "documents")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_unique"), sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("lang"))
      },
      Some("""WITH r AS (SELECT lang, n_chars,
          row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
        FROM documents)
        SELECT lang, count(*) AS n_unique,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM r WHERE rk = 1 GROUP BY lang ORDER BY lang""")),

    // ----------------------------------- MinHash + LSH band join (no oracle:
    // hash functions are engine-internal; driver does the rows-only check)
    QueryDef("q24_minhash_lsh",
      (s, d) => minhashCandidates(s, T.load(s, d, "documents")),
      None),

    // ------------------------------------------------ SimHash near-dup
    QueryDef("q25_simhash",
      (s, d) => simhashCandidates(s, T.load(s, d, "documents")),
      None),

    // ---------------------------- n-gram Jaccard verification of candidates
    QueryDef("q26_ngram_jaccard",
      (s, d) => ngramJaccard(s, T.load(s, d, "documents")),
      None)
  )

  /** Word 3-gram shingle array (distinct). All higher-order functions —
    * stays inside codegen, no UDF.
    */
  private def wordShingles(text: Column, n: Int = 3): Column = {
    val words = split(text, " ")
    val k = size(words) - (n - 1)
    array_distinct(
      when(k > 0, transform(sequence(lit(0), k - 1), i =>
        concat_ws(" ", (0 until n).map(j => element_at(words, (i + j + 1).cast("int"))): _*)))
        .otherwise(array(text)))
  }

  /** MinHash signature: for each of `perms` hash permutations, the min over
    * shingle hashes of xxhash64(shingle, seed). Banded into `bands` groups;
    * docs sharing any (band, band_hash) bucket become candidate pairs.
    */
  def minhashCandidates(s: SparkSession, docs: DataFrame,
      perms: Int = 32, bands: Int = 8): DataFrame = {
    val rowsPerBand = perms / bands
    val sh = docs.select(col("doc_id"), wordShingles(col("text")).as("sh"))
    val sig = sh.select(col("doc_id"),
      array((0 until perms).map { p =>
        array_min(transform(col("sh"), x => xxhash64(x, lit(p))))
      }: _*).as("sig"))
    // explode into band rows: (doc_id, band, band_hash)
    val bandRows = sig.select(col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(concat_ws(",",
            (0 until rowsPerBand).map(r =>
              element_at(col("sig"), b * rowsPerBand + r + 1)): _*))
            .as("band_hash"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.band_hash"))
    // bucket self-join (guarded against degenerate mega-buckets)
    val sized = bandRows
      .withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy("band", "band_hash")))
      .filter(col("bucket_n") <= 64)
    val a = sized.as("a")
    val b = sized.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 64-bit SimHash from word-feature hashes; near-dup candidates = equal
    * 16-bit chunk (4-banded) verified by Hamming distance <= 6.
    */
  def simhashCandidates(s: SparkSession, docs: DataFrame,
      maxHamming: Int = 6): DataFrame = {
    // materialize the feature hashes ONCE — referencing the expression from
    // all 64 bit columns would recompute split+hash 64x per row
    val hashed = docs.select(col("doc_id"),
      transform(array_distinct(split(col("text"), " ")),
        wd => xxhash64(wd)).as("hashes"))
    // simhash: for each bit, majority vote of feature-hash bits
    val bitCols = (0 until 64).map { bit =>
      val votes = aggregate(col("hashes"), lit(0),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(1) === 1, 1)
          .otherwise(-1))
      when(votes > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }
    val sim = hashed.select(col("doc_id"),
      bitCols.reduce(_ bitwiseOR _).as("simhash"))
    val banded = sim.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("chunk"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.chunk"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Exact n-gram Jaccard over MinHash candidates (verify stage). */
  def ngramJaccard(s: SparkSession, docs: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val cands = minhashCandidates(s, docs)
    val sh = docs.select(col("doc_id"), wordShingles(col("text")).as("sh"))
    cands
      .join(sh.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("sh", "sh_a"), Seq("doc_a"))
      .join(sh.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("sh", "sh_b"), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
