package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`embedding:
  * array<float>`): brute-force cosine top-k baseline and an LSH-bucketed
  * (random hyperplane) scale path.
  *
  * Scale notes: brute-force top-k vs ONE query vector is a broadcast of the
  * query + a narrow map and a single top-k reduce — linear scan, no shuffle
  * of the corpus. The LSH path buckets the corpus once (signature =
  * hyperplane sign bits), so a query probes only its bucket — at 100 TB the
  * bucketed table would be written partitioned by signature so probes are
  * partition-pruned scans.
  */
object Similarity {

  /** dot(a, b) with a higher-order zip_with+aggregate — all codegen. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------- embedding norms (oracle'd)
    QueryDef("q32_embedding_norms",
      (s, d) => T.load(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          round(norm(col("embedding")), 4).as("l2_norm"))
        .orderBy(col("vec_id")),
      Some("""SELECT vec_id, label,
        round(sqrt(list_sum(list_transform(embedding,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
        FROM embeddings ORDER BY vec_id""")),

    // ------------------------------- brute-force cosine top-k vs query 0
    QueryDef("q33_cosine_topk",
      (s, d) => {
        val e = T.load(s, d, "embeddings")
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("q_emb"))
        e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .withColumn("cosine", round(
            dot(col("embedding"), col("q_emb")) /
              (norm(col("embedding")) * norm(col("q_emb"))), 4))
          .select(col("vec_id"), col("label"), col("cosine"))
          .orderBy(col("cosine").desc, col("vec_id"))
          .limit(10)
      },
      Some("""WITH q AS (SELECT embedding AS q_emb FROM embeddings
          WHERE vec_id = 0)
        SELECT vec_id, label, round(
          list_sum(list_transform(list_zip(embedding, q_emb),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
          (sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
           sqrt(list_sum(list_transform(q_emb,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cosine
        FROM embeddings, q WHERE vec_id <> 0
        ORDER BY cosine DESC, vec_id LIMIT 10""")),

    // ----------------------- centroid distance per label (IVF coarse step)
    QueryDef("q34_label_centroid_dist",
      (s, d) => {
        val e = T.load(s, d, "embeddings")
        // mean vector per label via posexplode + exact int index grouping
        val exploded = e.select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        val centroids = exploded.groupBy(col("label"), col("pos"))
          .agg((sum(col("v").cast("double")) / count(lit(1))).as("c"))
        // avg within-label squared distance to centroid, via join on label+pos
        exploded.join(centroids, Seq("label", "pos"))
          .withColumn("d2", (col("v").cast("double") - col("c")) *
            (col("v").cast("double") - col("c")))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_points"),
            round(sum(col("d2")), 2).as("sum_d2"))
          .orderBy(col("label"))
      },
      None), // double-sum accumulation order differs; rows-only

    // -------------------- LSH random-hyperplane bucketing (ANN scale path)
    QueryDef("q35_ann_lsh_buckets",
      (s, d) => lshBuckets(s, T.load(s, d, "embeddings")),
      None),

    // ------------- embedding-cosine near-duplicate pairs (exact, blocked
    // by label — the IVF-style partition key; at 100 TB the blocking key
    // is the coarse quantizer cell, so the pairwise stage stays bounded)
    QueryDef("q40_embedding_neardup",
      (s, d) => {
        val e = T.load(s, d, "embeddings")
        val a = e.select(col("vec_id").as("vec_a"), col("label"),
          col("embedding").as("emb_a"))
        val b = e.select(col("vec_id").as("vec_b"),
          col("label"), col("embedding").as("emb_b"))
        a.join(b, Seq("label"))
          .filter(col("vec_a") < col("vec_b"))
          .withColumn("cosine", round(
            dot(col("emb_a"), col("emb_b")) /
              (norm(col("emb_a")) * norm(col("emb_b"))), 4))
          .filter(col("cosine") >= 0.25)
          .select(col("vec_a"), col("vec_b"), col("label"), col("cosine"))
          .orderBy(col("vec_a"), col("vec_b"))
      },
      Some("""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
          a.label AS label,
          round(
            list_sum(list_transform(list_zip(a.embedding, b.embedding),
              p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
            (sqrt(list_sum(list_transform(a.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             sqrt(list_sum(list_transform(b.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cosine
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE round(
            list_sum(list_transform(list_zip(a.embedding, b.embedding),
              p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
            (sqrt(list_sum(list_transform(a.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             sqrt(list_sum(list_transform(b.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) >= 0.25
        ORDER BY vec_a, vec_b"""))
  )

  /** Deterministic "random" hyperplanes: component h_ij of hyperplane i is
    * a hash-derived value in [-1, 1) from (i, j) — reproducible with no RNG
    * state, computable on both engines if ever needed.
    */
  def lshBuckets(s: SparkSession, e: DataFrame, nPlanes: Int = 8): DataFrame = {
    def comp(plane: Int, j: Column): Column =
      (pmod(xxhash64(lit(plane), j), lit(2000001L)).cast("double") -
        lit(1000000.0)) / lit(1000000.0)
    val sigBits = (0 until nPlanes).map { p =>
      val proj = aggregate(zip_with(
        col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
        (v, j) => v.cast("double") * comp(p, j)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    val sig = e.select(col("vec_id"), col("label"),
      sigBits.reduce(_ bitwiseOR _).as("bucket"))
    sig.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"),
        min(col("vec_id")).as("min_vec"), max(col("vec_id")).as("max_vec"))
      .orderBy(col("bucket"))
  }
}
