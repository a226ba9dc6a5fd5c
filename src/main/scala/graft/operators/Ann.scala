package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; the correctness oracle).
  * Scale path: LSH-bucketed search — random-hyperplane signatures turn the
  * all-pairs scan into an equi-join on bucket keys, probing only
  * same-bucket candidates (the standard recall/cost dial at 10^12 rows:
  * more tables = higher recall, shorter signatures = bigger buckets).
  */
object Ann {

  /** Exact brute-force top-k neighbors for each query vector.
    * Output: (query_id, rank, neighbor_id, cosine).
    */
  def bruteTopK(emb: DataFrame, queries: DataFrame, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.dot_f64
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("norm", sqrt(dot_f64(col("v"), col("v"))))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qnorm", sqrt(dot_f64(col("qv"), col("qv"))))
    val scored = base.crossJoin(broadcast(q)) // queries are small: broadcast
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        round(dot_f64(col("v"), col("qv")) / (col("norm") * col("qnorm")),
          6).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("id").as("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  /** Random-hyperplane LSH bucketing: `nBits`-bit signature per vector
    * from fixed pseudo-random hyperplanes (deterministic, seeded — no RNG
    * at query time). Output: (id, bucket). Candidates = same-bucket rows.
    */
  def lshBuckets(emb: DataFrame, nBits: Int = 12, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = emb.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    // hyperplane(b, d) = deterministic pseudo-random +-1 component derived
    // from md5(seed, b, d): sign of (hash % 2). Expressed as columns so the
    // whole signature is codegen'd.
    val dims = 64 // embeddings table dimensionality
    val bitCols = (0 until nBits).map { b =>
      val dot = (0 until dims).map { d =>
        val sign = if (((seed * 31 + b) * 131 + d * 17) % 2 == 0) 1.0 else -1.0
        element_at(col("v"), d + 1) * lit(sign)
      }.reduce(_ + _)
      when(dot >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    e.select(col("id"), bitCols.reduce(_ + _).as("bucket"))
  }

  /** IVF (inverted-file) ANN: vectors are assigned to their nearest
    * centroid's list; queries probe the `nProbe` nearest lists only.
    * Centroids here are a deterministic sample of the corpus (train-free
    * IVF-flat); at warehouse scale the assignment join is the same shape
    * with k-means centroids. Output: (query_id, rank, neighbor_id,
    * cosine, centroid_id).
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int = 10,
      nCentroids: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.dot_f64
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("norm", sqrt(dot_f64(col("v"), col("v"))))
    // deterministic centroid sample: first nCentroids ids
    val centroids = e.orderBy("id").limit(nCentroids)
      .select(col("id").as("cid"), col("v").as("cv"),
        col("norm").as("cnorm"))
    def nearest(df: DataFrame, vc: String, nc: String, idc: String, keep: Int) = {
      val scored = df.crossJoin(broadcast(centroids))
        .withColumn("cscore",
          dot_f64(col(vc), col("cv")) / (col(nc) * col("cnorm")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(idc).orderBy(col("cscore").desc, col("cid").asc)
      scored.withColumn("crn", row_number().over(w))
        .filter(col("crn") <= keep)
        .drop("cv", "cnorm", "cscore", "crn")
    }
    val assigned = nearest(e, "v", "norm", "id", 1) // inverted lists
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qnorm", sqrt(dot_f64(col("qv"), col("qv"))))
    val probed = nearest(q, "qv", "qnorm", "qid", nProbe)
    val scored = assigned.join(broadcast(probed), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), col("cid"),
        round(dot_f64(col("v"), col("qv")) / (col("norm") * col("qnorm")),
          6).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("id").as("neighbor_id"), col("cosine"), col("cid").as("centroid_id"))
      .orderBy("query_id", "rank")
  }

  /** ANN via LSH buckets: top-k within each query's bucket (recall < 1,
    * cost ~ bucketSize instead of N). Output like bruteTopK plus bucket.
    */
  def lshTopK(emb: DataFrame, queries: DataFrame, k: Int = 10,
      nBits: Int = 8, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.dot_f64
    val buckets = lshBuckets(emb, nBits, idCol = idCol, vecCol = vecCol)
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(buckets, "id")
      .withColumn("norm", sqrt(dot_f64(col("v"), col("v"))))
    val qb = lshBuckets(queries, nBits, idCol = idCol, vecCol = vecCol)
      .withColumnRenamed("id", "qid").withColumnRenamed("bucket", "qbucket")
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .join(qb, "qid")
      .withColumn("qnorm", sqrt(dot_f64(col("qv"), col("qv"))))
    val scored = base.join(broadcast(q),
        col("bucket") === col("qbucket") && col("id") =!= col("qid"))
      .select(col("qid"), col("id"), col("bucket"),
        round(dot_f64(col("v"), col("qv")) / (col("norm") * col("qnorm")),
          6).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("id").as("neighbor_id"), col("cosine"), col("bucket"))
      .orderBy("query_id", "rank")
  }
}
