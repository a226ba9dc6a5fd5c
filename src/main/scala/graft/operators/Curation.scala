package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the composition layer of a training-data
  * pipeline: deterministic stratified sampling, a quality/length/dup
  * filter pipeline, and near-dup clustering. All are pure Catalyst
  * column expressions over the shared md5 hash primitive, so the DuckDB
  * oracles mirror them bit-for-bit.
  */
object Curation {

  /** Deterministic hash-based stratified sampling: a document is kept iff
    * h64(stratum ':' id) mod 1e6 < rate(stratum) * 1e6. No RNG, no
    * shuffle (a scan-local filter), reproducible across engines/runs —
    * the only sampling shape that is exactly resumable at 10^12 rows.
    */
  def stratifiedSample(docs: DataFrame, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      idCol: String = "doc_id"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    docs
      .withColumn("bucket", pmod(Dedup.h64(
        concat_ws(":", col(strataCol), col(idCol))), lit(1000000L)))
      .filter(col("bucket") < (rate * 1000000.0).cast("long"))
      .select(col(idCol), col(strataCol), col("bucket"))
      .orderBy(idCol)
  }

  /** Training-data filter pipeline: per-doc keep/drop with a reason —
    * duplicate (non-canonical copy of an exact-dup group), too_short /
    * too_long (whitespace tokens), low_quality (TextOps score), in that
    * precedence. One groupBy on md5(text) + scan-local features.
    */
  def filterPipeline(docs: DataFrame, minQuality: Double = 0.3,
      minTokens: Int = 20, maxTokens: Int = 100000,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val q = TextOps.quality(docs, idCol, textCol)
      .select(col(idCol), col("n_tokens"), col("quality_score"))
    val canon = docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("canonical"))
    val withCanon = docs.select(col(idCol), md5(col(textCol)).as("text_hash"))
      .join(canon, "text_hash")
    q.join(withCanon, idCol)
      .withColumn("reason",
        when(col(idCol) =!= col("canonical"), "duplicate")
          .when(col("n_tokens") < minTokens, "too_short")
          .when(col("n_tokens") > maxTokens, "too_long")
          .when(col("quality_score") < minQuality, "low_quality")
          .otherwise(""))
      .select(col(idCol), col("n_tokens"), col("quality_score"),
        col("canonical"), (col("reason") === "").as("keep"), col("reason"))
      .orderBy(idCol)
  }

  /** Near-dup clusters from verified pairs via K rounds of min-label
    * propagation (label = min over self + neighbors each round). K fixed
    * and mirrored in the oracle => deterministic; components with
    * diameter > K don't fully converge — at warehouse scale run rounds
    * to fixpoint (each round is one shuffle; near-dup components are
    * near-cliques, so 2-3 rounds suffice in practice).
    * Output: (doc_id, cluster_rep).
    */
  def dupClusters(pairs: DataFrame, iterations: Int = 3): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
    for (_ <- 1 to iterations) {
      val nbr = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("lbl")).as("nlbl"))
      labels = labels.join(nbr, labels("id") === nbr("src"), "left")
        .select(labels("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
    }
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster_rep"))
      .orderBy("doc_id")
  }
}
