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
    * and mirrored in the oracle => deterministic. Components with
    * diameter > K don't fully converge — [[dupClustersFixpoint]] is the
    * warehouse-scale variant.
    * Output: (doc_id, cluster_rep).
    */
  def dupClusters(pairs: DataFrame, iterations: Int = 3): DataFrame =
    propagate(pairs, iterations, toFixpoint = false)

  /** Min-label propagation TO CONVERGENCE (connected components): rounds
    * run until one changes zero labels, bounded by `maxIterations` as a
    * runaway guard (rounds needed = max component diameter; near-dup
    * components are near-cliques, so convergence is fast in practice but
    * NOT guaranteed by any fixed K).
    */
  def dupClustersFixpoint(pairs: DataFrame, maxIterations: Int = 100): DataFrame =
    propagate(pairs, maxIterations, toFixpoint = true)

  /** Iterative core. The classic iterative-Spark failure mode is rebinding
    * `labels = labels.join(...)` with the full upstream pipeline embedded:
    * the logical plan ~doubles per round (labels appears on both sides of
    * each round's join) and `edges` — often a whole minhash-LSH pipeline —
    * is re-analyzed and re-executed inside every round. localCheckpoint
    * materializes edges ONCE and truncates the label lineage each round,
    * so round N's plan is one join + one aggregate regardless of N.
    */
  private def propagate(pairs: DataFrame, maxRounds: Int,
      toFixpoint: Boolean): DataFrame = {
    // Scale-adaptive edge compaction (guide §2.2: derive partitioning from
    // input size, not upstream accident). `edges` is two narrow projections
    // of `pairs` unioned: its partition count is 2x the upstream's whatever
    // the data volume, and union is a narrow op, so AQE's post-shuffle
    // coalescing never sees it — yet EVERY propagation round launches a map
    // stage over every edge partition (the localCheckpoint pins them). At
    // bench scale that was ~30 stages of 64 near-empty tasks per query
    // (r7 stage audit: dedup_clusters 1.8 s of pure task scheduling over a
    // few KB of pairs). Coalesce (no shuffle, order-preserving) to a
    // partition count derived from the plan-time size estimate vs the
    // session's advisory partition size ONLY when the estimate says the
    // table underfills the cluster; a large pairs table is left untouched.
    // Results are partitioning-independent (min-label aggregation + left
    // join; final output re-sorted by doc_id).
    val conf = pairs.sparkSession.sessionState.conf
    val estEdges = pairs.queryExecution.optimizedPlan.stats.sizeInBytes * 2
    val advisory = math.max(1L, conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    val cores = conf.numShufflePartitions
    val edgesRaw = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val edgesSized =
      if (estEdges < BigInt(advisory) * cores)
        edgesRaw.coalesce(math.max(1, ((estEdges + advisory - 1) / advisory).toInt))
      else edgesRaw
    val edges = edgesSized.localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val nbr = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("lbl")).as("nlbl"))
      val joined = labels.withColumnRenamed("lbl", "prev")
        .join(nbr, col("id") === nbr("src"), "left")
        .select(col("id"), col("prev"),
          least(col("prev"), coalesce(col("nlbl"), col("prev"))).as("lbl"))
      // Convergence detection rides the SAME job that materializes the
      // round (labels only ever decrease, so changed==0 <=> fixpoint):
      // an Observation metric on the pre-projection rows costs no extra
      // join, scan or action — exactly one Spark job per round.
      val obs = new org.apache.spark.sql.Observation(s"cc-round-$round")
      val observed =
        if (toFixpoint)
          joined.observe(obs,
            sum(when(col("lbl") =!= col("prev"), 1L).otherwise(0L)).as("changed"))
        else joined
      val next = observed.select(col("id"), col("lbl")).localCheckpoint()
      if (toFixpoint) {
        // sum over zero rows is null -> treat as converged (empty graph)
        val changed = obs.get.get("changed") match {
          case Some(l: java.lang.Long) => l.longValue()
          case Some(l: Long)           => l
          case _                       => 0L
        }
        converged = changed == 0L
      }
      labels.unpersist()
      labels = next
      round += 1
    }
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster_rep"))
      .orderBy("doc_id")
  }
}
