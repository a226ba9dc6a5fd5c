package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines, all
  * expressed as pure Catalyst column expressions (codegen'd, no UDFs) so
  * plans stay whole-stage-codegen and predicate-pushdown friendly — and so
  * the DuckDB oracles can mirror them exactly (shared hash primitive:
  * bigint of the first 15 hex chars of md5).
  *
  * Scale notes: every operator is a hash-partitioned groupBy/join on keys
  * that are uniform by construction (md5-derived), so the shuffles have no
  * planner-visible skew; LSH banding turns the quadratic near-dup search
  * into an equi-join on band keys (the only scalable shape at 10^12 docs —
  * candidate pairs per band bucket, verified exactly afterwards).
  */
object Dedup {

  // shared with the DuckDB oracle SQL (SparkEntry renders the same
  // constants into both sides)
  val P: Long = 2147483647L          // Mersenne prime 2^31-1: a,h < 2^31 so a*h+b < 2^63 (no overflow in either engine)
  val NumHashes = 16
  val Bands = 4                      // 4 bands x 4 rows
  val RowsPerBand: Int = NumHashes / Bands
  val HashA: IndexedSeq[Long] = (0 until NumHashes).map(i => ((2L * i + 1) * 2654435761L) % P)
  val HashB: IndexedSeq[Long] = (0 until NumHashes).map(i => (i.toLong * 40503L + 2531011L) % P)

  /** bigint hash of a string column: first 15 hex chars of md5. */
  def h64(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def tokens(text: Column): Column = split(lower(text), " ")

  /** 3-word shingles (whole text when shorter). */
  def shingles(text: Column): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(1), greatest(size(toks) - 2, lit(1))),
      j => concat_ws(" ", slice(toks, j, lit(3))))
  }

  /** Exact dedup: group identical texts by content hash.
    * Output: (text_hash, n_docs, representative = min doc_id, doc_ids).
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"),
        min(col(idCol)).as("representative"))
      .filter(col("n_docs") > 1)
      .orderBy("text_hash")

  /** Per-doc MinHash signature (NumHashes values). */
  def minhashSignature(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(shingles(col(textCol))).as("sh"))
      .withColumn("h", pmod(h64(col("sh")), lit(P)))
    val aggs = (0 until NumHashes).map { i =>
      min(pmod(lit(HashA(i)) * col("h") + lit(HashB(i)), lit(P))).as(s"m$i")
    }
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH banding + exact-Jaccard verification.
    * Output: (doc_a, doc_b, jaccard) for verified pairs >= threshold.
    */
  def minhashLsh(docs: DataFrame, threshold: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sig = minhashSignature(docs, idCol, textCol)
    // bands via a single explode over one signature subtree (a union of
    // per-band selects would recompute the signature aggregation per band)
    val bandStructs = (0 until Bands).map { b =>
      val cols = (0 until RowsPerBand).map(r => col(s"m${b * RowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat_ws(",", cols: _*)).as("bkey"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    // the self-join's two sides shuffle identically on (band, bkey) =>
    // Spark's ReuseExchange materializes the subtree once
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // exact verification on shingle sets; `cand` is consumed exactly once
    // (a zero-intersection candidate cannot reach any threshold > 0, so no
    // left join back onto cand is needed)
    val shs = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(shingles(col(textCol)))).as("sh"))
    val counts = shs.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(shs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(shs.as("sb"), col("doc_b") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") /
          (col("ca.n") + col("cb.n") - col("inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** 62-bit SimHash per doc (token-frequency weighted bit voting).
    * Output: (doc_id, simhash).
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("t"))
      .filter(col("t") =!= "")
      .withColumn("h", h64(col("t"))) // 60-bit value: bits 0..59 meaningful
    // native TypedImperativeAggregate: one shuffle of 240-byte vote
    // buffers per doc instead of exploding 60 bit rows per token
    tok.groupBy("doc_id")
      .agg(graft.functions.SimHashAgg.simhash_agg(col("h")).as("simhash"))
      .orderBy("doc_id")
  }

  /** Exact n-gram (shingle) Jaccard near-dup pairs over an inverted index
    * (join on shared shingles — never a cross join).
    * Output: (doc_a, doc_b, jaccard >= threshold).
    */
  def ngramJaccard(docs: DataFrame, threshold: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val shs = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(shingles(col(textCol)))).as("sh"))
    val counts = shs.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = shs.as("a").join(shs.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") /
          (col("ca.n") + col("cb.n") - col("inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding-cosine near-dup pairs (double-precision dot products via
    * codegen'd higher-order functions; threshold filter).
    */
  def embedCosine(emb: DataFrame, threshold: Double = 0.4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.dot_f64
    val withNorm = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("norm", sqrt(dot_f64(col("v"), col("v"))))
    val pairs = withNorm.as("a").crossJoin(withNorm.as("b"))
      .filter(col("a.id") < col("b.id"))
    pairs.select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(dot_f64(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")),
          4).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("id_a", "id_b")
  }
}
