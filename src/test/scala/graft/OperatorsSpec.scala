package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Regression tests for the training-pipeline operators (the full
  * cross-engine equality runs in the driver's DuckDB gate; these pin the
  * semantic invariants so refactors can't silently change results).
  */
class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("dedup_exact finds exactly the planted duplicates") {
    spark.sparkContext.setLogLevel("WARN")
    val out = SparkEntry.queries("dedup_exact")(spark, sf).collect()
    assert(out.length == 50)
    assert(out.forall(_.getLong(1) == 2)) // each group has the original + the copy
  }

  test("minhash LSH recall vs exact jaccard at threshold") {
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("dedup_jaccard")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH candidates are verified with exact jaccard, so lsh ⊆ exact;
    // identical duplicates are always found (identical signatures).
    assert(lsh.subsetOf(exact))
    val planted = exact.filter { case (a, b) => b == a + 100000 }
    assert(planted.subsetOf(lsh), "planted exact dups must be found by LSH")
  }

  test("ann_topk rank-1 is the max-cosine neighbor and ranks are dense") {
    val out = SparkEntry.queries("ann_topk")(spark, sf).collect()
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val cosines = sorted.map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ann_lsh results are a subset-quality approximation of brute force") {
    val brute = SparkEntry.queries("ann_topk")(spark, sf)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val lsh = SparkEntry.queries("ann_lsh")(spark, sf).collect()
    // every lsh neighbor must share the query's bucket — structural check:
    // cosine values are genuine (within [-1, 1])
    assert(lsh.forall(r => math.abs(r.getDouble(3)) <= 1.0))
    assert(brute.nonEmpty)
  }

  test("ann_ivf: recall vs brute force is meaningful, mechanics sound") {
    val brute = SparkEntry.queries("ann_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = SparkEntry.queries("ann_ivf")(spark, sf).collect()
    ivf.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ranks = rows.map(_.getInt(1)).sorted
      assert(ranks.toSeq == (1 to ranks.length))
    }
    val ivfSet = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & ivfSet).size.toDouble / brute.size
    assert(recall > 0.15, s"ivf recall $recall") // nProbe=4/16 lists
    info(s"IVF recall@10 = $recall")
  }

  test("simhash_pairs finds all planted exact dups at hamming 0") {
    val out = SparkEntry.queries("dedup_simhash_pairs")(spark, sf).collect()
    val planted = out.filter(r => r.getLong(1) == r.getLong(0) + 100000)
    assert(planted.length == 50, s"got ${planted.length}")
    assert(planted.forall(_.getInt(2) == 0)) // identical text => hamming 0
    assert(out.forall(_.getInt(2) <= 3))     // maxHamming contract
  }

  test("embedCosineGated: recall 1.0 on planted exact dups, subset of exact") {
    import graft.operators.Dedup
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val withDups = emb.select(col("vec_id"), col("embedding"))
      .unionAll(emb.filter(col("vec_id") < 30)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
    val gated = Dedup.embedCosineGated(withDups, 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.embedCosineExact(withDups, 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gated.subsetOf(exact)) // gate never invents pairs
    val planted = (0L until 30L).map(i => (i, i + 100000)).toSet
    assert(planted.subsetOf(gated), "exact copies always share every bucket")
    // no crossJoin in the shipped plan
    val plan = Dedup.embedCosineGated(withDups, 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "gated dedup must not contain a cross join")
  }

  test("ann_lsh recall@10 >= 0.9 vs brute force on clustered vectors") {
    // LSH recall is distance-dependent: it targets genuinely-near
    // neighbors. Synthesize 20 tight clusters (within-cluster cosine
    // ~0.99) where the true top-10 ARE near — the regime the operator is
    // for. (On isotropic noise, top-10 sits at cosine ~0.3 where no
    // honest 16-bit LSH can recall; see PERF.md.)
    import spark.implicits._
    import graft.operators.Ann
    val rng = new java.util.SplittableRandom(99)
    val dims = 64
    val centers = Array.fill(20)(Array.fill(dims)(rng.nextGaussian()))
    val rows = (0 until 400).map { i =>
      val c = centers(i % 20)
      val v = c.map(x => (x + 0.05 * rng.nextGaussian()).toFloat)
      (i.toLong, v.toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 16)
    val brute = Ann.bruteTopK(emb, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Ann.lshTopK(emb, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.9, s"lsh recall@10 = $recall")
    info(s"LSH recall@10 on clustered vectors = $recall")
  }

  test("lshSignatures derives dims from data (no hardcoded 64)") {
    import spark.implicits._
    import graft.operators.Ann
    // 8-dim vectors: a hardcoded dims=64 would null-pad and degrade
    val emb = (0 until 32).map(i =>
      (i.toLong, Seq.fill(8)((i * 31 % 7 - 3).toFloat / 3f))).toDF("vec_id", "embedding")
    val sigs = Ann.lshSignatures(emb, nTables = 2, nBits = 8).collect()
    assert(sigs.length == 64) // 32 vectors x 2 tables
    assert(sigs.forall(r => !r.isNullAt(2)))
  }

  test("stratified sample: deterministic, per-stratum rates roughly honored") {
    val out = SparkEntry.queries("curate_sample")(spark, sf)
    val out2 = SparkEntry.queries("curate_sample")(spark, sf)
    assert(out.collect().toSeq == out2.collect().toSeq) // no RNG anywhere
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en sampled at 0.5: expect a substantial fraction; zh at 0.1: small
    val enFrac = byLang.getOrElse("en", 0L).toDouble / totals("en")
    assert(enFrac > 0.25 && enFrac < 0.75, s"en frac $enFrac")
  }

  test("filter pipeline: duplicates dropped, keep implies empty reason") {
    val out = SparkEntry.queries("curate_filter")(spark, sf).collect()
    val dups = out.filter(_.getAs[String]("reason") == "duplicate")
    assert(dups.length == 50) // the planted copies, never the originals
    assert(dups.forall(r => r.getAs[Long]("doc_id") >= 100000L))
    out.foreach { r =>
      assert(r.getAs[Boolean]("keep") == (r.getAs[String]("reason") == ""))
    }
  }

  test("dup clusters: planted pairs collapse to the original as representative") {
    val out = SparkEntry.queries("dedup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every planted copy clusters to a representative <= its original id
    (0L until 50L).foreach { i =>
      out.get(i + 100000L).foreach { rep => assert(rep <= i, s"copy ${i + 100000} -> $rep") }
    }
    // representative is a cluster member mapping to itself
    out.values.foreach(rep => assert(out.getOrElse(rep, rep) == rep))
  }

  test("dupClustersFixpoint: diameter-5 chain fully converges (fixed K=3 cannot)") {
    import spark.implicits._
    import graft.operators.Curation
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    // the K=3 limitation is real: the chain's far end has not reached 1
    val fixed = Curation.dupClusters(pairs, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed(6L) != 1L, "if K=3 converges on a diameter-5 chain the test graph is wrong")
    // the fixpoint mode converges for any diameter — and the convergence
    // check rides each round's own materialization job (Observation
    // metric), costing ZERO extra Spark jobs vs the probe-free fixed-K
    // variant at the same round count (AQE splits queries into several
    // jobs, so the comparison — not an absolute count — is the evidence)
    def countJobs(run: () => Unit): Int = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        run()
        var last = -1 // listener events are async: wait for stability
        var spins = 0
        while (jobs.get() != last && spins < 50) {
          last = jobs.get()
          Thread.sleep(100)
          spins += 1
        }
        jobs.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    // diameter-5 chain converges in 5 rounds + 1 confirming round = 6
    val baseJobs = countJobs(() => { Curation.dupClusters(pairs, 6); () })
    var fpDf: org.apache.spark.sql.DataFrame = null
    val fpJobs = countJobs(() => { fpDf = Curation.dupClustersFixpoint(pairs) })
    assert(fpJobs <= baseJobs,
      s"fixpoint ran $fpJobs jobs vs $baseJobs probe-free — convergence probe regressed?")
    val fp = fpDf.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 6L).foreach(i => assert(fp(i) == 1L, s"node $i -> ${fp(i)}"))
    // and agrees with the K=3 variant on a clique (diameter 1)
    val clique = Seq((10L, 11L), (10L, 12L), (11L, 12L)).toDF("doc_a", "doc_b")
    val a = Curation.dupClusters(clique, 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Curation.dupClustersFixpoint(clique).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("text_quality fields are consistent") {
    val out = SparkEntry.queries("text_quality")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Number]("n_chars").longValue() > 0)
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1) // punct_ratio
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1) // quality_score
    }
  }

  test("multimodal image features: real EXIF decode over corpus media") {
    val feats = SparkEntry.queries("x_media_features")(spark, sf).cache()
    val jpeg = feats.filter(col("content_type") === "image/jpeg")
    assert(jpeg.count() > 0)
    assert(jpeg.filter(col("width") <= 0 || !col("decode_ok")).count() == 0)
    // feature vectors have the declared shape (the query serializes the
    // array<float> with to_json for driver canonicalization)
    assert(feats.filter(size(from_json(col("feature"),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))) =!= 8).count() == 0)
  }

  test("entry() flagship returns the content-type tally") {
    val e = SparkEntry.entry(spark)
    assert(e.count() > 0)
  }
}
