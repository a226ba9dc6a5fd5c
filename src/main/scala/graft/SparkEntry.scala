package graft

import java.io.File
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.Gen
import graft.operators.{Ann, Curation, Dedup, Multimodal, TextOps}
import graft.spark.{IcebergLite, Pipeline, Runner}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query groups:
  *  - x_*: the extraction engine itself over the deterministic interleaved
  *    corpus (BASELINE.json input_hint shape). Not SQL-expressible (the
  *    kernels are the operator), so no oracleSql — their correctness gate
  *    is the ScalaTest span-equality suite vs generator goldens.
  *  - q*: relational coverage over the TPC-H-ish tables (DuckDB oracles).
  *  - dedup_* / ann_* / text_*: training-data pipeline operators over
  *    documents/embeddings (DuckDB oracles wherever the logic is
  *    SQL-expressible; hash primitives are md5-based so both engines
  *    compute identical values).
  */
object SparkEntry {

  val DataRoot = "/root/repo/data"

  private def nDocsFor(sfName: String): Long = sfName match {
    case "sf0.001" => 500L
    case "sf0.01"  => 5000L
    case "sf0.1"   => 50000L
    case _         => 1000L
  }

  /** Generate (once) and extract (once) the interleaved corpus for an sf
    * dir; returns the extracted table. Cached on disk — deterministic, so
    * rows-only checks are stable across runs.
    */
  def ensureExtracted(spark: SparkSession, sfDir: String): DataFrame = {
    val name = new File(sfDir).getName
    val corpusDir = s"$DataRoot/corpus/$name"
    val outDir = s"$DataRoot/out/$name"
    Gen.writeCorpus(spark, corpusDir, nDocsFor(name))
    if (IcebergLite.currentSnapshot(Runner.extractedDir(outDir)) < 0) {
      Runner.run(spark, Gen.readDocs(spark, corpusDir),
        Gen.readMedia(spark, corpusDir), outDir, runId = s"verify-$name")
    }
    IcebergLite.readAll(spark, Runner.extractedDir(outDir)).get
  }

  def corpusMedia(spark: SparkSession, sfDir: String): DataFrame = {
    val name = new File(sfDir).getName
    Gen.writeCorpus(spark, s"$DataRoot/corpus/$name", nDocsFor(name))
    Gen.readMedia(spark, s"$DataRoot/corpus/$name")
  }

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** documents with synthetic duplicates planted (doc_id < 50 duplicated
    * with shifted ids) so dedup operators have real work.
    */
  private def docsWithDups(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    d.select(col("doc_id"), col("text"))
      .unionAll(d.filter(col("doc_id") < 50)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }

  /** embeddings with synthetic near-dup structure planted (vec_id < 30
    * duplicated with shifted ids) so bucketed embedding-dedup/ANN have
    * true near neighbors to find (the natural table is ~isotropic noise).
    */
  private def embWithDups(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    e.select(col("vec_id"), col("embedding"))
      .unionAll(e.filter(col("vec_id") < 30)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val ext = ensureExtracted(spark, "/root/testdata/sf0.001")
    ext.groupBy("content_type").count().orderBy("content_type")
  }

  // ------------------------------------------------------------- queries
  /** Every query builder first applies the one-time session tuning
    * (Par.tune: parallelism-first AQE coalescing for this CPU-heavy-per-
    * byte workload; no-op at scale and on already-tuned sessions).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rawQueries.map { case (name, f) =>
      name -> ((s: SparkSession, dir: String) => {
        graft.operators.Par.tune(s); f(s, dir)
      })
    }

  private def rawQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- extraction engine (rows-only gate; ScalaTest carries equality)
    "x_extract" -> ((s, dir) => {
      ensureExtracted(s, dir)
        .select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "span")))
        .select(col("doc_id"), col("span.offset").as("offset"),
          col("span.kind").as("kind"), col("span.text").as("text"),
          col("span.media_ref").as("media_ref"))
        .orderBy("doc_id", "offset")
    }),
    "x_tally" -> ((s, dir) =>
      // the reference README's flagship content-type tally (README.md:237-266)
      ensureExtracted(s, dir).groupBy("content_type")
        .agg(count(lit(1)).as("n")).orderBy("content_type")),
    "x_langs" -> ((s, dir) =>
      ensureExtracted(s, dir).groupBy("language")
        .agg(count(lit(1)).as("n")).orderBy("language")),
    "x_issues" -> ((s, dir) =>
      ensureExtracted(s, dir).filter(col("issue_type") =!= "")
        .groupBy("issue_type").agg(count(lit(1)).as("n")).orderBy("issue_type")),
    "x_words_top5" -> ((s, dir) => {
      // the reference README's word-count query (README.md:271-287)
      val ext = ensureExtracted(s, dir)
      ext.select(explode(col("spans")).as("span"))
        .filter(col("span.kind") === "text")
        .select(explode(split(lower(col("span.text")), "\\s+")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w").asc).limit(5)
    }),
    "x_meta_keys" -> ((s, dir) =>
      ensureExtracted(s, dir)
        .select(explode(col("metadata")).as("m"))
        .groupBy(col("m.key").as("key")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("key").asc).limit(20)),
    "x_project" -> ((s, dir) => {
      // the reference CLI's result_hash projection {source, metadata, text}
      // (lib/rika/cli/rika_command.rb:141-147) + input-type classification
      // (lib/rika/parser.rb:59-71: CASE WHEN on "://")
      val ext = ensureExtracted(s, dir)
      // metadata serialized with to_json: the driver's pandas
      // canonicalization cannot sort array<struct> columns (r1 x_project
      // err: "unhashable type: numpy.ndarray")
      ext.select(
          col("doc_id").as("source"),
          when(col("doc_id").contains("://"), "http").otherwise("file").as("input_type"),
          to_json(col("metadata")).as("metadata"),
          concat_ws("\n\n", filter(col("spans"),
            sp => sp.getField("kind") === "text").getField("text")).as("text"))
        .orderBy("source")
    }),
    "x_meta_lookup" -> ((s, dir) => {
      // metadata key lookup, null-safe (spec/rika/parser_spec.rb:195-197);
      // ordered-array metadata -> filter + element_at
      val ext = ensureExtracted(s, dir)
      def meta(k: String) = try_element_at(
        filter(col("metadata"), m => m.getField("key") === k), lit(1)).getField("value")
      ext.filter(col("content_type") === "application/pdf")
        .select(col("doc_id"), meta("dc:title").as("title"),
          meta("pdf:producer").as("producer"),
          meta("nonexistent:key").as("absent"))
        .orderBy("doc_id")
    }),
    "x_truncate64" -> ((s, dir) => {
      // E8 truncation as a pipeline option (computation pruning analog of
      // lib/rika/cli/rika_command.rb:233-237); prefix invariant asserted in
      // ScalaTest, here the operator runs at maxContentLength=64
      val name = new File(dir).getName
      val corpusDir = s"$DataRoot/corpus/$name"
      graft.corpus.Gen.writeCorpus(s, corpusDir, nDocsFor(name))
      val docs = graft.corpus.Gen.readDocs(s, corpusDir).limit(300)
      val media = graft.corpus.Gen.readMedia(s, corpusDir)
      Pipeline.extract(s, docs, media, Pipeline.Config(maxContentLength = 64))
        .toDF()
        .select(col("doc_id"),
          aggregate(transform(col("spans"),
            sp => coalesce(length(sp.getField("text")), lit(0))),
            lit(0), (acc, x) => acc + x).as("total_text_len"),
          size(col("spans")).as("n_spans"))
        .orderBy("doc_id")
    }),
    "x_sniff_tally" -> ((s, dir) => {
      // native codegen Expressions (no UDF): magic-byte MIME + charset
      val m = corpusMedia(s, dir)
      m.select(graft.functions.sniff_mime(unbase64(col("bytes_b64"))).as("mime"))
        .groupBy("mime").agg(count(lit(1)).as("n")).orderBy("mime")
    }),
    "x_media_features" -> ((s, dir) =>
      // feature is array<float>: serialize for driver canonicalization.
      // Shared one-decode analysis table (Multimodal.imageAnalysisCached):
      // the two image-dedup queries reuse the same pixel-decode pass.
      Multimodal.imageAnalysisCached(s, corpusMedia(s, dir), dir)
        .select(col("media_ref"), col("content_type"), col("width"),
          col("height"), col("exif_software"), col("feature"),
          col("pixel_decode"), col("decode_ok"))
        .withColumn("feature", to_json(col("feature")))
        .orderBy("media_ref")),
    "x_frames" -> ((s, dir) =>
      Multimodal.frameSample(s, corpusMedia(s, dir))
        .orderBy("media_ref", "frame_idx")),
    "x_image_dups" -> ((s, dir) =>
      // content-level near-dup images: real pixel decode -> aHash ->
      // banded Hamming join; catches the corpus's planted re-encodes
      // (same plane, different PNG filters) that byte dedup misses
      graft.operators.ImageOps.dupImages(s, corpusMedia(s, dir),
        cacheKey = Some(dir))),
    "x_image_dups_xcodec" -> ((s, dir) =>
      // perceptual (DCT pHash) near-dups: pairs the corpus's planted
      // smooth planes stored as lossless PNG in one doc and lossy JPEG
      // q90 in another — content-level dedup across codecs
      graft.operators.ImageOps.dupImages(s, corpusMedia(s, dir),
        maxHamming = 12, blocks = 8, perceptual = true,
        cacheKey = Some(dir))),
    "x_audio_features" -> ((s, dir) =>
      // real PCM decode (kernel/PixelDecode.WavDecoder): round floats so
      // driver canonicalization is platform-stable
      Multimodal.audioFeatures(s, corpusMedia(s, dir)).toDF()
        .filter(col("decode_ok"))
        .select(col("media_ref"), col("sample_rate"), col("channels"),
          col("n_samples"), round(col("duration_s"), 3).as("duration_s"),
          round(col("rms"), 4).as("rms"),
          round(col("zero_cross_rate"), 4).as("zero_cross_rate"))
        .orderBy("media_ref")),

    // ---- relational coverage (oracled)
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),
    "q2_join_top" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy("c_mktsegment")
    }),
    "q3_window" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("value").desc, col("event_id").asc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("event_type"), col("rn"), col("event_id"),
          round(col("value"), 6).as("value"))
        .orderBy("event_type", "rn")
    }),
    "q4_events_hourly" -> ((s, dir) =>
      // string hour buckets: identical wall-clock formatting in both
      // engines, independent of epoch/timezone semantics
      t(s, dir, "events")
        .groupBy(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH").as("hour_bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy("event_type", "hour_bucket")),

    "q5_setops" -> ((s, dir) => {
      // INTERSECT + EXCEPT over customer/orders key sets
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.select(col("c_custkey").as("k"))
        .intersect(o.select(col("o_custkey").as("k")))
        .except(c.filter(col("c_acctbal") < 0).select(col("c_custkey").as("k")))
        .orderBy("k")
    }),
    "q6_rollup" -> ((s, dir) =>
      // grouping-sets coverage; NULL grouping levels coalesced to 'ALL'
      // so cross-engine sort order is unambiguous
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")),
    "q10_cube" -> ((s, dir) =>
      // full CUBE grouping-set lattice (rollup's sibling); NULL levels
      // coalesced to 'ALL' so cross-engine sort order is unambiguous
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("sum_price"),
          round(avg(col("o_totalprice")), 4).as("avg_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pr"),
          col("n"), col("sum_price"), col("avg_price"))
        .orderBy("st", "pr")),
    "q11_grouping_sets" -> ((s, dir) =>
      // explicit GROUPING SETS lattice — the general form rollup/cube
      // specialize; disjoint marginals in one aggregation pass
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).cast("long").as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")),
    "q12_moving" -> ((s, dir) => {
      // sliding-frame window (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW):
      // per-user 3-event moving sum. Values pre-scaled to BIGINT so the
      // frame arithmetic is integer-exact across engines.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(-2, 0)
      t(s, dir, "events")
        .filter(col("user_id") < 15)
        .select(col("user_id"), col("event_id"), col("ts"),
          floor(col("value") * 1000).cast("long").as("v"))
        .withColumn("mov3", sum(col("v")).over(w))
        .select(col("user_id"), col("event_id"), col("mov3"))
        .orderBy("user_id", "event_id")
    }),
    "q15_ranks" -> ((s, dir) => {
      // ranking-function breadth: dense_rank / ntile / percent_rank over
      // one window partition (unique-key tiebreak keeps order total)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      t(s, dir, "part")
        .filter(col("p_size") < 15)
        .select(col("p_brand"), col("p_partkey"),
          dense_rank().over(w).cast("long").as("dr"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pr"))
        .orderBy("p_brand", "p_partkey")
    }),
    "q14_percentile" -> ((s, dir) =>
      // exact interpolated percentiles (sort-based agg) + min/max —
      // both engines use the p*(n-1) linear-interpolation definition
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("rf"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
          round(min(col("l_extendedprice")), 2).as("lo"),
          round(max(col("l_extendedprice")), 2).as("hi"))
        .orderBy("rf")),
    "q13_pivot" -> ((s, dir) =>
      // pivot: one output column per l_linestatus value (conditional
      // aggregation under the hood — a single shuffle, no joins)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("rf"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("rf"), col("F").as("f_n"), col("O").as("o_n"))
        .orderBy("rf")),
    "q7_sessions" -> ((s, dir) => {
      // sessionization: per-user sessions split at >30min gaps
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))).as("duration_s"))
        .orderBy("user_id", "session_id")
    }),

    "q8_anti_semi" -> ((s, dir) => {
      // semi/anti-join coverage: every customer labeled by order presence
      // (left_semi and left_anti are first-class Spark join types; the
      // oracle mirrors them with EXISTS / NOT EXISTS)
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val has = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("has_orders").as("status"))
      val non = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("no_orders").as("status"))
      has.unionAll(non).orderBy("c_custkey")
    }),
    "q9_brand_volume" -> ((s, dir) => {
      // broadcast dim join + HAVING: per-brand shipped volume with
      // supplier breadth, small side broadcast explicitly
      val li = t(s, dir, "lineitem"); val p = t(s, dir, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"),
          countDistinct(col("l_suppkey")).as("n_suppliers"),
          round(sum(col("l_extendedprice")), 2).as("total_price"))
        .filter(col("total_qty") > 100)
        .orderBy("p_brand")
    }),

    // ---- dedup suite (oracled)
    "dedup_exact" -> ((s, dir) => Dedup.exact(docsWithDups(s, dir))),
    // the verified pairs are shared with the two cluster queries below
    // through a keyed one-slot persist (compute once, reuse twice)
    "dedup_minhash_lsh" -> ((s, dir) => Dedup.minhashLshCached(docsWithDups(s, dir), 0.5, dir)),
    "dedup_simhash" -> ((s, dir) => Dedup.simhash(t(s, dir, "documents"))),
    "dedup_simhash_pairs" -> ((s, dir) => Dedup.simhashPairs(docsWithDups(s, dir))),
    "dedup_jaccard" -> ((s, dir) => Dedup.ngramJaccard(docsWithDups(s, dir), 0.5)),
    // shipped path: LSH-gated (no crossJoin in the plan); the all-pairs
    // exact version is kept as its own oracled query
    "dedup_embed_cosine" -> ((s, dir) => Dedup.embedCosineGated(embWithDups(s, dir), 0.4)),
    "dedup_embed_exact" -> ((s, dir) => Dedup.embedCosineExact(t(s, dir, "embeddings"), 0.4)),

    // ---- similarity search (all oracled: brute force exactly, the
    // bucketed variants via deterministic-gate mirroring in DuckDB)
    "ann_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Ann.bruteTopK(e, e.filter(col("vec_id") < 16), k = 10)
    }),
    "ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Ann.ivfTopK(e, e.filter(col("vec_id") < 16), k = 10)
    }),
    "ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Ann.lshTopK(embWithDups(s, dir), e.filter(col("vec_id") < 16), k = 10)
    }),

    // ---- corpus curation (oracled)
    "curate_sample" -> ((s, dir) =>
      Curation.stratifiedSample(t(s, dir, "documents"), "lang",
        Map("en" -> 0.5, "de" -> 0.25, "zh" -> 0.1), defaultRate = 0.05)),
    "curate_filter" -> ((s, dir) =>
      Curation.filterPipeline(docsWithDups(s, dir))),
    "dedup_clusters" -> ((s, dir) =>
      Curation.dupClusters(Dedup.minhashLshCached(docsWithDups(s, dir), 0.5, dir))),
    // fixpoint mode (connected components): converges for ANY diameter;
    // oracled via a DuckDB recursive-CTE transitive closure
    "dedup_clusters_fix" -> ((s, dir) =>
      Curation.dupClustersFixpoint(Dedup.minhashLshCached(docsWithDups(s, dir), 0.5, dir))),

    // ---- text analysis (oracled except langid)
    "text_quality" -> ((s, dir) => TextOps.quality(t(s, dir, "documents"))),
    "text_tokens" -> ((s, dir) => TextOps.tokenCounts(t(s, dir, "documents"))),
    "text_fingerprint" -> ((s, dir) => TextOps.fingerprint(t(s, dir, "documents"))),
    "text_langid" -> ((s, dir) => TextOps.langId(s, t(s, dir, "documents")))
  )

  // ----------------------------------------------------------- oracles
  import Dedup.{Bands, HashA, HashB, NumHashes, P, RowsPerBand}

  private val h64 = "CAST(('0x' || substr(md5(%s),1,15)) AS BIGINT)"
  private def H(e: String) = h64.format(e)

  private val shingles3 =
    """toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM docs),
      |idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-2, 1))) AS j FROM toks),
      |sh AS (SELECT doc_id, array_to_string(t[j:j+2], ' ') AS sh FROM idx)""".stripMargin

  /** Double-precision cosine in DuckDB matching Spark's sequential fold
    * bit-for-bit (verified empirically: list_sum/list_transform fold left
    * like Catalyst's aggregate()).
    */
  private def cosSql(a: String, b: String): String =
    s"""(list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |   * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))""".stripMargin

  private val dupDocs =
    """docs AS (SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50)""".stripMargin

  private val dupEmb =
    """emb AS (SELECT vec_id, embedding FROM embeddings
      |UNION ALL SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 30)""".stripMargin

  /** The deterministic hyperplane sign matrix (Ann.hyperSign) as a DuckDB
    * VALUES table (tbl, bit, sv DOUBLE[]) — renders the exact same ±1
    * vectors the Spark expressions use, so LSH signatures are bit-equal
    * cross-engine.
    */
  private def signsCte(nTables: Int = 8, nBits: Int = 16, dims: Int = 64,
      seed: Long = 42L): String = {
    val rows = (0 until nTables).flatMap { tb =>
      (0 until nBits).map { b =>
        val lst = Ann.signRow(seed, tb, b, dims)
          .map(s => if (s > 0) "1" else "-1").mkString(",")
        s"($tb,$b,[$lst]::DOUBLE[])"
      }
    }.mkString(", ")
    s"signs AS (SELECT * FROM (VALUES $rows) s(tbl, bit, sv))"
  }

  /** LSH signature CTE over a relation e(id, v): sig(id, tbl, sig).
    * Mirrors Ann.lshSignatures (dot >= 0 per bit, bits OR'd into a long).
    */
  private def lshSigCte: String =
    """bits AS (SELECT e.id, s.tbl, s.bit,
      |  CASE WHEN list_sum(list_transform(list_zip(e.v, s.sv), x -> CAST(x[1] AS DOUBLE) * x[2])) >= 0
      |    THEN (CAST(1 AS BIGINT) << s.bit) ELSE 0 END AS bv
      |  FROM e, signs s),
      |sig AS (SELECT id, tbl, CAST(sum(bv) AS BIGINT) AS sig FROM bits GROUP BY 1, 2)""".stripMargin

  private def minhashLshSql: String = {
    val ms = (0 until NumHashes)
      .map(i => s"min((${HashA(i)} * h + ${HashB(i)}) % $P) AS m$i").mkString(", ")
    val bands = (0 until Bands).map { b =>
      val cols = (0 until RowsPerBand).map(r => s"m${b * RowsPerBand + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', $cols)) AS bkey FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH $dupDocs, $shingles3,
       |h AS (SELECT doc_id, ${H("sh")} % $P AS h FROM sh),
       |sig AS (SELECT doc_id, $ms FROM h GROUP BY doc_id),
       |bands AS ($bands),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey
       |   AND x.doc_id < y.doc_id),
       |shd AS (SELECT DISTINCT doc_id, sh FROM sh),
       |cnt AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
       |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i FROM cand c
       |  JOIN shd sa ON sa.doc_id = c.doc_a
       |  JOIN shd sb ON sb.doc_id = c.doc_b AND sa.sh = sb.sh GROUP BY 1, 2)
       |SELECT c.doc_a AS doc_a, c.doc_b AS doc_b,
       |  round(CAST(coalesce(i.i,0) AS DOUBLE) / (ca.n + cb.n - coalesce(i.i,0)), 6) AS jaccard
       |FROM cand c LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
       |JOIN cnt ca ON ca.doc_id = c.doc_a JOIN cnt cb ON cb.doc_id = c.doc_b
       |WHERE round(CAST(coalesce(i.i,0) AS DOUBLE) / (ca.n + cb.n - coalesce(i.i,0)), 6) >= 0.5
       |ORDER BY c.doc_a, c.doc_b""".stripMargin
  }

  /** df cap mirrored from Dedup.ngramJaccard (default dfCap = 1024). */
  private def jaccardSql: String =
    s"""WITH $dupDocs, $shingles3,
       |shd0 AS (SELECT DISTINCT doc_id, sh FROM sh),
       |rare AS (SELECT sh FROM shd0 GROUP BY sh HAVING count(*) <= 1024),
       |shd AS (SELECT shd0.doc_id, shd0.sh FROM shd0 JOIN rare USING (sh)),
       |cnt AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM shd a JOIN shd b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) AS jaccard
       |FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
       |WHERE round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** SimHash signature CTEs over a docs relation: sim(doc_id, simhash). */
  private def simhashCte(rel: String): String =
    s"""tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM $rel),
       |h AS (SELECT doc_id, ${H("t")} AS h FROM tok WHERE t <> ''),
       |bits AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM h, generate_series(0, 59) s(b) GROUP BY 1, 2),
       |sim AS (SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id)""".stripMargin

  private def simhashSql: String =
    s"""WITH ${simhashCte("documents")}
       |SELECT doc_id, simhash FROM sim ORDER BY doc_id""".stripMargin

  /** Bit-block banding mirror of Dedup.simhashPairs (4 blocks x 15 bits,
    * Hamming <= 3).
    */
  private def simhashPairsSql: String =
    s"""WITH $dupDocs, ${simhashCte("docs")},
       |blk AS (SELECT doc_id, simhash, g.b AS bi, (simhash >> (g.b * 15)) & 32767 AS bv
       |  FROM sim, generate_series(0, 3) g(b)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.simhash AS sa, b.simhash AS sb
       |  FROM blk a JOIN blk b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Mirror of Dedup.embedCosineGated over the planted-dup embeddings. */
  private def embedGatedSql: String =
    s"""WITH $dupEmb,
       |e AS (SELECT vec_id AS id, embedding AS v FROM emb),
       |${signsCte()},
       |$lshSigCte,
       |cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
       |  FROM sig x JOIN sig y ON x.tbl = y.tbl AND x.sig = y.sig AND x.id < y.id)
       |SELECT id_a, id_b, round(${cosSql("a.v", "b.v")}, 4) AS cosine
       |FROM cand JOIN e a ON a.id = id_a JOIN e b ON b.id = id_b
       |WHERE round(${cosSql("a.v", "b.v")}, 4) >= 0.4
       |ORDER BY id_a, id_b""".stripMargin

  /** Mirror of Ann.lshTopK (8 tables x 16 bits, 1-bit multiprobe) over the
    * planted-dup corpus with queries vec_id < 16.
    */
  private def annLshSql: String =
    s"""WITH $dupEmb,
       |e AS (SELECT vec_id AS id, embedding AS v FROM emb),
       |${signsCte()},
       |$lshSigCte,
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 16),
       |qsig AS (SELECT id AS qid, tbl, sig FROM sig WHERE id < 16),
       |probes AS (SELECT qid, tbl, sig AS p FROM qsig
       |  UNION ALL SELECT qid, tbl, xor(sig, CAST(1 AS BIGINT) << g.b) AS p
       |    FROM qsig, generate_series(0, 15) g(b)),
       |cand AS (SELECT DISTINCT p.qid, s.id FROM probes p
       |  JOIN sig s ON s.tbl = p.tbl AND s.sig = p.p AND s.id <> p.qid),
       |scored AS (SELECT c.qid, c.id, round(${cosSql("e.v", "q.qv")}, 6) AS cosine
       |  FROM cand c JOIN e ON e.id = c.id JOIN q ON q.qid = c.qid),
       |r AS (SELECT qid, id, cosine,
       |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, id ASC) AS rank
       |  FROM scored)
       |SELECT qid AS query_id, CAST(rank AS INTEGER) AS rank, id AS neighbor_id, cosine
       |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Mirror of Ann.ivfTopK: centroids = first 16 ids, nProbe = 4. */
  private def annIvfSql: String =
    s"""WITH e AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings ORDER BY vec_id LIMIT 16),
       |asgs AS (SELECT e.id, c.cid, ${cosSql("e.v", "c.cv")} AS cs FROM e CROSS JOIN cent c),
       |asg AS (SELECT id, cid FROM (SELECT id, cid,
       |    row_number() OVER (PARTITION BY id ORDER BY cs DESC, cid ASC) AS rn FROM asgs)
       |  WHERE rn = 1),
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 16),
       |ps AS (SELECT q.qid, c.cid, ${cosSql("q.qv", "c.cv")} AS cs FROM q CROSS JOIN cent c),
       |probe AS (SELECT qid, cid FROM (SELECT qid, cid,
       |    row_number() OVER (PARTITION BY qid ORDER BY cs DESC, cid ASC) AS rn FROM ps)
       |  WHERE rn <= 4),
       |scored AS (SELECT p.qid, a.id, a.cid, round(${cosSql("e.v", "q.qv")}, 6) AS cosine
       |  FROM probe p JOIN asg a ON a.cid = p.cid
       |  JOIN e ON e.id = a.id JOIN q ON q.qid = p.qid
       |  WHERE a.id <> p.qid),
       |r AS (SELECT qid, id, cid, cosine,
       |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, id ASC) AS rank
       |  FROM scored)
       |SELECT qid AS query_id, CAST(rank AS INTEGER) AS rank, id AS neighbor_id,
       |  cosine, cid AS centroid_id
       |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** text_quality's feature pipeline over a docs relation -> q(doc_id,
    * n_chars, n_tokens, punct_ratio, stopword_ratio, mean_token_len,
    * quality_score) — mirrors TextOps.quality exactly (shared by
    * text_quality and curate_filter).
    */
  private def qualityCte(rel: String): String =
    s"""qbase AS (SELECT doc_id, text, string_split(lower(text), ' ') AS t FROM $rel),
       |qfeat AS (SELECT doc_id,
       |  length(text) AS n_chars, len(t) AS n_tokens,
       |  round(CAST(len(list_filter(t, x -> regexp_full_match(x, '[.,;:!?]+'))) AS DOUBLE)
       |    / greatest(len(t), 1), 4) AS punct_ratio,
       |  round(CAST(len(list_filter(t, x -> x IN ('the','a','and','of','to','in','is','it','that','for'))) AS DOUBLE)
       |    / greatest(len(t), 1), 4) AS stopword_ratio,
       |  round(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
       |    / greatest(len(t), 1), 4) AS mean_token_len
       |FROM qbase),
       |q AS (SELECT doc_id, n_chars, n_tokens, punct_ratio, stopword_ratio, mean_token_len,
       |  round(least(1.0, n_tokens / 100.0) * (1.0 - punct_ratio)
       |    * least(1.0, stopword_ratio * 5.0 + 0.5), 4) AS quality_score
       |FROM qfeat)""".stripMargin

  /** 3 unrolled min-label-propagation rounds over the minhash-LSH pairs —
    * mirrors Curation.dupClusters(iterations = 3).
    */
  private def dupClustersSql: String = {
    def round(prev: String, out: String): String =
      s"""$out AS (SELECT l.id, least(l.lbl, coalesce(m.nlbl, l.lbl)) AS lbl
         |  FROM $prev l LEFT JOIN (
         |    SELECT e.src, min(x.lbl) AS nlbl FROM edges e
         |    JOIN $prev x ON x.id = e.dst GROUP BY e.src) m ON m.src = l.id)""".stripMargin
    s"""WITH pr AS (SELECT * FROM ($minhashLshSql)),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pr
       |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pr),
       |lab0 AS (SELECT DISTINCT src AS id, src AS lbl FROM edges),
       |${round("lab0", "lab1")},
       |${round("lab1", "lab2")},
       |${round("lab2", "lab3")}
       |SELECT id AS doc_id, lbl AS cluster_rep FROM lab3 ORDER BY doc_id""".stripMargin
  }

  /** Connected components as a DuckDB recursive transitive closure: the
    * label a node converges to under min-label propagation is exactly
    * min(reachable ids) — engine-independent, no round-count mirroring.
    */
  private def dupClustersFixSql: String =
    s"""WITH RECURSIVE pr AS (SELECT * FROM ($minhashLshSql)),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pr
       |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pr),
       |reach(id, r) AS (
       |  SELECT DISTINCT src AS id, src AS r FROM edges
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst)
       |SELECT id AS doc_id, min(r) AS cluster_rep FROM reach
       |GROUP BY id ORDER BY doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join_top" ->
      """SELECT c_mktsegment,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q3_window" ->
      """SELECT event_type, rn, event_id, round(value, 6) AS value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
        |  FROM events) WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin,
    "q4_events_hourly" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d %H') AS hour_bucket,
        |  count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, hour_bucket""".stripMargin,
    "q5_setops" ->
      """SELECT c_custkey AS k FROM customer
        |INTERSECT SELECT o_custkey AS k FROM orders
        |EXCEPT SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
        |ORDER BY k""".stripMargin,
    "q6_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q10_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
        |  coalesce(o_orderpriority, 'ALL') AS pr,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS sum_price,
        |  round(avg(o_totalprice), 4) AS avg_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY st, pr""".stripMargin,
    "q11_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin,
    "q12_moving" ->
      """WITH base AS (
        |  SELECT user_id, event_id, ts, CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events WHERE user_id < 15)
        |SELECT user_id, event_id,
        |  CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov3
        |FROM base ORDER BY user_id, event_id""".stripMargin,
    "q13_pivot" ->
      """SELECT l_returnflag AS rf,
        |  count(*) FILTER (WHERE l_linestatus = 'F') AS f_n,
        |  count(*) FILTER (WHERE l_linestatus = 'O') AS o_n
        |FROM lineitem GROUP BY l_returnflag ORDER BY rf""".stripMargin,
    "q15_ranks" ->
      """SELECT p_brand, p_partkey,
        |  CAST(dense_rank() OVER w AS BIGINT) AS dr,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr
        |FROM part WHERE p_size < 15
        |WINDOW w AS (PARTITION BY p_brand
        |  ORDER BY p_retailprice DESC, p_partkey ASC)
        |ORDER BY p_brand, p_partkey""".stripMargin,
    "q14_percentile" ->
      """SELECT l_returnflag AS rf,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  round(min(l_extendedprice), 2) AS lo,
        |  round(max(l_extendedprice), 2) AS hi
        |FROM lineitem GROUP BY l_returnflag ORDER BY rf""".stripMargin,
    "q7_sessions" ->
      """WITH base AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL
        |      OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM base),
        |sess AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_s
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q8_anti_semi" ->
      """SELECT c_custkey, 'has_orders' AS status FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |UNION ALL
        |SELECT c_custkey, 'no_orders' AS status FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q9_brand_volume" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
        |  count(DISTINCT l_suppkey) AS n_suppliers,
        |  round(sum(l_extendedprice), 2) AS total_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand HAVING total_qty > 100
        |ORDER BY p_brand""".stripMargin,
    "dedup_exact" ->
      s"""WITH $dupDocs
         |SELECT md5(text) AS text_hash, count(*) AS n_docs,
         |  min(doc_id) AS representative
         |FROM docs GROUP BY md5(text) HAVING count(*) > 1 ORDER BY text_hash""".stripMargin,
    "dedup_minhash_lsh" -> minhashLshSql,
    "dedup_jaccard" -> jaccardSql,
    "dedup_simhash" -> simhashSql,
    "dedup_simhash_pairs" -> simhashPairsSql,
    "dedup_embed_cosine" -> embedGatedSql,
    "dedup_embed_exact" ->
      s"""WITH scored AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(${cosSql("a.embedding", "b.embedding")}, 4) AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.4
         |ORDER BY id_a, id_b""".stripMargin,
    "ann_lsh" -> annLshSql,
    "ann_ivf" -> annIvfSql,
    "ann_topk" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 16),
         |scored AS (SELECT q.qid, e.vec_id AS id,
         |    round(${cosSql("e.embedding", "q.qv")}, 6) AS cosine
         |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
         |r AS (SELECT qid, id, cosine,
         |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, id ASC) AS rank
         |  FROM scored)
         |SELECT qid AS query_id, rank, id AS neighbor_id, cosine
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "text_quality" ->
      s"""WITH ${qualityCte("documents")}
        |SELECT doc_id, n_chars, n_tokens, punct_ratio, stopword_ratio, mean_token_len,
        |  quality_score
        |FROM q ORDER BY doc_id""".stripMargin,
    "curate_sample" ->
      """SELECT doc_id, lang, bucket FROM (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS bucket
        |  FROM documents)
        |WHERE bucket < CAST(trunc((CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
        |  WHEN 'zh' THEN 0.1 ELSE 0.05 END) * 1000000.0) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,
    "curate_filter" ->
      s"""WITH $dupDocs, ${qualityCte("docs")},
        |canon AS (SELECT md5(text) AS h, min(doc_id) AS canonical FROM docs GROUP BY 1),
        |j AS (SELECT q.doc_id, q.n_tokens, q.quality_score, c.canonical,
        |    CASE WHEN q.doc_id <> c.canonical THEN 'duplicate'
        |      WHEN q.n_tokens < 20 THEN 'too_short'
        |      WHEN q.n_tokens > 100000 THEN 'too_long'
        |      WHEN q.quality_score < 0.3 THEN 'low_quality'
        |      ELSE '' END AS reason
        |  FROM q JOIN docs d ON d.doc_id = q.doc_id
        |  JOIN canon c ON c.h = md5(d.text))
        |SELECT doc_id, n_tokens, quality_score, canonical,
        |  (reason = '') AS keep, reason
        |FROM j ORDER BY doc_id""".stripMargin,
    "dedup_clusters" -> dupClustersSql,
    "dedup_clusters_fix" -> dupClustersFixSql,
    "text_tokens" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
         |idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-3, 1))) AS j FROM toks),
         |sh AS (SELECT doc_id, array_to_string(t[j:j+3], ' ') AS s FROM idx),
         |h AS (SELECT doc_id, ${H("s")} AS h FROM sh)
         |SELECT doc_id, min(h) AS fp_min, max(h) AS fp_max,
         |  count(*) AS n_shingles, count(DISTINCT h) AS n_distinct
         |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
