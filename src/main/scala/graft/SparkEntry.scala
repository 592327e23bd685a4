package graft

import graft.core._
import graft.functions.Relational
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` exercises one operator of the engine
  * (SURVEY.md §2); `oracleSql` carries the equivalent DuckDB SQL. Column
  * names are aliased identically on both sides, and floating-point
  * aggregates use the exact-decimal pattern (cast operand to DECIMAL,
  * aggregate exactly, cast the final result to DOUBLE) so Spark and DuckDB
  * produce bit-identical values regardless of summation order — this is
  * also what makes the results reproducible on a 1000-executor cluster
  * where partial-aggregation order is nondeterministic.
  */
object SparkEntry {

  /** read one of the driver-generated tables (TESTDATA.md) */
  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    // events.ts has shipped as TIMESTAMP(NANOS)-read-as-long in one driver
    // testdata generation and timestamp[us] (→ TIMESTAMP_NTZ) in another;
    // normalize either to TimestampType (lossless under the UTC session tz)
    if (name == "events") graft.core.EventTime.normalize(df, "ts") else df
  }

  private def ctx(s: SparkSession): ActionPipelineContext =
    ActionPipelineContext(s, new InstanceRegistry())

  /** exact sum of a double column: decimal-aggregate then cast back */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue per nation: 4-way join + exact-decimal aggregation with
    * broadcast dimensions. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Relational operator coverage (SURVEY §2.4) — each runs through the
  // engine's operator surface.
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Aggregation (hash) — GenericDataFrame.groupBy/agg
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
            .cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // Projection + filter with parquet pushdown — FilterTransformer
    "q2_filter_project" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val filtered = FilterTransformer(
        "l_shipdate >= timestamp'1996-01-01 00:00:00' AND l_shipdate < timestamp'1997-01-01 00:00:00' AND l_discount > 0.05")
        .transform(t(s, dir, "lineitem"))
      WhitelistTransformer(Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
        .transform(filtered)
    }),

    // Multi-way equi join + agg; dims broadcast — GenericDataFrame.join
    "q3_revenue_by_nation" -> ((s, dir) => {
      val lineitem = t(s, dir, "lineitem")
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val nation = broadcast(t(s, dir, "nation"))
      val region = broadcast(t(s, dir, "region"))
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("num_items"))
    }),

    // Sort / limit / top-k with deterministic tie-break
    "q4_topk_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // distinct / countDistinct
    "q5_distinct_counts" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("distinct_parts"),
          countDistinct(col("l_suppkey")).as("distinct_supps"),
          count(lit(1)).as("num_rows"))
    }),

    // Window function dedup (latest per key) — DeduplicateTransformer
    "q6_latest_event_per_user" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      DeduplicateTransformer(Seq("user_id"), "struct(ts, event_id)", descending = true)
        .transform(t(s, dir, "events"))
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
    }),

    // Anti join (NOT EXISTS); against large orders so the result is non-empty
    "q7_customers_without_orders" -> ((s, dir) => {
      val bigOrders = t(s, dir, "orders").where(col("o_totalprice") > 300000.0)
      t(s, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Semi join (EXISTS)
    "q8_customers_with_big_orders" -> ((s, dir) => {
      val bigOrders = t(s, dir, "orders").where(col("o_totalprice") > 400000.0)
      t(s, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
    }),

    // Set ops: except/unionByName — Relational.symmetricDifference
    "q9_part_symmetric_difference" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val a = li.where(col("l_quantity") >= 49).select(col("l_partkey")).distinct()
      val b = li.where(col("l_quantity") <= 2).select(col("l_partkey")).distinct()
      Relational.symmetricDifference(a, b, "in_first")
    }),

    // Grouping sets / rollup
    "q10_rollup_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("num_rows"))
    }),

    // String scalar functions
    "q11_string_functions" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        length(col("p_name")).cast(IntegerType).as("name_len"),
        floor(col("p_retailprice") * 10).cast(LongType).as("price_tenths"))
    }),

    // Date/time scalar functions
    "q12_date_functions" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast(IntegerType).as("order_year"),
        month(col("o_orderdate")).cast(IntegerType).as("order_month"),
        dayofmonth(col("o_orderdate")).cast(IntegerType).as("order_day"),
        date_trunc("month", col("o_orderdate")).as("month_start"))
    }),

    // Conditional aggregation (CASE WHEN inside agg)
    "q13_conditional_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("num_orders"),
          sum(when(col("o_totalprice") > 250000.0, 1L).otherwise(0L)).as("num_big"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("num_finished"))
    }),

    // PK violators (null ∪ duplicate keys) — Relational.getPKviolators,
    // used by PKViolatorsDataObject; orders.o_custkey is deliberately
    // non-unique so this returns rows.
    "q14_pk_violators" -> ((s, dir) => {
      Relational.getPKviolators(t(s, dir, "orders"), Seq("o_custkey"))
        .select(col("o_orderkey"), col("o_custkey"))
    }),

    // Left outer join + agg preserving unmatched rows
    "q15_orders_per_customer" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("num_orders"),
          dsum(coalesce(col("o_totalprice"), lit(0.0))).as("total_spent"))
    }),

    // approx_count_distinct (HLL++) vs exact: the sketch value itself is
    // engine-specific, so the oracled output is the exact count plus a
    // within-tolerance flag (rsd 0.02 → assert |approx-exact| <= 3*rsd*exact;
    // deterministic in Spark: fixed hash, fixed data)
    "q16_approx_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("_approx"),
        countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("exact_parts"),
          (abs(col("_approx") - col("exact_parts")).cast(DoubleType) <=
            col("exact_parts").cast(DoubleType) * 0.06).as("approx_ok"))
    }),

    // ---------------------------------------------------------------
    // Pipeline table operators (SURVEY §2.2) run as pure state
    // transitions on deterministic synthetic loads so DuckDB can oracle
    // the subtle SCD2/dedup/merge semantics.
    // ---------------------------------------------------------------

    // DeduplicateAction semantics: latest record per key across two loads
    "q17_dedup_two_loads" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val existing = orders.where(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn(operators.Historization.captured, lit(T1))
      val feed = orders.where(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") + 1000.0).as("o_totalprice"))
      operators.Historization.deduplicate(existing, feed, Seq("o_orderkey"), T2)
    }),

    // HistorizeAction full SCD2: changed keys closed+reopened, deleted keys
    // closed, unchanged keep original capture ts
    "q18_historize_full" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val existing = customer.select(col("c_custkey"), col("c_acctbal"))
        .withColumn(operators.Historization.captured, lit(T1))
        .withColumn(operators.Historization.delimited, lit(operators.Historization.doomsday))
      val feed = customer.where(col("c_custkey") % 5 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 3 === 0, col("c_acctbal") + 100.0)
            .otherwise(col("c_acctbal")).as("c_acctbal"))
      fmtTs(operators.Historization.fullHistorize(existing, feed, Seq("c_custkey"), T2),
        operators.Historization.captured, operators.Historization.delimited)
    }),

    // HistorizeAction incremental: feed carries only changed rows; absent
    // keys stay open
    "q19_historize_incremental" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val existing = customer.select(col("c_custkey"), col("c_acctbal"))
        .withColumn(operators.Historization.captured, lit(T1))
        .withColumn(operators.Historization.delimited, lit(operators.Historization.doomsday))
      val feed = customer.where(col("c_custkey") % 4 === 0)
        .select(col("c_custkey"), (col("c_acctbal") + 50.0).as("c_acctbal"))
      fmtTs(operators.Historization.incrementalHistorize(existing, feed, Seq("c_custkey"), T2),
        operators.Historization.captured, operators.Historization.delimited)
    }),

    // CDC historization: replay events as a change stream (event_type
    // 'error' = delete op); one window, no join
    "q20_cdc_historize" -> ((s, dir) => {
      operators.Historization.cdcHistorize(
        t(s, dir, "events").select(col("user_id"), col("event_id"), col("value"), col("ts"), col("event_type")),
        pk = Seq("user_id"), tsCol = "ts", opCol = "event_type",
        deleteOp = "error", tieBreakCols = Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("value"),
          col("dl_ts_captured"), col("dl_ts_delimited"))
        .transform(fmtTs(_, "dl_ts_captured", "dl_ts_delimited"))
    }),

    // MERGE upsert semantics (SaveModeMergeOptions): update / delete /
    // insert conditions in one pass
    "q21_merge_upsert" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val existing = orders.where(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val feed = orders.where(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), (col("o_totalprice") * 1.1).as("o_totalprice"))
      sources.MergeEmulation.computeMergedState(existing, feed, Seq("o_orderkey"),
        SaveModeMergeOptions(
          deleteCondition = Some("new.o_orderstatus = 'P'"),
          updateCondition = Some("new.o_totalprice > existing.o_totalprice")))
    }),

    // Schema evolution: old load (with c_acctbal) + new load (dropped
    // c_acctbal, added c_mktsegment) aligned to the merged schema —
    // SchemaEvolution.process (SURVEY §1.3)
    "q22_schema_evolution" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val oldLoad = customer.select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val newLoad = customer.where(col("c_custkey") > 100)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      val (o, n) = graft.functions.SchemaEvolution.process(oldLoad, newLoad)
      o.unionByName(n)
    }),

    // ---------------------------------------------------------------
    // Training-data pipeline operators (dedup / similarity / text /
    // multimodal) on the documents+embeddings tables.
    // ---------------------------------------------------------------

    // Text statistics: token counting + length features (TextAnalysis)
    "q23_text_stats" -> ((s, dir) => {
      import graft.functions.TextAnalysis._
      t(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).cast(IntegerType).as("n_chars"),
        tokenCount(col("text")).cast(IntegerType).as("n_tokens"),
        meanTokenLength(col("text")).as("mean_tok_len"),
        stopwordHits(col("text"), Seq("the", "a", "and", "of")).cast(IntegerType).as("stop_hits"))
    }),

    // Exact dedup (hash-groupBy) over a corpus with injected duplicates
    "q24_exact_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val dups = docs.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      graft.functions.Dedup.exactDedup(docs.unionByName(dups), "doc_id", "text")
    }),

    // Text quality ratio features (regex-based, oracle-checkable)
    "q25_quality_ratios" -> ((s, dir) => {
      import graft.functions.TextAnalysis._
      t(s, dir, "documents").select(
        col("doc_id"),
        punctRatio(col("text")).as("punct_ratio"),
        digitRatio(col("text")).as("digit_ratio"),
        uppercaseRatio(col("text")).as("upper_ratio"),
        stopwordRatio(col("text"), englishStopwords).as("stop_ratio"))
    }),

    // Composite quality score + language-ID + fingerprint semantics. All
    // oracled: quality and lang_pred are deterministic ratio arithmetic the
    // oracle reimplements exactly (same division order → bit-identical
    // doubles; earliest-max tie-break), and the 64-bit fingerprint is
    // checked through its normalization CONTRACT (whitespace- and
    // case-insensitivity booleans) since xxhash64 itself has no DuckDB twin.
    "q26_quality_lang_fingerprint" -> ((s, dir) => {
      import graft.functions.TextAnalysis._
      t(s, dir, "documents").select(
        col("doc_id"),
        qualityScore(col("text")).as("quality"),
        langId(col("text")).as("lang_pred"),
        (fingerprint(col("text")) ===
          fingerprint(regexp_replace(col("text"), " ", "   "))).as("fp_ws_invariant"),
        // lower() is idempotent for every Unicode string (unlike
        // lower(upper(s)) — ß→'SS'→'ss', dotted İ — which is why the
        // perturbation must round-trip through the fingerprint's own
        // normalization, not an arbitrary case flip)
        (fingerprint(col("text")) === fingerprint(lower(col("text")))).as("fp_case_invariant"))
    }),

    // MinHash+LSH near-duplicate pairs on a corpus with planted near-dups.
    // Oracled as FULL set equality against DuckDB's exhaustive all-pairs
    // exact jaccard (feasible at the sf0.01 oracle scale): precision is
    // exact by construction (candidates are verified with exact jaccard
    // before emission), and bands=16 (2 rows/band) puts LSH recall at the
    // 0.5 threshold above 0.999 per pair — with fixed seeds and fixed
    // driver data the outcome is deterministic, and verified equal here.
    "q27_minhash_pairs" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val nearDups = docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" extra trailing tokens appended here")).as("text"))
      graft.functions.Dedup.minhashDuplicatePairs(
        docs.unionByName(nearDups), "doc_id", "text",
        shingleSize = 5, numHashes = 32, bands = 16, threshold = 0.5)
    }),

    // SimHash near-dup pairs on the same planted corpus — FULLY oracled:
    // the portable md5-derived 32-bit signature is reproducible in DuckDB,
    // which brute-forces exact all-pairs hamming over the same signatures.
    // Manku blocking (blocksPerKey=2 → C(8,2) 8-bit keys) is exhaustive
    // within the bound, so blocked-join output == all-pairs output, and
    // failOnCappedBuckets turns the one escape hatch (a dropped oversized
    // bucket) into a loud error instead of a silent mismatch. The native
    // xxhash64 kernel stays oracled through q46's planted-recall check.
    "q28_simhash_pairs" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val nearDups = docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" extra trailing tokens appended here")).as("text"))
      graft.functions.Dedup.simhashNearDupPairsPortable(
        docs.unionByName(nearDups), "doc_id", "text", shingleSize = 5,
        bits = 32, maxHamming = 6, blocksPerKey = 2, failOnCappedBuckets = true)
    }),

    // n-gram (token-set) Jaccard for the planted pairs — exact, oracled
    "q29_token_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val modified = docs.where(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          concat(col("text"), lit(" extra trailing tokens appended here")).as("text2"))
      val a = array_distinct(split(col("text"), " "))
      val b = array_distinct(split(col("text2"), " "))
      docs.join(modified, "doc_id")
        .select(col("doc_id"),
          (size(array_intersect(a, b)).cast(DoubleType) /
            size(array_union(a, b)).cast(DoubleType)).as("jaccard"))
    }),

    // Brute-force cosine top-k over the embeddings table (ANN baseline);
    // query = embedding of vec_id 0; sequential-fold double arithmetic
    // makes the scores bit-identical to the DuckDB oracle
    "q30_embedding_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val query = emb.where(col("vec_id") === 0)
        .select(col("embedding")).collect().head.getSeq[Float](0).toArray
      graft.functions.Similarity.bruteForceTopK(
        emb.where(col("vec_id") =!= 0), "vec_id", "embedding", query, 10)
    }),

    // Batch ANN join via LSH buckets (the 100TB KNN-join path: corpus
    // signed once, bucket equi-join, no cross product). Oracled through the
    // structural self-match guarantee: each query IS a corpus row, so its
    // own bucket contains it and it ranks first (cosine maximal at the
    // identical vector) — top-1 per query is exactly (q, q, 1).
    "q31_ann_lsh_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") % 40 === 0)
      graft.functions.Similarity.lshTopKJoin(
        emb, queries, "vec_id", "vec_id", "embedding",
        k = 1, dim = 64, numPlanes = 12, probeBits = 1)
    }),

    // Multimodal plumbing, oracled: text payloads are non-images, so the
    // sniff routes every row to the honest stub (width/height 0,
    // format='stub'), the feature vector has the requested arity, and the
    // frame count is pure byte arithmetic — all DuckDB-computable from
    // strlen(text). Real decode is spec-covered with authored
    // PNG/WAV bytes (TrainingDataOpsSpec).
    "q32_multimodal_pipeline" -> ((s, dir) => {
      val media = t(s, dir, "documents").select(
        concat(lit("doc://"), col("doc_id")).as("path"),
        col("doc_id"),
        col("text").cast(BinaryType).as("content"))
      val withMeta = graft.operators.Multimodal.withImageMetadata(media)
      val withFeat = graft.operators.Multimodal.withImageFeatures(withMeta, dim = 8)
      graft.operators.Multimodal.sampleFrames(withFeat, "content", frameSize = 16, stride = 4)
        .select(col("doc_id"), col("image_meta.width").as("width"),
          col("image_meta.height").as("height"),
          col("image_meta.format").as("format"),
          size(col("features")).as("n_features"),
          size(col("frames")).as("n_frames"))
    }),

    // End-to-end corpus curation: quality ratios -> filter -> exact dedup
    // -> per-language stats, composed as ONE declarative plan (single scan
    // + one aggregation shuffle after the dedup groupBy)
    "q36_corpus_curation" -> ((s, dir) => {
      import graft.functions.{Dedup, TextAnalysis}
      val docs = t(s, dir, "documents")
      val scored = docs.select(col("doc_id"), col("text"),
        TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .where(col("n_tokens") >= 20 && col("punct_ratio") < 0.2)
      val canonical = scored
        .groupBy(Dedup.contentHash(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("doc_id"), min(col("n_tokens")).as("n_tokens"))
      canonical.agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("doc_id")).as("min_doc_id"))
    }),

    // Grouping sets (multi-level aggregate in one pass — map-side partial
    // aggregation per grouping set, single shuffle)
    "q35_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  count(*) AS cnt,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
    }),

    // Connected components over a deterministic duplicate-pair graph
    // (doc_id -> doc_id*2 chains) — clusters near-dup pairs into groups;
    // oracle = DuckDB recursive CTE computing min-reachable id
    "q33_duplicate_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val maxId = docs.agg(max(col("doc_id"))).collect().head.getLong(0)
      val pairs = docs.where(col("doc_id") > 0 && col("doc_id") * 2 <= maxId)
        .select(col("doc_id").as("id_a"), (col("doc_id") * 2).as("id_b"))
      graft.functions.Dedup.duplicateClusters(pairs)
        .select(col("id").as("doc_id"), col("cluster_id"))
    }),

    // Batch ANN join through the IVF index (cell equi-join after per-row
    // centroid ranking). Oracled structurally: each query IS an indexed
    // row, its own cell ranks first (assignment = nearest centroid), so
    // with nprobe>=1 the self-match is probed and wins rank 1.
    "q34_ivf_ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val index = graft.functions.Similarity.buildIvfIndex(
        emb, "vec_id", "embedding", nlist = 16)
      val queries = emb.where(col("vec_id") % 40 === 0)
      graft.functions.Similarity.ivfTopKJoin(index, queries, "vec_id", "embedding",
        k = 1, nprobe = 2)
    }),

    // MinHash+LSH PLANTED-pair recall, oracled exactly: the planted
    // near-dups (doc ⊕ fixed suffix) have exact char-5-gram Jaccard the
    // oracle can compute in DuckDB; LSH must find every one (recall = 1.0 —
    // deterministic with fixed hash seeds), and the verified jaccard values
    // are set-cardinality ratios → bit-identical across engines.
    "q37_minhash_planted_recall" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val nearDups = docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" extra trailing tokens appended here")).as("text"))
      // bands=16 (2 rows/band): planted pairs bottom out at jaccard ≈ 0.57,
      // where a band match has prob 1-(1-j²)¹⁶ ≈ 0.998 — with fixed seeds
      // the outcome is deterministic, and verified recall IS 1.0 here
      graft.functions.Dedup.minhashDuplicatePairs(docs.unionByName(nearDups), "doc_id", "text",
        shingleSize = 5, numHashes = 32, bands = 16, threshold = 0.5)
        .where(col("id_b") === col("id_a") + 2000000L && col("id_a") % 7 === 0)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }),

    // Benchmark decontamination: corpus docs sharing word-5-grams with a
    // benchmark set (docs ≡ 1 mod 13 stand in for the eval set). One
    // broadcast join + partial-agg count — DuckDB-expressible exactly.
    "q38_decontamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val benchmark = docs.where(col("doc_id") % 13 === 1).select(col("text"))
      graft.functions.Decontamination.contaminationReport(
        docs, "doc_id", "text", benchmark, "text", n = 5, minOverlap = 1)
    }),

    // Embedding near-dup with PLANTED exact copies, oracled: an identical
    // vector hashes to the identical hyperplane bucket (structural, not
    // probabilistic), so LSH recall on planted copies is guaranteed and
    // the found-pair SET matches the oracle exactly (ids only — cosine of
    // float vectors isn't portably bit-stable across engines).
    "q39_embedding_neardup_planted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val planted = emb.where(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
      graft.functions.Dedup.embeddingNearDupPairs(
        emb.unionByName(planted), "vec_id", "embedding", dim = 64, threshold = 0.95)
        .where(col("id_b") === col("id_a") + 2000000L && col("id_a") % 5 === 0)
        .select(col("id_a"), col("id_b"))
    }),

    // As-of join: each click gets the latest purchase (per user) at or
    // before it. Tagged-union + window — ONE shuffle, no join operator;
    // oracle = DuckDB's native ASOF LEFT JOIN. Right side reduced to
    // unique (user_id, ts) first for a deterministic payload.
    "q40_asof_join" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val clicks = events.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val purchases = events.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(dsum(col("value")).as("purchase_value"))
      graft.functions.TemporalJoins.asOfJoin(
        clicks, purchases, Seq("user_id"), "ts", "ts", Seq("purchase_value"))
        .select(col("user_id"), col("event_id"), col("ts"),
          col("purchase_value_asof"), col("ts_asof"))
    }),

    // Gap sessionization (30-min inactivity) + per-session stats — the
    // batch twin of streaming session windows; two windows share one sort,
    // the group-by reuses the partitioning
    "q41_sessionize" -> ((s, dir) => {
      val sessions = graft.functions.TemporalJoins.sessionize(
        t(s, dir, "events").select(col("user_id"), col("event_id"), col("ts")),
        Seq("user_id"), "ts", maxGapSeconds = 1800)
      sessions.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          (unix_millis(max(col("ts"))) - unix_millis(min(col("ts")))).as("duration_ms"))
    }),

    // Interval join via domain bucketing: part-derived [lo, lo+3] bands
    // against event values — the equi-join-on-bucket plan that replaces
    // the O(n·m) theta join; oracle = DuckDB inequality join
    "q42_range_join" -> ((s, dir) => {
      val intervals = t(s, dir, "part").where(col("p_partkey") % 17 === 0)
        .select(col("p_partkey"),
          (col("p_partkey") % 480).cast("double").as("lo"),
          ((col("p_partkey") % 480) + 3.0).as("hi"))
      val points = t(s, dir, "events").select(col("event_id"), col("value"))
      graft.functions.TemporalJoins.rangeJoin(points, "value", intervals, "lo", "hi", bucketWidth = 3.0)
        .groupBy(col("p_partkey"))
        .agg(count(lit(1)).as("n_points"), dsum(col("value")).as("sum_value"))
    }),

    // Gopher-style repetition quality signals, exact per-row HOFs (staged
    // so each n-gram array is built once — see withRepetitionSignals)
    "q43_repetition_ratios" -> ((s, dir) => {
      graft.functions.TextAnalysis.withRepetitionSignals(
        t(s, dir, "documents"), "text", maxN = 3)
        .select(col("doc_id"), col("dup_word_frac"),
          col("dup_2gram_frac").as("dup_bigram_frac"),
          col("dup_3gram_frac").as("dup_trigram_frac"))
    }),

    // PII scrub: counts + redacted length over text with synthesized
    // contact info (corpus text carries none, so both engines append the
    // same deterministic PII before scrubbing)
    "q44_pii_redaction" -> ((s, dir) => {
      import graft.functions.TextAnalysis
      val withPii = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or +1 555 01"), col("doc_id")).as("text"))
      withPii.select(col("doc_id"),
        TextAnalysis.countPattern(col("text"), TextAnalysis.emailPattern).as("n_emails"),
        TextAnalysis.countPattern(col("text"), TextAnalysis.phonePattern).as("n_phones"),
        length(TextAnalysis.redactPII(col("text"))).cast("integer").as("redacted_len"))
    }),

    // Deterministic stratified sampling (domain-mixing weights): the keep
    // decision is md5(doc_id)-derived so ANY engine reproduces the exact
    // sample — oracled row-for-row in DuckDB with the same hash formula
    "q45_weighted_sample" -> ((s, dir) => {
      import graft.functions.{Sampling, TextAnalysis}
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), (col("doc_id") % 5).as("domain"))
      val rates = Map("0" -> 0.9, "1" -> 0.5, "2" -> 0.25, "3" -> 0.1)
      Sampling.stratifiedSample(docs, col("doc_id"), col("domain").cast("string"), rates, defaultRate = 0.05)
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_kept"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("sum_tokens"))
    }),

    // SimHash PLANTED-pair recall, oracled (twin of q37 for the simhash
    // family) — per-pair STRUCTURAL invariant, robust at any scale factor:
    // for every planted pair, Manku blocking guarantees
    //   hamming(a,b) <= maxHamming  ⇒  pair is found
    // (exhaustive within the bound; failOnCappedBuckets turns the one
    // escape hatch — a silently dropped oversized bucket — into a loud
    // error). The emitted `ok` is that implication, so the oracle asserts
    // `true` per pair without needing simhash in SQL, and the check can't
    // rot when a bigger corpus pushes some planted pair past the bound
    // (it just stops exercising that pair instead of failing). The " v2"
    // suffix keeps planted hamming well inside maxHamming=12 (measured
    // max 9 at sf0.1), so in practice every pair tests the recall path.
    "q46_simhash_planted_recall" -> ((s, dir) => {
      import graft.functions.Dedup
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val nearDups = docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" v2")).as("text"))
      val corpus = docs.unionByName(nearDups)
      // sign ONCE: the same persisted signature frame feeds pair generation
      // AND the planted hamming audit (previously two full signature passes)
      val sims = Dedup.simhashSignatures(corpus, "doc_id", "text", shingleSize = 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val found = Dedup.simhashNearDupPairsFromSigs(
        sims, maxHamming = 12, blocksPerKey = 2, failOnCappedBuckets = true)
        .where(col("id_b") === col("id_a") + 2000000L)
        .select(col("id_a"), lit(true).as("_found"))
      val planted = sims.where(col("id") < 2000000L && col("id") % 7 === 0)
        .select(col("id").as("id_a"), col("simhash").as("sim_a"))
        .join(sims.where(col("id") >= 2000000L)
          .select((col("id") - 2000000L).as("id_a"), col("simhash").as("sim_b")), "id_a")
        .select(col("id_a"),
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      planted.join(found, Seq("id_a"), "left")
        .select(col("id_a"), (col("id_a") + 2000000L).as("id_b"),
          (col("hamming") > 12 || coalesce(col("_found"), lit(false))).as("ok"))
    }),

    // Passage-level duplication stats (MassiveText/RefinedWeb line-dedup
    // generalized to token windows): per doc, distinct 8-token passages
    // shared with ANOTHER doc. Passages shuffle as 64-bit hashes, never
    // as text; the oracle recomputes doc frequencies over raw passages.
    "q47_passage_dedup" -> ((s, dir) => {
      graft.functions.Dedup.passageDupStats(
        t(s, dir, "documents"), "doc_id", "text", n = 8)
        .withColumnRenamed("id", "doc_id")
    }),

    // Gopher-style composite document filter (word-count bounds, mean word
    // length, >=2 distinct stopwords, duplicate-word fraction) — every rule
    // a codegen'd expression over ONE scan, all DuckDB-replicable.
    "q48_doc_filter" -> ((s, dir) => {
      import graft.functions.TextAnalysis._
      val d = t(s, dir, "documents")
      d.select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        meanTokenLength(col("text")).as("mean_tok_len"),
        distinctStopwordHits(col("text"), englishStopwords).as("n_stop_distinct"),
        duplicateNgramFraction(col("text"), 1).as("dup_word_frac"))
        .withColumn("keep",
          col("n_tokens").between(20, 1000) &&
            col("mean_tok_len").between(2.5, 9.0) &&
            col("n_stop_distinct") >= 2 &&
            col("dup_word_frac") <= 0.6)
    }),

    // Token-budget domain mixing: per-domain totals → keep rates →
    // deterministic md5 sample. The training-mix freeze step: reproducible
    // across partitionings AND engines (oracle reproduces it row-for-row).
    "q49_token_budget_mix" -> ((s, dir) => {
      import graft.functions.{Sampling, TextAnalysis}
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), (col("doc_id") % 4).cast("string").as("domain"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      // budgets scale with the corpus so the query is meaningful at every SF:
      // domain 0 effectively uncapped, 1 and 2 squeezed, 3 barely capped
      val total = docs.agg(sum(col("n_tokens").cast("long"))).collect().head.getLong(0)
      val budgets = Map("0" -> total, "1" -> total / 16, "2" -> total / 32, "3" -> total / 5)
      Sampling.tokenBudgetMix(docs, col("doc_id"), col("domain"),
        col("n_tokens"), budgets)
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_tokens").cast("long")).as("kept_tokens"),
          min(col("_mix_rate")).as("rate"))
    }),

    // INCREMENTAL dedup: a new crawl batch joined against the existing
    // corpus signature STORE — only the delta is signed, candidates come
    // from delta-band × corpus-band equi-join (never corpus × corpus).
    // Oracled as FULL set equality vs DuckDB's exhaustive new × corpus
    // exact jaccard (the q27 argument: precision exact by construction,
    // recall ≈ 1 at these planted jaccards with bands=16).
    "q51_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val newBatch = docs.where(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit(" appended updates for the second crawl")).as("text"))
      val store = graft.functions.Dedup.minhashSignatures(
        docs, "doc_id", "text", shingleSize = 5, numHashes = 32)
      graft.functions.Dedup.minhashIncrementalPairs(newBatch, store, "doc_id", "text",
        shingleSize = 5, numHashes = 32, bands = 16, threshold = 0.5)
    }),

    // Corpus-relative vocabulary coverage (CCNet-style): fraction of each
    // doc's tokens that are in the corpus top-1000 vocabulary. Global agg
    // -> broadcast top-K vocab -> per-doc re-agg; coverage is one int/int
    // IEEE division, so DuckDB reproduces it bit-for-bit.
    "q52_vocab_coverage" -> ((s, dir) => {
      graft.functions.TextAnalysis.vocabularyCoverage(
        t(s, dir, "documents"), "doc_id", "text", topK = 1000)
    }),

    // Per-source document caps (anti-boilerplate / source-balance step):
    // deterministic order-statistic sample — at most n docs per source,
    // chosen by smallest md5(key) hash, so the kept set is a pure function
    // of the data (stable across partitionings/engines; oracle reproduces
    // it row-for-row). One shuffle on the stratum.
    "q53_source_caps" -> ((s, dir) => {
      graft.functions.Sampling.capPerStratum(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        col("doc_id"), col("source"), n = 15)
    }),

    // Sequence packing (concat-then-cut LM batch prep), per shard so it
    // parallelizes; offsets/pack ids are exact window arithmetic.
    "q50_sequence_packing" -> ((s, dir) => {
      import graft.functions.{Packing, TextAnalysis}
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      Packing.packSequences(docs, col("doc_id"), col("shard"), col("n_tokens"), seqLen = 512)
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          col("start_offset"), col("pack_id"), col("pack_offset"))
    }),

    // Train/val/test split freeze: md5-derived label per doc — a pure
    // function of the data (no seed, no partitioning dependence), so the
    // split survives recluster/re-run/engine-swap. Row-level oracle.
    "q54_train_split" -> ((s, dir) => {
      import graft.functions.Sampling
      t(s, dir, "documents").select(col("doc_id"),
        Sampling.splitLabel(col("doc_id"),
          Seq("val" -> 0.05, "test" -> 0.05)).as("split"))
    }),

    // Deterministic global shuffle → shard + within-shard training order.
    // Shard comes straight off the key hash (no coordination); order is a
    // per-shard window — numShards-way parallel, never a single-partition
    // global row_number. Row-level oracle on (doc_id, shard, pos).
    "q55_shard_assignment" -> ((s, dir) => {
      graft.functions.Sampling.shardAssignment(
        t(s, dir, "documents").select(col("doc_id")), col("doc_id"), numShards = 8)
        .select(col("doc_id"), col("shard"), col("pos"))
    }),

    // Corpus-wide boilerplate n-gram hot spots: top-20 trigrams by DOCUMENT
    // frequency (distinct-per-doc bounds spam skew), total-ordered cut.
    "q56_ngram_hotspots" -> ((s, dir) => {
      graft.functions.TextAnalysis.ngramHotspots(
        t(s, dir, "documents"), "text", n = 3, topK = 20)
    }),

    // Exact grouped percentiles (corpus length/price profiling): Spark's
    // exact percentile (sort-based within group) vs DuckDB quantile_cont —
    // both linear-interpolation definitions; rounded to 4 decimals so the
    // comparison tests the percentile machinery, not last-ulp FP noise.
    "q57_exact_percentiles" -> ((s, dir) => {
      // ONE percentile aggregate with an array argument — a single
      // per-group buffer and sort, instead of four independent ones
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.9, 0.99))").as("ps"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          round(element_at(col("ps"), 1), 4).as("p25"),
          round(element_at(col("ps"), 2), 4).as("p50"),
          round(element_at(col("ps"), 3), 4).as("p90"),
          round(element_at(col("ps"), 4), 4).as("p99"),
          col("n"))
    }),

    // Unicode NFC normalization (codegen'd kernel): combining-mark text
    // (every 'a' followed by U+0300) composes back to precomposed 'à' —
    // len shrinks by the number of 'a's, md5 of the normalized UTF-8 is
    // engine-portable (DuckDB nfc_normalize agrees byte-for-byte).
    "q58_nfc_normalize" -> ((s, dir) => {
      import graft.functions.TextAnalysis
      val perturbed = regexp_replace(col("text"), "a", "a\u0300")
      t(s, dir, "documents").select(col("doc_id"),
        length(perturbed).as("len_raw"),
        length(TextAnalysis.nfcNormalize(perturbed)).as("len_nfc"),
        md5(TextAnalysis.nfcNormalize(perturbed).cast("binary")).as("md5_nfc"))
    }),

    // Mergeable distinct-count sketches (the 100 TB path for vocabulary /
    // cardinality tracking: per-partition HLL sketches union WITHOUT
    // rescanning — datasketches HLL, same family the reference exposes via
    // approx_count_distinct). Structural oracle: the merged estimate must
    // land within the sketch's error envelope of the exact count (which
    // both engines compute exactly).
    "q59_hll_union" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("lang"), col("source"),
          explode(graft.functions.TextAnalysis.tokens(col("text"))).as("tok"))
      val est = toks.groupBy(col("lang"), col("source"))
        .agg(hll_sketch_agg(col("tok"), lit(12)).as("sk"))
        .groupBy(col("lang"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val exact = toks.groupBy(col("lang"))
        .agg(countDistinct(col("tok")).as("n_exact"))
      exact.join(est, Seq("lang"))
        .select(col("lang"), col("n_exact"),
          (abs(col("est") - col("n_exact")) <=
            greatest(col("n_exact") * 0.05, lit(8.0))).as("ok"))
    }),

    // HTML boilerplate stripping (web-corpus text extraction): documents
    // wrapped in deterministic markup + escaped entities, then cleaned by
    // the tag-strip / entity-unescape / whitespace-squash chain. Every
    // step is a portable regex — the oracle replicates the cleaning
    // byte-for-byte (md5 over the cleaned text).
    "q60_html_strip" -> ((s, dir) => {
      import graft.functions.TextAnalysis
      val html = concat(lit("<html><body><h1>Doc</h1><p class=\"c\">"),
        regexp_replace(col("text"), " the ", " &amp;the&#39; "),
        lit("</p><div>footer &lt;nav&gt;</div></body></html>"))
      t(s, dir, "documents").select(col("doc_id"),
        length(TextAnalysis.stripHtml(html)).as("n_chars_clean"),
        md5(TextAnalysis.stripHtml(html).cast("binary")).as("md5_clean"))
    }),

    // End-to-end near-dedup (the NearDedupTransformer path, oracled):
    // planted near-dup corpus → minhash LSH pairs → connected components
    // → drop non-canonical members → surviving doc ids. Row-level oracle:
    // DuckDB brute-forces exact all-pairs jaccard and replays the
    // clustering with a recursive CTE.
    "q61_near_dedup_survivors" -> ((s, dir) => {
      import graft.functions.Dedup
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val nearDups = docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" extra trailing tokens appended here")).as("text"))
      val corpus = docs.unionByName(nearDups)
      val pairs = Dedup.minhashDuplicatePairs(corpus, "doc_id", "text",
        shingleSize = 5, numHashes = 32, bands = 16, threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      val drop = Dedup.duplicateClusters(pairs)
        .where(col("id") =!= col("cluster_id"))
        .select(col("id").as("doc_id"))
      // drop set is duplicate-volume-scaled → no broadcast hint (r13 #1)
      corpus.join(drop, Seq("doc_id"), "left_anti")
        .select(col("doc_id"))
    }),

    // BPE first-merge candidates (tokenizer induction): top-20 adjacent
    // char pairs weighted by word frequency — char work runs over the
    // DISTINCT vocabulary, not the corpus. Exact integer counts, total
    // (cnt desc, pair asc) order → identical cut in any engine.
    "q62_bpe_merge_candidates" -> ((s, dir) => {
      graft.functions.TextAnalysis.bpeMergeCandidates(
        t(s, dir, "documents"), "text", topK = 20)
    }),

    // Split-integrity guard: held-out docs leaking 8-gram runs into train
    // (planted: every doc_id % 11 == 0 gets a train twin sharing its text
    // prefix, so some leaks are guaranteed at every SF). Row-level oracle:
    // DuckDB recomputes the same split labels, passages and overlap.
    "q63_split_contamination" -> ((s, dir) => {
      import graft.functions.{Decontamination, Sampling}
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val twins = docs.where(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 4000000L).as("doc_id"),
          concat(col("text"), lit(" trailing continuation for the twin copy")).as("text"))
      val corpus = docs.unionByName(twins)
        .withColumn("split", Sampling.splitLabel(col("doc_id"),
          Seq("val" -> 0.1, "test" -> 0.1)))
      Decontamination.splitContamination(corpus, "doc_id", "text", "split", n = 8)
    }),

    // Token-length histogram (corpus profiling): fixed-width buckets over
    // token counts — one partial-agg shuffle of (bucket, count, sum),
    // integer-exact on both engines.
    "q64_length_histogram" -> ((s, dir) => {
      import graft.functions.TextAnalysis
      t(s, dir, "documents")
        .select(TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
        .withColumn("bucket", (col("n_tokens") / 10L).cast("long") * 10L)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
    }),

    // Top-3 docs per source by (quality desc, doc_id asc): the keyed top-k
    // selection every curation pipeline runs. The rank<=k filter compiles
    // to WindowGroupLimit — per-partition top-k BEFORE the shuffle (plan
    // asserted in PlanAssertionsSpec for the same shape).
    "q65_topk_per_source" -> ((s, dir) => {
      import graft.functions.TextAnalysis
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
        .orderBy(col("quality").desc, col("doc_id").asc)
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("doc_id"), col("source"), col("rk").cast("long").as("rk"))
    }),

    // Fine-grained MERGE options in one statement (SURVEY §2.1
    // SDLSaveModes; reference sdl-core/definitions/SDLSaveMode.scala:126-146):
    // deleteCondition, updateCondition + updateColumns restriction,
    // insertCondition + insertColumnsToIgnore + insertValuesOverride, and
    // additionalMergePredicate (key-matched rows failing it fall into BOTH
    // unmatched branches, exactly like Delta's extra merge predicate).
    "q66_merge_fine_grained" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
      val existing = orders.where(col("o_orderkey") % 3 =!= 0)
      val feed = orders.where(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 5 === 0, lit("P")).otherwise(col("o_orderstatus")).as("o_orderstatus"),
          (col("o_totalprice") * 1.1).as("o_totalprice"),
          col("o_orderpriority"))
      sources.MergeEmulation.computeMergedState(existing, feed, Seq("o_orderkey"),
        SaveModeMergeOptions(
          deleteCondition = Some("new.o_orderstatus = 'P' AND existing.o_totalprice < 150000"),
          updateCondition = Some("new.o_totalprice > existing.o_totalprice"),
          updateColumns = Seq("o_totalprice"),
          insertCondition = Some("new.o_totalprice > 50000"),
          insertColumnsToIgnore = Seq("o_orderpriority"),
          insertValuesOverride = Map("o_orderstatus" -> "upper(new.o_orderstatus) || '!'"),
          additionalMergePredicate = Some("existing.o_orderstatus = new.o_orderstatus")))
    }),

    // Nested-struct schema evolution (SchemaEvolution.process recursive
    // path, mirrors reference ComplexTypeEvolution/ValueProjector): the old
    // load's struct drops a field, the new load's adds one; both are
    // projected to the merged struct type, including the null-struct
    // branch. Flattened at the end only so DuckDB can oracle the values.
    "q67_nested_schema_evolution" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val oldLoad = customer.select(col("c_custkey"),
        when(col("c_custkey") % 50 === 0, lit(null))
          .otherwise(struct(col("c_name").as("name"), col("c_acctbal").as("acctbal")))
          .as("profile"))
      val newLoad = customer.where(col("c_custkey") > 100)
        .select(col("c_custkey"),
          struct(col("c_name").as("name"), col("c_mktsegment").as("segment")).as("profile"))
      val (o, n) = graft.functions.SchemaEvolution.process(oldLoad, newLoad)
      o.unionByName(n).select(col("c_custkey"),
        col("profile.name").as("p_name"),
        col("profile.acctbal").as("p_acctbal"),
        col("profile.segment").as("p_segment"))
    }),

    // CSV round-trip under the value-hash gate: quote/escape/newline/null
    // handling through CsvFileDataObject write→read (not just a spec). The
    // oracle reconstructs the same rows from parquet + literals, so any
    // parse defect (trimming, quote mangling, null/empty confusion) breaks
    // the hash.
    "q68_csv_roundtrip" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      import scala.jdk.CollectionConverters._
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      val tricky = s.createDataFrame(Seq[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(9001, "comma, separated", 90),
        org.apache.spark.sql.Row(9002, "quoted \"name\" here", 91),
        org.apache.spark.sql.Row(9003, "line one\nline two", 92),
        org.apache.spark.sql.Row(9004, null, 93),
        org.apache.spark.sql.Row(9005, "  padded  ", 94)).asJava, schema)
      val data = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .unionByName(tricky)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q68").toString
      val csv = sources.CsvFileDataObject("q68_csv", s"$tmp/nation_csv",
        // write side must not trim (Spark CSV write trims by default);
        // read side needs multiLine for the embedded newline
        csvOptions = Map(
          "ignoreLeadingWhiteSpace" -> "false", "ignoreTrailingWhiteSpace" -> "false",
          "multiLine" -> "true"),
        schema = Some(schema))
      csv.writeDataFrame(data)
      csv.getDataFrame()
    }),

    // Data-quality layer under the oracle (SURVEY §2.7): Job-scope
    // expectations ride the write via Dataset.observe (zero extra scan),
    // All-scope ones run one agg query; the resulting metrics are emitted
    // as rows so DuckDB can recompute every number exactly.
    "q69_quality_metrics" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      import graft.quality._
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val jobExp: Seq[Expectation] = Seq(
        CountExpectation("row_count", Some("value > 0")),
        SQLFractionExpectation("returned_frac", "l_returnflag = 'R'", Some("value < 1")),
        CompletenessExpectation("completeness", Seq("l_orderkey", "l_shipdate", "l_returnflag"),
          Some("value = 1")))
      val allExp: Seq[Expectation] = Seq(
        UniqueKeyExpectation("unique_key", Seq("l_orderkey", "l_linenumber")),
        SQLQueryExpectation("max_qty",
          "SELECT max(l_quantity) FROM %{inputViewName}", Some("value > 0")))
      val (instrumented, obsOpt) = DataQualityValidation.observeExpectations(li, jobExp)
      instrumented.write.format("noop").mode("overwrite").save()
      val jobMetrics = obsOpt.map(o => DataQualityValidation.evaluateObserved(o, jobExp)).getOrElse(Map.empty)
      val allMetrics = DataQualityValidation.evaluateAgainstTable(li, allExp)
      (jobMetrics ++ allMetrics).toSeq.map { case (k, v) =>
        (k, v match {
          case d: Double => d
          case l: Long => l.toDouble
          case i: Int => i.toDouble
          case other => other.toString.toDouble
        })
      }.toDF("metric", "value")
    }),

    // Whole-pipeline e2e under the oracle: HOCON config → registry → 2-action
    // DAG (filter stage, then SQL aggregate) with staged parquet writes —
    // the layer the reference's users actually run. Everything the other
    // queries exercise operator-by-operator flows here through the config
    // parser, feed selection, DAG ordering and the staged write path, and
    // the final table's values are hash-gated by DuckDB.
    "q70_pipeline_e2e" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q70").toString
      val cfg =
        s"""dataObjects:
           |  src-lineitem: {type: parquet, path: $dir/lineitem.parquet}
           |  stg-filtered: {type: parquet, path: $tmp/stg}
           |  dm-agg: {type: parquet, path: $tmp/agg}
           |actions:
           |  stage:
           |    type: copy
           |    inputId: src-lineitem
           |    outputId: stg-filtered
           |    saveMode: overwrite
           |    transformers:
           |      - {type: filter, filterClause: "l_discount > 0.02"}
           |    metadata: {feed: e2e}
           |  aggregate:
           |    type: copy
           |    inputId: stg-filtered
           |    outputId: dm-agg
           |    saveMode: overwrite
           |    transformers:
           |      - {type: sql, sql: "select l_returnflag, cast(sum(cast(l_quantity as decimal(18,2))) as double) as sum_qty, count(*) as n_items from %{inputViewName} group by l_returnflag"}
           |    metadata: {feed: e2e}
           |""".stripMargin
      core.PipelineRunner.run(cfg, s, feedSel = Some("e2e"))
      s.read.parquet(s"$tmp/agg")
    }),

    // Structured Streaming under the oracle (SURVEY §2.6, previously
    // spec-only): file-source stream → filter/project → parquet sink via
    // the DataObject streaming surface, Trigger.AvailableNow (drains the
    // static input exactly once, deterministically), then the sink's rows
    // are hash-compared by DuckDB. Gates the readStream/writeStream
    // plumbing — schema-carried source, checkpointed sink, append mode.
    "q71_streaming_pipeline" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q71").toString
      val schema = s.read.parquet(s"$dir/lineitem.parquet").schema
      // the file stream source requires a DIRECTORY; expose the single
      // parquet file through one (symlink — no copy of the data)
      java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$tmp/src"))
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$tmp/src/lineitem.parquet"),
        java.nio.file.Paths.get(s"$dir/lineitem.parquet"))
      val src = sources.ParquetFileDataObject("q71_src", s"$tmp/src")
      val dst = sources.ParquetFileDataObject("q71_dst", s"$tmp/out")
      val sdf = src.getStreamingDataFrame(Map.empty, Some(schema))
        .where(col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"))
      val q = dst.writeStreamingDataFrame(sdf,
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        Map.empty, s"$tmp/cp", "q71_stream")
      q.awaitTermination()
      dst.getDataFrame()
    }),

    // One-Permutation-Hashing minhash (O(shingles+k) signatures vs classic
    // O(shingles×k)) through the SAME banding/verification machinery:
    // planted near-dups (jaccard ≈ 0.98 — a band match at 2 rows/band ×
    // 16 bands misses with p ≈ 1e-22, deterministic with fixed seeds) must
    // all surface, and the reported jaccard is the exact shingle-set value
    // DuckDB recomputes independently.
    "q72_oph_planted_recall" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val nearDups = docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" v2")).as("text"))
      val sigs = graft.functions.Dedup.minhashSignaturesOph(
        docs.unionByName(nearDups), "doc_id", "text", shingleSize = 5, numHashes = 32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.functions.Dedup.minhashPairsFromSigs(sigs, bands = 16, rowsPerBand = 2,
        threshold = 0.7)
        .where(col("id_b") === col("id_a") + 2000000L && col("id_a") % 7 === 0)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }),

    // File-level append-evolution under the oracle: a second load that
    // drops one column and adds another APPENDS to the parquet object; the
    // persisted union schema makes both file generations readable (old
    // rows null-fill the new column and vice versa). DuckDB rebuilds the
    // same union from the source table, value-hashing the whole read path.
    "q73_append_evolution" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q73").toString
      val obj = sources.ParquetFileDataObject("q73_evo", s"$tmp/t")
      val customer = t(s, dir, "customer")
      obj.writeDataFrame(
        customer.select(col("c_custkey"), col("c_name"), col("c_acctbal")))
      obj.writeDataFrame(
        customer.where(col("c_custkey") > 100)
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
        Seq.empty, Some(SdlSaveMode.Append))
      obj.getDataFrame()
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
    }),

    // Incremental execution modes under the oracle — the reference's core
    // value proposition (PartitionDiffMode.scala:61-170), previously
    // spec-only. Two config-driven loads over a partitioned copy of orders:
    // load 1 sees only partitions 1,2; load 2 adds 3,4,5 and re-runs with
    // PartitionDiffMode. Each load stamps `load_nr` via a transformer, so
    // "load 2 processed ONLY the new partitions" is itself hash-gated: had
    // it re-read partitions 1/2, their rows would carry load_nr=2 and the
    // DuckDB compare would fail. At 100 TB this mode is what keeps a daily
    // run proportional to the new partition, not the table.
    "q74_partition_diff_incremental" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q74").toString
      val orders = t(s, dir, "orders")
        .withColumn("prio", substring(col("o_orderpriority"), 1, 1))
      orders.where(col("prio").isin("1", "2"))
        .write.partitionBy("prio").parquet(s"$tmp/src")
      def cfg(loadNr: Int) =
        s"""dataObjects:
           |  src-orders: {type: parquet, path: $tmp/src, partitions: [prio]}
           |  dst-orders: {type: parquet, path: $tmp/dst, partitions: [prio]}
           |actions:
           |  load:
           |    type: copy
           |    inputId: src-orders
           |    outputId: dst-orders
           |    saveMode: append
           |    executionMode: {type: partitionDiff}
           |    transformers:
           |      - {type: additionalColumns, additionalColumns: {load_nr: "$loadNr"}}
           |    metadata: {feed: incr}
           |""".stripMargin
      core.PipelineRunner.run(cfg(1), s, feedSel = Some("incr"))
      orders.where(col("prio").isin("3", "4", "5"))
        .write.mode("append").partitionBy("prio").parquet(s"$tmp/src")
      core.PipelineRunner.run(cfg(2), s, feedSel = Some("incr"))
      s.read.parquet(s"$tmp/dst")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"),
          col("load_nr"), col("prio").cast("string").as("prio"))
    }),

    // The watermark variant (DataFrameIncrementalMode.scala:42-111): load 1
    // processes orders before 1995; load 2 sees the FULL table but the mode
    // reads max(o_orderdate) from the output and filters the input to rows
    // beyond it — a plain `where`, so it pushes down to the parquet scan.
    // Same load_nr stamping: re-processing an already-loaded row would flip
    // its stamp and fail the hash.
    "q74b_watermark_incremental" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q74b").toString
      val orders = t(s, dir, "orders")
      orders.where(col("o_orderdate") < lit("1995-01-01").cast("timestamp"))
        .write.parquet(s"$tmp/src")
      def cfg(loadNr: Int) =
        s"""dataObjects:
           |  src-orders: {type: parquet, path: $tmp/src}
           |  dst-orders: {type: parquet, path: $tmp/dst}
           |actions:
           |  load:
           |    type: copy
           |    inputId: src-orders
           |    outputId: dst-orders
           |    saveMode: append
           |    executionMode: {type: incremental, compareCol: o_orderdate}
           |    transformers:
           |      - {type: additionalColumns, additionalColumns: {load_nr: "$loadNr"}}
           |    metadata: {feed: incr}
           |""".stripMargin
      core.PipelineRunner.run(cfg(1), s, feedSel = Some("incr"))
      orders.write.mode("overwrite").parquet(s"$tmp/src")
      core.PipelineRunner.run(cfg(2), s, feedSel = Some("incr"))
      s.read.parquet(s"$tmp/dst")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"), col("load_nr"))
    }),

    // Excel codec under the oracle (the from-scratch JDK StAX xlsx writer+
    // parser, sources/Excel.scala): write a customer slice to a workbook and
    // read it back through the distributed binaryFile parse. The slice is
    // adversarial on purpose — nulls (empty <c/> cells), a synthesized string
    // with commas/quotes/XML-special chars (exercises inline-string escaping
    // both ways), and numeric columns whose types must survive the
    // cell-type-inference path (numeric cells → DOUBLE). Expected rows come
    // from the PARQUET source via DuckDB, so a symmetric write/read codec bug
    // can no longer cancel out like it could in the round-trip spec.
    "q75_excel_roundtrip" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q75").toString
      val slice = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"),
          concat(col("c_name"), lit(", \""), col("c_mktsegment"), lit("\" <&>")).as("tricky"),
          when(col("c_custkey") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"),
          col("c_nationkey"), col("c_acctbal"))
      val xl = sources.ExcelFileDataObject("q75_xl", s"$tmp/wb")
      xl.writeDataFrame(slice)
      xl.getDataFrame()
    }),

    // Avro write→append→read under the oracle (q68's pattern for the binary
    // formats): half of orders written Overwrite, the other half + tricky
    // rows (nulls, empty-vs-null strings, unicode, a sub-second timestamp)
    // Appended — gating the avro append drift check AND the value fidelity
    // of timestamps/doubles/strings through the avro codec against
    // DuckDB's read of the original parquet.
    "q76_avro_roundtrip" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      import scala.jdk.CollectionConverters._
      val tmp = java.nio.file.Files.createTempDirectory("graft_q76").toString
      // parquet timestamps (isAdjustedToUTC=false) surface as TIMESTAMP_NTZ
      // in Spark 4 and round-trip avro as local-timestamp-micros — the
      // declared schema must match or the read-side conversion rejects it
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType), StructField("o_orderdate", TimestampNTZType)))
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"))
      val tricky = s.createDataFrame(Seq[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(9000000001L, "é-ünïcode ✓", 1.25,
          java.time.LocalDateTime.of(2031, 5, 6, 7, 8, 9, 123000000)),
        org.apache.spark.sql.Row(9000000002L, "", -2.5, null),
        org.apache.spark.sql.Row(9000000003L, null, null, null)).asJava, schema)
      val avro = sources.AvroFileDataObject("q76_avro", s"$tmp/orders_avro", schema = Some(schema))
      avro.writeDataFrame(base.where(col("o_orderkey") % 2 === 0))
      avro.writeDataFrame(base.where(col("o_orderkey") % 2 === 1).unionByName(tricky),
        Seq.empty, Some(SdlSaveMode.Append))
      avro.getDataFrame()
    }),

    // Same hash gate for ORC (whose first direct spec in round 6 caught a
    // real missing-marker bug): overwrite + append-evolution — the appended
    // half drops c_acctbal and adds c_mktsegment, so the persisted union
    // schema must serve BOTH file generations on read.
    "q76b_orc_roundtrip" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q76b").toString
      val customer = t(s, dir, "customer")
      val orc = sources.OrcFileDataObject("q76b_orc", s"$tmp/cust_orc")
      orc.writeDataFrame(customer.where(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal")))
      orc.writeDataFrame(customer.where(col("c_custkey") % 2 === 1)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
        Seq.empty, Some(SdlSaveMode.Append))
      orc.getDataFrame()
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
    }),

    // JDBC write→MERGE INTO→read against embedded Derby, under the hash
    // gate (reference JdbcTableDataObject.scala:375-400 builds the same
    // temp-table + MERGE statement). Initial load = custkey ≤ 1000; the
    // merge feed (custkey > 500, acctbal+100, lowercased segment) updates
    // the 501–1000 overlap and inserts 1001+, with updateColumns
    // restricting the update to c_acctbal — so matched rows must keep
    // their ORIGINAL segment while inserted rows carry the feed's. Every
    // branch of the SQL builder lands in the final table DuckDB replays.
    "q77_jdbc_merge" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q77").toString
      val conn = core.JdbcConnection("q77_conn",
        s"jdbc:derby:$tmp/db;create=true", "org.apache.derby.jdbc.EmbeddedDriver")
      val obj = sources.JdbcTableDataObject("q77_jdbc",
        Table(None, "q77_cust", Some(Seq("c_custkey"))), conn)
      val customer = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      obj.writeDataFrame(customer.where(col("c_custkey") <= 1000),
        Seq.empty, Some(SdlSaveMode.Overwrite))
      val feed = customer.where(col("c_custkey") > 500)
        .withColumn("c_acctbal", col("c_acctbal") + lit(100.0))
        .withColumn("c_mktsegment", lower(col("c_mktsegment")))
      obj.mergeDataFrame(feed, Seq("c_custkey"),
        SaveModeMergeOptions(updateColumns = Seq("c_acctbal")))
      obj.getDataFrame()
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
    }),

    // The DISTRIBUTED connected-components path under the oracle: q33's
    // chain graph with localThreshold=0, so the iterative min-label
    // propagation — the code that actually runs when a 100 TB corpus's
    // pair graph exceeds the driver-side union-find gate — is hash-gated
    // against the same recursive-CTE DuckDB oracle, not just
    // spec-cross-checked against the local path.
    "q78_distributed_components" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val maxId = docs.agg(max(col("doc_id"))).collect().head.getLong(0)
      val pairs = docs.where(col("doc_id") > 0 && col("doc_id") * 2 <= maxId)
        .select(col("doc_id").as("id_a"), (col("doc_id") * 2).as("id_b"))
      graft.functions.Dedup.duplicateClusters(pairs, localThreshold = 0L)
        .select(col("id").as("doc_id"), col("cluster_id"))
    }),

    // Event-time tumbling windows with watermark driven as a REAL stream
    // (beyond-reference: SURVEY §2.6 notes the reference drops late data) —
    // file stream source → EventTimeWindowTransformer → parquet sink,
    // Trigger.AvailableNow. Append mode only emits windows the watermark
    // has passed, so the trailing window (end > max event time) is withheld
    // in state — the DuckDB oracle reproduces exactly that semantics with
    // time_bucket + the max(ts) cutoff.
    "q79_event_time_windows" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q79").toString
      java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$tmp/src"))
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$tmp/src/events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val src = sources.ParquetFileDataObject("q79_src", s"$tmp/src")
      val dst = sources.ParquetFileDataObject("q79_dst", s"$tmp/out")
      val sdf0 = src.getStreamingDataFrame(Map.empty, Some(schema))
      val sdf = graft.core.EventTime.normalize(sdf0, "ts")
      val windowed = graft.streaming.EventTimeWindowTransformer(
        eventTimeColumn = "ts", windowDuration = "1 hour",
        watermarkDuration = "0 seconds", groupByColumns = Seq("event_type"),
        aggExpressions = Map(
          "n_events" -> "count(*)",
          "sum_value" -> "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"))
        .transform(sdf)
      // stateful sizing: 8 state-store partitions suffice (same knob as
      // q79c/q87 — a real stateful deployment sets this deliberately)
      val prevSp = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = dst.writeStreamingDataFrame(windowed,
          org.apache.spark.sql.streaming.Trigger.AvailableNow(),
          Map.empty, s"$tmp/cp", "q79_stream")
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevSp)
      dst.getDataFrame()
    }),

    // The SYNCHRONOUS SparkStreamingMode loop (q79's sibling): the same
    // event-time window aggregation, executed as THREE Trigger.Once DAG
    // runs through the config-parsed runner over a three-way time-split
    // source. Append-mode emission lags one data-bearing run (batch N
    // evicts with the watermark derived from batch N-1's data; a restarted
    // Trigger.Once query with no new data runs no flush batch), so after
    // ingesting f1|f2|f3 the sink holds exactly the windows closed by f2's
    // max event time — the oracle encodes that lag precisely. Exercises
    // watermark/state persistence across query RESTARTS, which the
    // single-query q79 never does.
    "q79c_sync_stream_loop" -> ((s, dir) => {
      // stateful-streaming sizing: the state store instantiates one store
      // per shuffle partition PER RUN (3 restarts here); 8 partitions hold
      // this SF's windowed state comfortably and cut the fixed overhead —
      // the knob a real deployment would set on a stateful job anyway
      val prevSp = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q79c").toString
      java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$tmp/src"))
      val ev = s.read.parquet(s"$dir/events.parquet")
      def stage(df: DataFrame, name: String): Unit = {
        val st = s"$tmp/stage_$name"
        df.coalesce(1).write.parquet(st)
        val part = new java.io.File(st).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$tmp/src/$name.parquet"))
      }
      val (cut1, cut2) = ("2024-01-11 00:00:00", "2024-01-21 00:00:00")
      stage(ev.where(col("ts") < lit(cut1)), "f1")
      val cfg =
        s"""dataObjects:
           |  s79c:
           |    type: parquet
           |    path: $tmp/src
           |    schema: "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, value double, props string"
           |  d79c: {type: parquet, path: $tmp/out}
           |actions:
           |  win79c:
           |    type: copy
           |    inputId: s79c
           |    outputId: d79c
           |    executionMode: {type: streaming, checkpointLocation: $tmp/cp, triggerType: Once}
           |    transformers:
           |      - type: eventTimeWindow
           |        eventTimeColumn: ts
           |        windowDuration: 1 hour
           |        watermarkDuration: 0 seconds
           |        groupByColumns: [event_type]
           |        aggExpressions:
           |          n_events: "count(*)"
           |          sum_value: "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"
           |    metadata: {feed: q79c}
           |""".stripMargin
      core.PipelineRunner.run(cfg, s, feedSel = Some("q79c"))
      stage(ev.where(col("ts") >= lit(cut1) && col("ts") < lit(cut2)), "f2")
      core.PipelineRunner.run(cfg, s, feedSel = Some("q79c"))
      stage(ev.where(col("ts") >= lit(cut2)), "f3")
      core.PipelineRunner.run(cfg, s, feedSel = Some("q79c"))
      s.read.parquet(s"$tmp/out")
        .select(col("event_type"), col("n_events"), col("sum_value"),
          col("window_start"), col("window_end"))
      } finally s.conf.set("spark.sql.shuffle.partitions", prevSp)
    }),

    // Session windows (gap-based) on the same transformer's batch path —
    // identical code to the streaming shape minus the watermark. DuckDB
    // reproduces with islands logic: a session breaks where the gap to the
    // previous event is ≥ 30 minutes; window_end = last event + gap.
    "q79b_session_windows" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val ev = t(s, dir, "events").select(col("user_id"), col("ts"), col("value"))
      graft.streaming.SessionWindowTransformer(
        eventTimeColumn = "ts", gapDuration = "30 minutes",
        groupByColumns = Seq("user_id"),
        aggExpressions = Map(
          "n_events" -> "count(*)",
          "sum_value" -> "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"))
        .transform(ev)
    }),

    // XML round-trip under the oracle (Spark 4 built-in xml source, q68's
    // pattern): entity escaping both ways (<>&'"), unicode, embedded
    // newline, and a null element (omitted on write, null on read) against
    // the parquet-derived expected rows.
    "q80_xml_roundtrip" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      import scala.jdk.CollectionConverters._
      val tmp = java.nio.file.Files.createTempDirectory("graft_q80").toString
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType), StructField("note", StringType)))
      val tricky = s.createDataFrame(Seq[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(9001, "<angle & amp>", 90, "quote \" and 'single'"),
        org.apache.spark.sql.Row(9002, "é-ünïcode ✓", 91, "line one\nline two"),
        org.apache.spark.sql.Row(9003, null, 92, null)).asJava, schema)
      val data = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
          concat(col("n_name"), lit(" <&> ")).as("note"))
        .unionByName(tricky)
      val xml = sources.XmlFileDataObject("q80_xml", s"$tmp/nation_xml",
        rowTag = "nation", schema = Some(schema),
        // faithful round-trip: the reader trims element whitespace by
        // default, which would drop the planted trailing space
        xmlOptions = Map("ignoreSurroundingSpaces" -> "false"))
      xml.writeDataFrame(data)
      xml.getDataFrame()
    }),

    // RelaxedCsvFileDataObject under the oracle: two file generations with
    // DIFFERENT headers in one directory — one missing n_regionkey, one
    // missing n_name but carrying an extra column — read through the
    // per-distinct-header scan; missing columns null-fill, extra columns
    // drop against the fixed schema.
    "q81_relaxed_csv_headers" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q81").toString
      val nation = t(s, dir, "nation")
      def stageCsv(df: DataFrame, sub: String, out: String): Unit = {
        df.coalesce(1).write.option("header", "true").csv(s"$tmp/$sub")
        val part = new java.io.File(s"$tmp/$sub").listFiles()
          .find(f => f.getName.endsWith(".csv")).get
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/mixed"))
        java.nio.file.Files.copy(part.toPath,
          java.nio.file.Paths.get(s"$tmp/mixed/$out"))
      }
      stageCsv(nation.select(col("n_nationkey"), col("n_name")), "g1", "gen1.csv")
      stageCsv(nation.select(col("n_nationkey"), col("n_regionkey"),
        lit("x").as("extra")), "g2", "gen2.csv")
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      sources.RelaxedCsvFileDataObject("q81_relaxed", s"$tmp/mixed",
        schema = Some(schema)).getDataFrame()
    }),

    // FileIncrementalMoveMode under the oracle (reference
    // FileIncrementalMoveMode.scala): load 1 ingests generation 1 and the
    // mode CONSUMES the source files after the write; generation 2 lands;
    // load 2 sees only it. The load_nr stamp hash-encodes exactly-once file
    // processing: had the move failed, load 2 would re-ingest generation 1
    // and those rows would appear under both stamps, failing rows+hash. At
    // 100 TB this is the landing-zone pattern — each run's cost follows the
    // files that arrived, not the archive.
    "q82_file_move_incremental" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q82").toString
      val nation = t(s, dir, "nation")
      def cfg(loadNr: Int) =
        s"""dataObjects:
           |  lz: {type: parquet, path: $tmp/src}
           |  ing: {type: parquet, path: $tmp/dst}
           |actions:
           |  ingest:
           |    type: copy
           |    inputId: lz
           |    outputId: ing
           |    saveMode: append
           |    executionMode: {type: fileMove}
           |    transformers:
           |      - {type: additionalColumns, additionalColumns: {load_nr: "$loadNr"}}
           |    metadata: {feed: mv}
           |""".stripMargin
      nation.where(col("n_nationkey") < 12).write.parquet(s"$tmp/src")
      core.PipelineRunner.run(cfg(1), s, feedSel = Some("mv"))
      nation.where(col("n_nationkey") >= 12).write.parquet(s"$tmp/src")
      core.PipelineRunner.run(cfg(2), s, feedSel = Some("mv"))
      s.read.parquet(s"$tmp/dst")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"), col("load_nr"))
    }),

    // DataObjectStateIncrementalMode under the oracle (reference
    // DataObjectStateIncrementalMode.scala:31-60): two STATEFUL CLI runs
    // sharing a state path. Load 1 reads everything and postExec advances
    // the source's mod-time watermark into the run state; load 2 restores
    // it and its scan carries `modifiedAfter`, so only generation-2 files
    // are read — unlike q82 the source is never mutated, the increment
    // lives entirely in the persisted state.
    "q83_state_incremental" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q83").toString
      val nation = t(s, dir, "nation")
      def cfg(loadNr: Int) =
        s"""dataObjects:
           |  src83: {type: parquet, path: $tmp/src}
           |  dst83: {type: parquet, path: $tmp/dst}
           |actions:
           |  load:
           |    type: copy
           |    inputId: src83
           |    outputId: dst83
           |    saveMode: append
           |    executionMode: {type: stateIncremental}
           |    transformers:
           |      - {type: additionalColumns, additionalColumns: {load_nr: "$loadNr"}}
           |    metadata: {feed: st}
           |""".stripMargin
      def runLoad(loadNr: Int): Unit = {
        val cfgPath = s"$tmp/pipeline_$loadNr.conf"
        java.nio.file.Files.writeString(java.nio.file.Paths.get(cfgPath), cfg(loadNr))
        app.GraftApp.run(app.GraftApp.CliArgs(configPaths = Seq(cfgPath),
          feedSel = Some("st"), statePath = Some(s"$tmp/state"), appName = "q83"), s)
      }
      nation.where(col("n_nationkey") < 12).write.parquet(s"$tmp/src")
      runLoad(1)
      nation.where(col("n_nationkey") >= 12).write.mode("append").parquet(s"$tmp/src")
      runLoad(2)
      s.read.parquet(s"$tmp/dst")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"), col("load_nr"))
    }),

    // HiveTableDataObject under the oracle (reference HiveTableDataObject
    // .scala + HiveUtil.scala:69-138): two config-driven loads into a
    // PARTITIONED catalog table. Load 2's feed drops c_acctbal and adds
    // c_nationkey, so the append must evolve the table (ALTER TABLE ADD
    // COLUMNS) — old rows read the new column as null and the drifted feed
    // null-fills the dropped one. The load_nr stamp hash-gates exactly-once
    // processing through the catalog read path.
    "q84_hive_evolution" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q84").toString
      // idempotency across Verify runs: the warehouse dir persists on disk
      // even though the in-memory catalog is fresh per session
      s.sql("DROP TABLE IF EXISTS q84_cust")
      val wh = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "q84_cust")
      val whFs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (whFs.exists(wh)) whFs.delete(wh, true)
      val customer = t(s, dir, "customer")
      def cfg(loadNr: Int) =
        s"""dataObjects:
           |  src84: {type: parquet, path: $tmp/src}
           |  tbl84: {type: hive, table: {name: q84_cust}, partitions: [c_mktsegment]}
           |actions:
           |  load:
           |    type: copy
           |    inputId: src84
           |    outputId: tbl84
           |    saveMode: append
           |    transformers:
           |      - {type: additionalColumns, additionalColumns: {load_nr: "$loadNr"}}
           |    metadata: {feed: hv}
           |""".stripMargin
      customer.where(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
        .write.parquet(s"$tmp/src")
      core.PipelineRunner.run(cfg(1), s, feedSel = Some("hv"))
      customer.where(col("c_custkey") % 2 =!= 0)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"))
        .write.mode("overwrite").parquet(s"$tmp/src")
      core.PipelineRunner.run(cfg(2), s, feedSel = Some("hv"))
      s.table("q84_cust").select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_nationkey"), col("c_mktsegment"), col("load_nr"))
    }),

    // Tick-tock swap under the oracle (reference TickTockHiveTableDataObject
    // .scala:94-173): two appends through the alternating tick/tock commit
    // protocol — load 2 READS the committed side while WRITING the inactive
    // one, then flips the marker and re-points the catalog (ALTER SET
    // LOCATION semantics). The final state is read through the CATALOG
    // table, so the hash gates that the swap re-pointed to exactly the
    // committed generation; both side directories must exist (alternation
    // actually happened).
    "q85_ticktock_swap" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q85").toString
      s.sql("DROP TABLE IF EXISTS q85_tt")
      val nation = t(s, dir, "nation")
      def cfg(loadNr: Int) =
        s"""dataObjects:
           |  src85: {type: parquet, path: $tmp/src}
           |  tt85: {type: tickTock, basePath: $tmp/tt, table: {name: q85_tt}}
           |actions:
           |  load:
           |    type: copy
           |    inputId: src85
           |    outputId: tt85
           |    saveMode: append
           |    transformers:
           |      - {type: additionalColumns, additionalColumns: {load_nr: "$loadNr"}}
           |    metadata: {feed: tt}
           |""".stripMargin
      nation.where(col("n_nationkey") < 12).write.parquet(s"$tmp/src")
      core.PipelineRunner.run(cfg(1), s, feedSel = Some("tt"))
      nation.where(col("n_nationkey") >= 12).write.mode("overwrite").parquet(s"$tmp/src")
      core.PipelineRunner.run(cfg(2), s, feedSel = Some("tt"))
      require(new java.io.File(s"$tmp/tt/tick").exists() &&
        new java.io.File(s"$tmp/tt/tock").exists(),
        "tick-tock must have written BOTH alternating sides")
      s.table("q85_tt")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"), col("load_nr"))
    }),

    // Housekeeping archive+compaction under the oracle (reference
    // HousekeepingMode.scala:49-151, CompactionUtil.scala): the write lands
    // 6 files per partition (numberOfTasksPerPartition), then housekeeping
    // re-bins priorities 1-2 into an 'X' archive partition and compacts
    // EVERY partition to one file. The hash gates byte-identical data
    // through the re-bin; the file-count assertions gate that compaction
    // actually compacted (1 data file per partition dir) and that the
    // archived source partitions are gone.
    "q86_housekeeping_compaction" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q86").toString
      val orders = t(s, dir, "orders")
        .withColumn("prio", substring(col("o_orderpriority"), 1, 1))
      orders.write.partitionBy("prio").parquet(s"$tmp/src")
      val cfg =
        s"""dataObjects:
           |  src86: {type: parquet, path: $tmp/src, partitions: [prio]}
           |  dst86:
           |    type: parquet
           |    path: $tmp/dst
           |    partitions: [prio]
           |    numberOfTasksPerPartition: 6
           |    housekeepingMode:
           |      type: archiveCompaction
           |      archiveCondition: "prio <= '2'"
           |      archiveExpression: "named_struct('prio', 'X')"
           |      compactCondition: "true"
           |      compactNumFiles: 1
           |actions:
           |  load: {type: copy, inputId: src86, outputId: dst86, metadata: {feed: hk}}
           |""".stripMargin
      core.PipelineRunner.run(cfg, s, feedSel = Some("hk"))
      val partDirs = new java.io.File(s"$tmp/dst").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("prio="))
      val names = partDirs.map(_.getName).sorted.toSeq
      require(names == Seq("prio=3", "prio=4", "prio=5", "prio=X"),
        s"archive must re-bin prio 1-2 into X, got $names")
      partDirs.foreach { d =>
        val n = d.listFiles().count(_.getName.endsWith(".parquet"))
        require(n == 1, s"compaction must leave 1 data file in ${d.getName}, found $n")
      }
      s.read.parquet(s"$tmp/dst")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"),
          col("prio").cast("string").as("prio"))
    }),

    // Streaming dedup under the oracle: dropDuplicatesWithinWatermark
    // through a real multi-micro-batch stream (maxFilesPerTrigger=1,
    // AvailableNow). Batch 2 (a dup of the max-ts event — dropped) exists
    // to TRIGGER state eviction: Spark evicts expired keys at the END of a
    // batch, so a replay surfaces only two batches after its original.
    // Batch 3 replays every event_id % 10 == 0 key shifted +31 days: keys
    // whose ORIGINAL event time is inside the watermark horizon
    // (ts >= max(ts) - 2×2h) are still in state and drop as duplicates;
    // older keys' state was evicted and the replay SURVIVES. The hash
    // encodes exactly the watermark-bounded state retention that makes
    // streaming dedup viable on an unbounded stream (state ∝ horizon,
    // not ∝ keys ever seen).
    "q87_streaming_dedup" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q87").toString
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      // +31 days clears the 30-day event span, so no replay is filtered as
      // late data by the batch-3 watermark — survival is decided purely by
      // state eviction
      val replays = ev.where(col("event_id") % 10 === 0)
        .withColumn("ts", col("ts") + expr("INTERVAL 31 DAYS"))
      // the file source orders batches by modification time — stamp them
      // explicitly rather than sleeping between writes
      def addFile(df: DataFrame, stage: String, name: String, mtime: Long): Unit = {
        df.coalesce(1).write.parquet(s"$tmp/$stage")
        val part = new java.io.File(s"$tmp/$stage").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(s"$tmp/src/$name"))
        require(new java.io.File(s"$tmp/src/$name").setLastModified(mtime),
          s"cannot stamp mtime on $name")
      }
      java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$tmp/src"))
      val t0 = System.currentTimeMillis() - 60000
      addFile(ev, "b1", "batch1.parquet", t0)
      addFile(ev.orderBy(desc("ts")).limit(1), "b2", "batch2.parquet", t0 + 2000)
      addFile(replays, "b3", "batch3.parquet", t0 + 4000)
      val src = sources.ParquetFileDataObject("q87_src", s"$tmp/src")
      val dst = sources.ParquetFileDataObject("q87_dst", s"$tmp/out")
      val sdf = src.getStreamingDataFrame(Map("maxFilesPerTrigger" -> "1"), Some(ev.schema))
      val deduped = graft.streaming.StreamingDedupTransformer(Seq("event_id"),
        eventTimeColumn = Some("ts"), withinWatermark = Some("2 hours")).transform(sdf)
      // stateful sizing: one state store per shuffle partition per micro-
      // batch (3 batches here) — 8 partitions suffice for this key space
      // and cut the fixed store-init/commit overhead (same knob as q79c)
      val prevSp = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = dst.writeStreamingDataFrame(deduped,
          org.apache.spark.sql.streaming.Trigger.AvailableNow(),
          Map.empty, s"$tmp/cp", "q87_stream")
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevSp)
      dst.getDataFrame()
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
    }),

    // JSON round-trip + append-evolution under the oracle (the last major
    // in-env spec-only source): strings full of JSON metacharacters
    // (quotes, backslash, embedded newline, unicode — the writer must
    // escape, the reader must unescape), a null-struct-field row, a nested
    // struct and an array with a null element (JSON's native shapes), and
    // a second appended generation that drops c_acctbal/tags and adds
    // c_mktsegment — the persisted union schema serves both generations on
    // read. Flattened for the gate like q67.
    "q88_json_roundtrip" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q88").toString
      val customer = t(s, dir, "customer")
      val json = sources.JsonFileDataObject("q88_json", s"$tmp/cust_json")
      json.writeDataFrame(customer.where(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 50 === 0, lit(null).cast("string"))
            .otherwise(concat(col("c_name"), lit(" \"quoted\" \\ é✓\nnewline")))
            .as("c_name"),
          col("c_acctbal"),
          struct(col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"))
            .as("profile"),
          array(col("c_custkey"), col("c_nationkey").cast("long"),
            lit(null).cast("long")).as("tags")))
      json.writeDataFrame(customer.where(col("c_custkey") % 2 === 1)
        .select(col("c_custkey"), col("c_name"),
          struct(col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"))
            .as("profile"),
          col("c_mktsegment")),
        Seq.empty, Some(SdlSaveMode.Append))
      json.getDataFrame()
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("profile.nation").as("p_nation"), col("profile.segment").as("p_segment"),
          element_at(col("tags"), 1).as("tag1"), element_at(col("tags"), 3).as("tag3"),
          col("c_mktsegment"))
    }),

    // CustomDataFrameAction N:M under the oracle: a config pipeline whose
    // single action reads TWO inputs and produces TWO outputs through the
    // outputSql surface (SQLDfsTransformer) — the reference's many-to-many
    // workhorse, previously spec-only. Both written outputs are read back
    // and union-tagged into one gated frame, so each output's values (and
    // the N:M wiring between them) are hash-checked.
    "q89_custom_dfs_action" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q89").toString
      val cfg =
        s"""dataObjects:
           |  src-ord: {type: parquet, path: $dir/orders.parquet}
           |  src-cust: {type: parquet, path: $dir/customer.parquet}
           |  out-seg: {type: parquet, path: $tmp/seg}
           |  out-top: {type: parquet, path: $tmp/top}
           |actions:
           |  fanout:
           |    type: customDataFrame
           |    inputIds: [src-ord, src-cust]
           |    outputIds: [out-seg, out-top]
           |    saveMode: overwrite
           |    outputSql:
           |      out-seg: "select c.c_mktsegment, count(*) as n_orders, cast(sum(cast(o.o_totalprice as decimal(18,2))) as double) as total from src_ord o join src_cust c on o.o_custkey = c.c_custkey group by c.c_mktsegment"
           |      out-top: "select o_custkey, count(*) as n_orders from src_ord group by o_custkey having count(*) >= 15"
           |    metadata: {feed: q89}
           |""".stripMargin
      core.PipelineRunner.run(cfg, s, feedSel = Some("q89"))
      s.read.parquet(s"$tmp/seg")
        .select(lit("seg").as("part"), col("c_mktsegment").as("k"),
          col("n_orders").cast("long").as("n_orders"), col("total"))
        .unionByName(s.read.parquet(s"$tmp/top")
          .select(lit("top").as("part"), col("o_custkey").cast("string").as("k"),
            col("n_orders").cast("long").as("n_orders"),
            lit(null).cast("double").as("total")))
    }),

    // File-level actions under the oracle: nation staged as CSV, then a
    // config-parsed FileTransferAction (raw dir copy), a config-parsed
    // CustomScriptAction (awk keeps even nationkeys — a real subprocess),
    // and a programmatic CustomFileAction whose per-file stream transform
    // rewrites the delimiter comma→pipe; the final read parses with the
    // new delimiter. Any action corrupting bytes, dropping files, or
    // breaking the chain's ordering breaks the hash.
    "q90_file_actions" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q90").toString
      val csvOpts = "{header: \"true\"}"
      sources.CsvFileDataObject("q90_a", s"$tmp/a", csvOptions = Map("header" -> "true"))
        .writeDataFrame(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey")))
      val script = s"""mkdir -p $tmp/c && for f in $tmp/b/part-*.csv; do """ +
        s"""awk -F, 'NR == 1 || $$1 % 2 == 0' "$$f" > $tmp/c/$$(basename "$$f"); done"""
      val cfg =
        s"""dataObjects:
           |  fa: {type: csv, path: $tmp/a, csvOptions: $csvOpts}
           |  fb: {type: csv, path: $tmp/b, csvOptions: $csvOpts}
           |  fc: {type: csv, path: $tmp/c, csvOptions: $csvOpts}
           |actions:
           |  transfer: {type: fileTransfer, inputId: fa, outputId: fb, metadata: {feed: q90}}
           |  filter:
           |    type: script
           |    cmd:
           |      - bash
           |      - -c
           |      - >-
           |        $script
           |    inputIds: [fb]
           |    outputIds: [fc]
           |    metadata: {feed: q90}
           |""".stripMargin
      core.PipelineRunner.run(cfg, s, feedSel = Some("q90"))
      graft.operators.CustomFileAction("q90_pipe", "fc_obj", "fd_obj",
        transformFn = (in, out) => {
          val bytes = in.readAllBytes()
          out.write(bytes.map(b => if (b == ','.toByte) '|'.toByte else b))
        }).exec(Seq(SubFeed("fc_obj")))(ActionPipelineContext(s,
          new core.InstanceRegistry()
            .register(sources.CsvFileDataObject("fc_obj", s"$tmp/c"))
            .register(sources.CsvFileDataObject("fd_obj", s"$tmp/d"))))
      sources.CsvFileDataObject("q90_d", s"$tmp/d",
        csvOptions = Map("header" -> "true", "delimiter" -> "|")).getDataFrame()
        .select(col("n_nationkey").cast("int"), col("n_name"),
          col("n_regionkey").cast("int"))
    }),

    // Diamond DAG under the oracle: one source fans out to two parallel
    // branch actions (different filters, each stamping its branch tag),
    // then an N:1 CustomDataFrameAction unions them — the parallel-branch
    // result propagation previously covered only by specs. The
    // dependency-triggered scheduler runs the branches concurrently; the
    // hash gates that both branches' rows (and only those) reach the sink.
    "q91_diamond_union" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q91").toString
      val cfg =
        s"""dataObjects:
           |  src91: {type: parquet, path: $dir/lineitem.parquet}
           |  br-a: {type: parquet, path: $tmp/a}
           |  br-b: {type: parquet, path: $tmp/b}
           |  out91: {type: parquet, path: $tmp/out}
           |actions:
           |  branch-a:
           |    type: copy
           |    inputId: src91
           |    outputId: br-a
           |    saveMode: overwrite
           |    transformers:
           |      - {type: filter, filterClause: "l_returnflag = 'R' and l_quantity >= 45"}
           |      - {type: additionalColumns, additionalColumns: {branch: "'A'"}}
           |    metadata: {feed: q91}
           |  branch-b:
           |    type: copy
           |    inputId: src91
           |    outputId: br-b
           |    saveMode: overwrite
           |    transformers:
           |      - {type: filter, filterClause: "l_returnflag = 'N' and l_linenumber = 1 and l_discount >= 0.09"}
           |      - {type: additionalColumns, additionalColumns: {branch: "'B'"}}
           |    metadata: {feed: q91}
           |  merge91:
           |    type: customDataFrame
           |    inputIds: [br-a, br-b]
           |    outputIds: [out91]
           |    saveMode: overwrite
           |    outputSql:
           |      out91: "select l_orderkey, l_linenumber, l_quantity, l_returnflag, branch from br_a union all select l_orderkey, l_linenumber, l_quantity, l_returnflag, branch from br_b"
           |    metadata: {feed: q91}
           |""".stripMargin
      core.PipelineRunner.run(cfg, s, feedSel = Some("q91"))
      s.read.parquet(s"$tmp/out")
    }),

    // PartitionRetentionMode under the oracle (q86's sibling — the other
    // housekeeping mode): a partitioned write whose housekeepingMode
    // deletes expired partitions after the load; the read-back hash proves
    // retention removed exactly the expired partitions' rows and left the
    // kept partitions byte-identical.
    "q92_partition_retention" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q92").toString
      val cfg =
        s"""dataObjects:
           |  src92: {type: parquet, path: $dir/orders.parquet}
           |  dst92:
           |    type: parquet
           |    path: $tmp/dst
           |    partitions: [prio]
           |    housekeepingMode: {type: retention, retentionCondition: "prio >= '3'"}
           |actions:
           |  load92:
           |    type: copy
           |    inputId: src92
           |    outputId: dst92
           |    saveMode: overwrite
           |    transformers:
           |      - {type: sql, sql: "select *, substring(o_orderpriority, 1, 1) as prio from %{inputViewName}"}
           |    metadata: {feed: q92}
           |""".stripMargin
      core.PipelineRunner.run(cfg, s, feedSel = Some("q92"))
      val names = new java.io.File(s"$tmp/dst").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("prio="))
        .map(_.getName).sorted.toSeq
      require(names == Seq("prio=3", "prio=4", "prio=5"),
        s"retention must delete prio 1-2, got $names")
      s.read.parquet(s"$tmp/dst")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("prio").cast("string").as("prio"))
    }),

    // WebserviceFileDataObject through a REAL loopback HTTP round-trip: a
    // JDK HttpServer serves the nation table as JSON keyed by a `region`
    // query parameter; the DataObject issues one basic-auth GET per
    // partition value through the real JavaHttpTransport (JDK HttpClient)
    // and unions the parsed pages. The hash gates auth headers, query-param
    // fanout, JSON decode, and the partition-value result column end-to-end
    // — upgrading the webservice row from injected-fake specs to the oracle.
    "q93_webservice_http" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      def js(v: String): String = "\"" + v.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case ch => ch.toString } + "\""
      // 25 rows — control-plane volume, same shape as a real REST payload
      val byRegion = t(s, dir, "nation")
        .select(col("n_nationkey").cast("int"), col("n_name"),
          col("n_regionkey").cast("int"))
        .collect().groupBy(_.getInt(2)).map { case (r, rows) =>
          r.toString -> rows.sortBy(_.getInt(0)).map(row =>
            s"""{"n_nationkey":${row.getInt(0)},"n_name":${js(row.getString(1))},"n_regionkey":${row.getInt(2)}}""")
            .mkString("[", ",", "]")
        }
      val expectAuth = "Basic " + java.util.Base64.getEncoder
        .encodeToString("graft:s3cret".getBytes("UTF-8"))
      val server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/nation", { exchange: com.sun.net.httpserver.HttpExchange =>
        val authed = Option(exchange.getRequestHeaders.getFirst("Authorization"))
          .contains(expectAuth)
        val region = Option(exchange.getRequestURI.getQuery).toSeq
          .flatMap(_.split("&"))
          .collectFirst { case kv if kv.startsWith("region=") => kv.drop(7) }
        if (!authed) exchange.sendResponseHeaders(401, -1)
        else {
          val body = region.flatMap(byRegion.get).getOrElse("[]").getBytes("UTF-8")
          exchange.sendResponseHeaders(200, body.length.toLong)
          exchange.getResponseBody.write(body)
        }
        exchange.close()
      })
      server.start()
      try {
        val port = server.getAddress.getPort
        sources.WebserviceFileDataObject("q93_ws", s"http://127.0.0.1:$port/nation",
          authMode = sources.BasicAuthMode("graft", "s3cret"),
          queryParameters = Map("region" -> (0 to 4).map(_.toString)),
          schema = Some(StructType(Seq(
            StructField("n_nationkey", IntegerType),
            StructField("n_name", StringType),
            StructField("n_regionkey", IntegerType)))))
          .getDataFrame()
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
            col("region"))
      } finally server.stop(0)
    }),

    // ODataDataObject against a REAL paginated loopback endpoint: the JDK
    // HttpServer serves the customer table in 100-row pages chained by
    // `@odata.nextLink`; the DataObject follows the links until exhausted.
    // A request counter proves pagination actually engaged (≥2 pages), and
    // the hash proves every page arrived exactly once.
    "q94_odata_pagination" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      def js(v: String): String = "\"" + v.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case ch => ch.toString } + "\""
      val rows = t(s, dir, "customer")
        .select(col("c_custkey").cast("long"), col("c_name"), col("c_acctbal"),
          col("c_mktsegment"))
        .collect().sortBy(_.getLong(0)).map(r =>
          s"""{"c_custkey":${r.getLong(0)},"c_name":${js(r.getString(1))},"c_acctbal":${r.getDouble(2)},"c_mktsegment":${js(r.getString(3))}}""")
      // 1000-row pages (capped at half the table so the ≥2-page assert
      // below holds at every SF): at sf0.1 that's 15 sequential
      // round-trips instead of the 150 the round-9 bench flagged as the
      // suite's most expensive fixture (6.78 s).
      val pageSize = math.max(1, math.min(1000, (rows.length + 1) / 2))
      val requests = new java.util.concurrent.atomic.AtomicInteger(0)
      val server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/odata/Customers", { exchange: com.sun.net.httpserver.HttpExchange =>
        requests.incrementAndGet()
        val skip = Option(exchange.getRequestURI.getQuery).toSeq
          .flatMap(_.split("&"))
          .collectFirst { case kv if kv.startsWith("skip=") => kv.drop(5).toInt }
          .getOrElse(0)
        val page = rows.slice(skip, skip + pageSize)
        val nextLink =
          if (skip + pageSize < rows.length)
            s""","@odata.nextLink":"http://127.0.0.1:${server.getAddress.getPort}/odata/Customers?skip=${skip + pageSize}""""
          else ""
        val body = s"""{"value":${page.mkString("[", ",", "]")}$nextLink}""".getBytes("UTF-8")
        exchange.sendResponseHeaders(200, body.length.toLong)
        exchange.getResponseBody.write(body)
        exchange.close()
      })
      server.start()
      try {
        val port = server.getAddress.getPort
        val df = sources.ODataDataObject("q94_od", s"http://127.0.0.1:$port/odata",
          "Customers",
          schema = Some(StructType(Seq(
            StructField("c_custkey", LongType),
            StructField("c_name", StringType),
            StructField("c_acctbal", DoubleType),
            StructField("c_mktsegment", StringType)))))
          .getDataFrame()
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("c_mktsegment"))
        require(requests.get() >= 2,
          s"pagination must span multiple pages, served ${requests.get()} request(s)")
        df
      } finally server.stop(0)
    }),

    // AirbyteDataObject through a REAL subprocess speaking the Airbyte
    // protocol on stdout: RECORD lines for two streams interleaved with
    // LOG/CATALOG/STATE messages. The DataObject must keep exactly the
    // configured stream's records, ignore the noise, and capture the STATE
    // cursor — upgrading the airbyte row from fake-runner specs to the
    // oracle.
    "q95_airbyte_subprocess" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      def js(v: String): String = "\"" + v.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case ch => ch.toString } + "\""
      val lines = scala.collection.mutable.ArrayBuffer[String](
        """{"type":"LOG","log":{"level":"INFO","message":"starting sync"}}""",
        """{"type":"CATALOG","catalog":{"streams":[]}}""")
      t(s, dir, "supplier")
        .select(col("s_suppkey").cast("long"), col("s_name"),
          col("s_nationkey").cast("long"), col("s_acctbal").cast("double"))
        .collect().sortBy(_.getLong(0)).foreach { r =>
          lines += s"""{"type":"RECORD","record":{"stream":"suppliers","emitted_at":0,"data":{"s_suppkey":${r.getLong(0)},"s_name":${js(r.getString(1))},"s_nationkey":${r.getLong(2)},"s_acctbal":${r.getDouble(3)}}}}"""
        }
      // wrong-stream record + trailing STATE: must be filtered / captured
      lines += """{"type":"RECORD","record":{"stream":"other","emitted_at":0,"data":{"x":1}}}"""
      lines += """{"type":"STATE","state":{"cursor":"42"}}"""
      val f = java.nio.file.Files.createTempFile("graft_q95", ".jsonl")
      java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
      val obj = sources.AirbyteDataObject("q95_ab", Seq("cat", f.toString),
        streamName = "suppliers",
        schema = Some(StructType(Seq(
          StructField("s_suppkey", LongType),
          StructField("s_name", StringType),
          StructField("s_nationkey", LongType),
          StructField("s_acctbal", DoubleType)))))
      val df = obj.getDataFrame()
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal"))
      require(obj.getState.contains("""{"cursor":"42"}"""),
        s"STATE cursor must be captured, got ${obj.getState}")
      df
    }),

    // CustomScriptAction as the MIDDLE of a copy→script→copy chain (q90's
    // script node only filters rows; this one TRANSFORMS content — awk
    // appends a derived column — so a script that corrupts, reorders or
    // drops fields breaks the hash). Chain: supplier parquet → copy #1
    // (whitelist 3 cols) to CSV → script derives key_mod = s_suppkey % 7 →
    // copy #2 parses the WIDENED csv back to parquet. The final read is
    // from copy #2's parquet output only.
    "q96_script_between_copies" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q96").toString
      val script = s"""mkdir -p $tmp/b && for f in $tmp/a/part-*.csv; do """ +
        s"""awk -F, 'NR == 1 {print $$0",key_mod"; next} {print $$0","($$1 % 7)}' "$$f" > $tmp/b/$$(basename "$$f"); done"""
      val cfg =
        s"""dataObjects:
           |  p96: {type: parquet, path: $dir/supplier.parquet}
           |  a96: {type: csv, path: $tmp/a, csvOptions: {header: "true"}}
           |  b96:
           |    type: csv
           |    path: $tmp/b
           |    csvOptions: {header: "true"}
           |    schema: "s_suppkey string, s_name string, s_nationkey string, key_mod string"
           |  o96: {type: parquet, path: $tmp/out}
           |actions:
           |  stage96:
           |    type: copy
           |    inputId: p96
           |    outputId: a96
           |    saveMode: overwrite
           |    transformers:
           |      - {type: whitelist, columnWhitelist: [s_suppkey, s_name, s_nationkey]}
           |    metadata: {feed: q96}
           |  derive96:
           |    type: script
           |    cmd:
           |      - bash
           |      - -c
           |      - >-
           |        $script
           |    inputIds: [a96]
           |    outputIds: [b96]
           |    metadata: {feed: q96}
           |  load96:
           |    type: copy
           |    inputId: b96
           |    outputId: o96
           |    saveMode: overwrite
           |    metadata: {feed: q96}
           |""".stripMargin
      core.PipelineRunner.run(cfg, s, feedSel = Some("q96"))
      s.read.parquet(s"$tmp/out")
        .select(col("s_suppkey").cast("long"), col("s_name"),
          col("s_nationkey").cast("int"), col("key_mod").cast("int"))
    }),

    // Kafka WIRE-FORMAT decode + offset-range batching, broker-free: the
    // supplier table is encoded into the exact frame schema the kafka
    // source emits (key/value binary, topic, partition, offset, timestamp;
    // value = JSON bytes), archived to parquet, and re-read through
    // KafkaTopicDataObject's real decode path — from_json value decode,
    // inclusive/exclusive/-1 offset-range semantics, and maxOffsets-style
    // batching (wireBatchSpecs splits the range into ≥2 chunks whose
    // specs feed the same starting/endingOffsets parser; the union of the
    // chunk reads must equal the single bounded read). The offset filter
    // is a plain predicate, so each chunk is a pushed-down parquet range
    // scan — the shape an offset-bounded archive re-process has at scale.
    "q97_kafka_wire_decode" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tmp = java.nio.file.Files.createTempDirectory("graft_q97").toString
      t(s, dir, "supplier")
        .select(col("s_suppkey").cast("long").as("k"), col("s_name"),
          col("s_acctbal").cast("double").as("s_acctbal"))
        .withColumn("partition", (col("k") % 3).cast("int"))
        .withColumn("offset",
          row_number().over(Window.partitionBy(col("partition")).orderBy(col("k")))
            .cast("long") - 1)
        .select(
          col("k").cast("string").cast("binary").as("key"),
          to_json(struct(col("k").as("s_suppkey"), col("s_name"), col("s_acctbal")))
            .cast("binary").as("value"),
          lit("q97").as("topic"), col("partition"), col("offset"),
          timestamp_seconds(lit(1704067200L) + col("offset")).as("timestamp"))
        .write.parquet(s"$tmp/wire")
      val archived = s.read.parquet(s"$tmp/wire")
      val obj = sources.KafkaTopicDataObject("q97_kafka", "q97", "broker-free:9092",
        valueType = "json",
        valueSchema = Some(StructType(Seq(
          StructField("s_suppkey", LongType), StructField("s_name", StringType),
          StructField("s_acctbal", DoubleType)))),
        startingOffsets = """{"q97":{"0":5,"2":3}}""",
        endingOffsets = """{"q97":{"0":30,"1":-1,"2":20}}""")
      // chunk size scaled to the table so ≥2 batches engage at every SF
      val specs = obj.wireBatchSpecs(archived,
        maxOffsets = math.max(1L, archived.count() / 6))
      require(specs.length >= 2, s"offset batching must engage, got ${specs.length} batch(es)")
      val chunks = specs.map { case (st, en) =>
        obj.copy(startingOffsets = st, endingOffsets = en).decodeWire(archived) }
      val whole = obj.decodeWire(archived)
      val out = chunks.reduce(_.unionByName(_))
      require(out.count() == whole.count(),
        "chunked reads must cover exactly the bounded range")
      out.select(col("key").cast("string").cast("long").as("key_suppkey"),
        col("value.s_suppkey").as("s_suppkey"), col("value.s_name").as("s_name"),
        col("value.s_acctbal").as("s_acctbal"),
        col("partition"), col("offset"))
    }),

    // Versioned table with a file-level transaction log (the from-scratch
    // stand-in for Delta/Iceberg time travel, in-env testable): overwrite
    // → append → MERGE upsert → OPTIMIZE compaction, then TIME-TRAVEL
    // reads of every version unioned under a version tag. The oracle
    // recomputes each historical state relationally; compaction must be
    // data-invariant (v2 and post-optimize latest hash identically).
    "q98_versioned_time_travel" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q98").toString
      val vt = sources.VersionedTableDataObject("q98_vt", s"$tmp/t",
        primaryKey = Seq("c_custkey"))
      val cust = t(s, dir, "customer").select(col("c_custkey").cast("long"),
        col("c_name"), col("c_acctbal").cast("double"))
      vt.writeDataFrame(cust.where(col("c_custkey") <= 1000))            // v0
      vt.writeDataFrame(cust.where(col("c_custkey") > 1000 && col("c_custkey") <= 1200),
        saveMode = Some(SdlSaveMode.Append))                             // v1
      val feed = cust.where(col("c_custkey") <= 1200 && col("c_custkey") % 10 === 0)
          .withColumn("c_acctbal", col("c_acctbal") + 100.0)
        .unionByName(cust.where(col("c_custkey") > 1200 && col("c_custkey") <= 1300))
      vt.mergeDataFrame(feed, Seq("c_custkey"))                          // v2
      vt.optimize(targetFileCount = 2)                                   // v3: same data
      def tag(v: Option[Int], label: String) =
        vt.getDataFrameAsOf(v).withColumn("version", lit(label))
      tag(Some(0), "v0").unionByName(tag(Some(1), "v1"))
        .unionByName(tag(Some(2), "v2")).unionByName(tag(None, "latest"))
    }),

    // KafkaStateIncrementalMode end-to-end (q97's sibling — the CONSUMER
    // side): two config-driven stateful runs over a growing wire archive.
    // Run 1 consumes everything available and commits end offsets to the
    // RunStateStore; more records land; run 2 (fresh process: fresh
    // registry, state restored from disk) consumes ONLY [committed, end).
    // The append sink holds every record exactly once — a re-read of
    // committed offsets would duplicate rows and break the hash, a gap
    // would lose rows. Exercises the new `kafka` config type +
    // `kafkaStateIncremental` mode through the CLI app's state plumbing.
    "q99_kafka_state_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tmp = java.nio.file.Files.createTempDirectory("graft_q99").toString
      val wire = t(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("k"), col("c_name"),
          col("c_acctbal").cast("double").as("c_acctbal"))
        .withColumn("partition", (col("k") % 4).cast("int"))
        .withColumn("offset",
          row_number().over(Window.partitionBy(col("partition")).orderBy(col("k")))
            .cast("long") - 1)
        .select(col("k").cast("string").cast("binary").as("key"),
          to_json(struct(col("k").as("c_custkey"), col("c_name"), col("c_acctbal")))
            .cast("binary").as("value"),
          lit("q99").as("topic"), col("partition"), col("offset"),
          timestamp_seconds(lit(1704067200L) + col("offset")).as("timestamp"))
      val cfg =
        s"""dataObjects:
           |  k99:
           |    type: kafka
           |    topic: q99
           |    valueType: json
           |    valueSchema: "c_custkey bigint, c_name string, c_acctbal double"
           |    archivePath: $tmp/arch
           |  dst99: {type: parquet, path: $tmp/out}
           |actions:
           |  consume:
           |    type: copy
           |    inputId: k99
           |    outputId: dst99
           |    saveMode: append
           |    executionMode: {type: kafkaStateIncremental}
           |    metadata: {feed: q99}
           |""".stripMargin
      val cfgPath = s"$tmp/pipeline.conf"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(cfgPath), cfg)
      def consume(): Unit = app.GraftApp.run(app.GraftApp.CliArgs(
        configPaths = Seq(cfgPath), feedSel = Some("q99"),
        statePath = Some(s"$tmp/state"), appName = "q99"), s)
      wire.where(col("offset") < 10).write.parquet(s"$tmp/arch")   // landing 1
      consume()
      wire.where(col("offset") >= 10).write.mode("append").parquet(s"$tmp/arch") // landing 2
      consume()
      s.read.parquet(s"$tmp/out")
        .select(col("value.c_custkey").as("c_custkey"),
          col("value.c_name").as("c_name"), col("value.c_acctbal").as("c_acctbal"),
          col("partition"), col("offset"))
    }),

    // The full CDC-sink story through config: a file STREAM of change
    // batches merged into the VERSIONED table per micro-batch
    // (SparkStreamingMode AvailableNow + maxFilesPerTrigger=1 + saveMode
    // merge → one log commit per batch). Batch 1 loads the base; batch 2
    // upserts (updates every %5 key's balance, inserts +10000 twins).
    // The final snapshot read is hash-gated — a re-applied batch, a lost
    // update, or a commit ordering bug all break it.
    "q100_streaming_cdc_versioned" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q100").toString
      val cust = t(s, dir, "customer").select(col("c_custkey").cast("long"),
        col("c_name"), col("c_acctbal").cast("double"))
      val updates = cust.where(col("c_custkey") % 5 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 50.0)
      val batch2 = updates.unionByName(
        updates.withColumn("c_custkey", col("c_custkey") + 10000L))
      def stage(df: DataFrame, name: String, mtime: Long): Unit = {
        val st = s"$tmp/stage_$name"
        df.coalesce(1).write.parquet(st)
        val part = new java.io.File(st).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/src"))
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$tmp/src/$name.parquet"))
        require(new java.io.File(s"$tmp/src/$name.parquet").setLastModified(mtime))
      }
      val t0 = 1700000000000L
      stage(cust, "b1", t0)
      stage(batch2, "b2", t0 + 60000)
      val cfg =
        s"""dataObjects:
           |  s100:
           |    type: parquet
           |    path: $tmp/src
           |    schema: "c_custkey bigint, c_name string, c_acctbal double"
           |  v100: {type: versionedTable, path: $tmp/t, primaryKey: [c_custkey]}
           |actions:
           |  sink100:
           |    type: copy
           |    inputId: s100
           |    outputId: v100
           |    saveMode: merge
           |    executionMode:
           |      type: streaming
           |      checkpointLocation: $tmp/cp
           |      triggerType: AvailableNow
           |      inputOptions: {maxFilesPerTrigger: "1"}
           |    metadata: {feed: q100}
           |""".stripMargin
      core.PipelineRunner.run(cfg, s, feedSel = Some("q100"))
      val vt = sources.VersionedTableDataObject("q100_read", s"$tmp/t")
      require(vt.latestVersion.contains(1),
        s"expected one commit per micro-batch (2), got version ${vt.latestVersion}")
      vt.getDataFrame().select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    }),

    // SplunkDataObject against a LIVE loopback endpoint speaking the real
    // REST export protocol (`services/search/jobs/export`: form-encoded
    // search + earliest/latest window + output_mode=json, NDJSON response).
    // The month of click events splits into 8 four-day windows fetched
    // EXECUTOR-SIDE across 4 parallel tasks (the reference's
    // splitQueryTimes/repartition design) — a request counter proves one
    // export per window actually engaged, and the hash proves the windows
    // tile the range exactly (an overlap double-fetches a row, a gap drops
    // one; either breaks the hash).
    "q101_splunk_windowed_export" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      def js(v: String): String = "\"" + v.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case ch => ch.toString } + "\""
      // preload [µs-epoch, ndjson export line] for every click event
      val clicks = t(s, dir, "events").where(col("event_type") === "click")
        .select(unix_micros(col("ts")).as("us"),
          col("event_id").cast("long"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
          col("user_id").cast("long"))
        .collect().map(r => (r.getLong(0),
          s"""{"preview":false,"offset":0,"result":{"event_id":"${r.getLong(1)}","ts":${js(r.getString(2))},"user_id":"${r.getLong(3)}"}}"""))
      val expectAuth = "Basic " + java.util.Base64.getEncoder
        .encodeToString("graft:s3cret".getBytes("UTF-8"))
      val winFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
      val requests = new java.util.concurrent.atomic.AtomicInteger(0)
      val server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/services/search/jobs/export", { exchange: com.sun.net.httpserver.HttpExchange =>
        requests.incrementAndGet()
        val form = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
        val params = form.split("&").map(_.split("=", 2)).collect {
          case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8") }.toMap
        val authed = Option(exchange.getRequestHeaders.getFirst("Authorization"))
          .contains(expectAuth)
        if (!authed) exchange.sendResponseHeaders(401, -1)
        else if (!params.get("search").contains("search index=events event_type=click") ||
                 !params.get("output_mode").contains("json"))
          exchange.sendResponseHeaders(400, -1)
        else {
          def us(p: String): Long = java.time.LocalDateTime.parse(params(p), winFmt)
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
          val (lo, hi) = (us("earliest_time"), us("latest_time"))
          // earliest inclusive, latest exclusive — Splunk's window semantics
          val body = clicks.collect { case (t, line) if t >= lo && t < hi => line }
            .mkString("\n").getBytes("UTF-8")
          if (body.isEmpty) exchange.sendResponseHeaders(200, -1)
          else {
            exchange.sendResponseHeaders(200, body.length.toLong)
            exchange.getResponseBody.write(body)
          }
        }
        exchange.close()
      })
      // executor tasks fetch concurrently — give the server a small pool
      // (daemon threads + explicit shutdown: a lingering non-daemon pool
      // would keep the whole JVM alive after the dump finishes)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4, { r: Runnable =>
        val t = new Thread(r); t.setDaemon(true); t
      })
      server.setExecutor(pool)
      server.start()
      try {
        val port = server.getAddress.getPort
        val df = sources.SplunkDataObject("q101_sp", "index=events event_type=click",
          queryFrom = java.time.LocalDateTime.of(2024, 1, 1, 0, 0),
          queryTo = java.time.LocalDateTime.of(2024, 2, 1, 0, 0),
          queryTimeInterval = java.time.Duration.ofDays(4),
          parallelRequests = 4,
          schema = Some(StructType(Seq(
            StructField("event_id", StringType),
            StructField("ts", StringType),
            StructField("user_id", StringType)))),
          client = sources.HttpSplunkClient(s"http://127.0.0.1:$port", "graft", "s3cret"))
          .getDataFrame()
        val out = df.select(col("event_id"), col("ts"), col("user_id")).cache()
        out.count() // materialize before stopping the server
        require(requests.get() == 8,
          s"expected one export request per 4-day window (8), served ${requests.get()}")
        out
      } finally { server.stop(0); pool.shutdownNow() }
    }),

    // IVF-PQ ANN (the billion-scale layout: coarse cells prune WHICH rows
    // a probe scans, product-quantized codes shrink WHAT it reads —
    // m bytes/row instead of 4·d; approx scores come from the codegen'd
    // decode/ADC expressions and only `refine` survivors touch exact
    // vectors). Same structural oracle as q34: each query IS a corpus row,
    // its own cell is its nearest cell, id==qid rows are EXEMPT from the
    // approx cut (so PQ quantization error can never evict the self-match
    // — structural, not statistical), and exact-cosine refine restores it
    // to rank 1. ANN QUALITY (recall vs brute force) is q104's job.
    "q102_ivfpq_ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val index = graft.functions.Quantization.buildIvfPq(
        emb, "vec_id", "embedding", nlist = 16, m = 8, kpq = 16)
      val queries = emb.where(col("vec_id") % 40 === 0)
      val out = graft.functions.Quantization.ivfPqTopKJoin(
        index, queries, "vec_id", "embedding", k = 1, nprobe = 2, refine = 32)
      out.cache().count()
      index.data.unpersist()
      out
    }),

    // Kafka AVRO wire decode with Confluent registry framing + schema
    // EVOLUTION (q97's Avro sibling — Avro is the dominant production
    // Kafka serialization): supplier rows land as confluent frames
    // (magic 0 + 4-byte schema id + avro payload) under TWO writer
    // schemas — even suppkeys id 1 (s_suppkey, s_name), odd id 2
    // (+ s_acctbal). `valueType=avro-registry` dispatches per row on the
    // frame's schema id and aligns both writers to the latest registry
    // schema (id-1 rows null-fill s_acctbal) — all codegen'd column
    // expressions (substring/conv/from_avro), no UDFs, so the decode
    // rides whole-stage codegen over a 100 TB archive scan exactly like
    // the JSON path. Reference: KafkaColumnType.Avro/AvroSchemaRegistry
    // (`sdl-kafka/.../KafkaTopicDataObject.scala:129-151`).
    "q103_kafka_avro_decode" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val schema1 =
        """{"type":"record","name":"supp","fields":[
          |{"name":"s_suppkey","type":["null","long"]},
          |{"name":"s_name","type":["null","string"]}]}""".stripMargin
      val schema2 =
        """{"type":"record","name":"supp","fields":[
          |{"name":"s_suppkey","type":["null","long"]},
          |{"name":"s_name","type":["null","string"]},
          |{"name":"s_acctbal","type":["null","double"]}]}""".stripMargin
      def header(sid: Int) = lit(Array[Byte](0, 0, 0, 0, sid.toByte))
      val tmp = java.nio.file.Files.createTempDirectory("graft_q103").toString
      val base = t(s, dir, "supplier")
        .select(col("s_suppkey").cast("long").as("k"), col("s_name"),
          col("s_acctbal").cast("double").as("s_acctbal"))
        .withColumn("partition", (col("k") % 3).cast("int"))
        .withColumn("offset",
          row_number().over(Window.partitionBy(col("partition")).orderBy(col("k")))
            .cast("long") - 1)
      def avro(c: org.apache.spark.sql.Column, sch: String): org.apache.spark.sql.Column =
        org.apache.spark.sql.avro.GraftAvroFunctions.to_avro(c, sch)
      base.select(
          col("k").cast("string").cast("binary").as("key"),
          when(col("k") % 2 === 0,
              concat(header(1), avro(struct(col("k").as("s_suppkey"), col("s_name")), schema1)))
            .otherwise(concat(header(2), avro(struct(col("k").as("s_suppkey"),
              col("s_name"), col("s_acctbal")), schema2)))
            .as("value"),
          lit("q103").as("topic"), col("partition"), col("offset"),
          timestamp_seconds(lit(1704067200L) + col("offset")).as("timestamp"))
        .write.parquet(s"$tmp/wire")
      val obj = sources.KafkaTopicDataObject("q103_kafka", "q103", "broker-free:9092",
        valueType = "avro-registry",
        schemaRegistry = Map(1 -> schema1, 2 -> schema2))
      obj.decodeWire(s.read.parquet(s"$tmp/wire"))
        .select(col("key").cast("string").cast("long").as("key_suppkey"),
          col("value.s_suppkey").as("s_suppkey"), col("value.s_name").as("s_name"),
          col("value.s_acctbal").as("s_acctbal"),
          col("partition"), col("offset"))
    }),

    // IVF-PQ PLANTED-NEIGHBOR recall (q102 proves the machinery; THIS
    // proves ANN quality): queries are 2%-perturbed copies of every 40th
    // corpus vector, so each query's exact brute-force top-1 is its
    // source (cosine ≈ 0.9998 ≫ the random-vector background). The query
    // measures recall@1 of ivfPqTopKJoin against the in-Spark exact
    // brute-force ground truth at fixed nprobe=2/refine=32 and REQUIRES
    // 1.0 (deterministic with fixed seeds; a PQ/probe regression fails
    // loudly, never silently) — the emitted planted mapping is then
    // DuckDB-expressible exactly. nprobe sweep in QuantizationSpec +
    // SCALE.md.
    "q104_ivfpq_planted_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") % 40 === 0)
        .select((col("vec_id") + 2000000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === 0, (x * lit(1.02)).cast("float")).otherwise(x)).as("embedding"))
      val index = graft.functions.Quantization.buildIvfPq(
        emb, "vec_id", "embedding", nlist = 16, m = 8, kpq = 16)
      val approx = graft.functions.Quantization.ivfPqTopKJoin(
        index, queries, "vec_id", "embedding", k = 1, nprobe = 2, refine = 32)
      // exact ground truth WITHOUT a join operator: the (tiny, corpus/40)
      // query set rides as a literal struct array exploded against one
      // corpus scan — the multi-query form of q30's literal-vector brute
      // force; keeps the whole-suite no-nested-loop plan sweep intact
      val qrows = queries.select(col("vec_id"), col("embedding")).collect()
      val qlits = array(qrows.map(r => struct(lit(r.getLong(0)).as("qid"),
        array(r.getSeq[Float](1).map(v => lit(v)).toIndexedSeq: _*).as("qemb"))).toIndexedSeq: _*)
      val exactW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("cosine").desc, col("id").asc)
      val exact = emb.select(col("vec_id").as("id"), col("embedding"), explode(qlits).as("q"))
        .select(col("q.qid").as("qid"), col("id"),
          graft.functions.Similarity.cosineSimilarity(col("embedding"), col("q.qemb")).as("cosine"))
        .withColumn("r", row_number().over(exactW)).where(col("r") === 1)
        .select(col("qid"), col("id").as("exact_id"))
      val matched = approx.join(exact, Seq("qid")).cache()
      val n = matched.count()
      val hits = matched.where(col("id") === col("exact_id")).count()
      index.data.unpersist()
      require(n > 0 && hits == n,
        s"IVF-PQ planted recall@1 = $hits/$n, expected 1.0 at nprobe=2 refine=32")
      require(matched.where(col("exact_id") =!= col("qid") - 2000000L).isEmpty,
        "exact top-1 of a planted query must be its source vector")
      matched.select(col("qid"), col("id"), col("rank"))
    }),

    // OPTIMIZE ZORDER end-to-end (the multi-column data-skipping story):
    // orders lands orderkey-clustered (a custkey filter can prune
    // NOTHING — every file spans custkey's whole range), then one
    // z-order rewrite (Morton-interleaved quantile-bucket bits, a single
    // range shuffle) makes the per-file stats selective on BOTH columns.
    // The query REQUIRES that a custkey point filter now plans fewer
    // files than the snapshot holds, then emits the filtered read —
    // which DuckDB recomputes relationally, proving the clustered
    // rewrite is data-invariant.
    "q105_zorder_skipping" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q105").toString
      val vt = sources.VersionedTableDataObject("q105_vt", s"$tmp/t")
      val o = t(s, dir, "orders").select(col("o_orderkey").cast("long"),
        col("o_custkey").cast("long"), col("o_totalprice").cast("double"))
      vt.writeDataFrame(o.repartitionByRange(8, col("o_orderkey")))   // v0
      val probe = org.apache.spark.sql.sources.EqualTo("o_custkey", 7L)
      val before = vt.filesForFilters(Seq(probe)).size
      vt.optimize(8, zorderBy = Seq("o_orderkey", "o_custkey"))       // v1
      val after = vt.filesForFilters(Seq(probe)).size
      val total = vt.snapshotFiles().size
      require(after < total && after <= before,
        s"zorder must make the custkey filter prune: $after of $total files (was $before)")
      vt.getDataFrame().where(col("o_custkey") === 7L)
    }),

    // CHANGE DATA FEED (the Delta CDF read semantics on the versioned
    // table): one MERGE applies updates + inserts + condition-deletes,
    // then changesBetween(v0, v1) reconstructs the row-level changes by
    // diffing ONLY the files that differ between the snapshots — typed
    // insert / delete / update_preimage / update_postimage rows, with
    // untouched-but-rewritten rows comparing equal and emitting nothing.
    // DuckDB recomputes every change class relationally.
    "q106_change_data_feed" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q106").toString
      val vt = sources.VersionedTableDataObject("q106_vt", s"$tmp/t",
        primaryKey = Seq("c_custkey"))
      val cust = t(s, dir, "customer").select(col("c_custkey").cast("long"),
        col("c_name"), col("c_acctbal").cast("double"))
      vt.writeDataFrame(cust.where(col("c_custkey") <= 1000))              // v0
      val updates = cust.where(col("c_custkey") <= 1000 &&
          col("c_custkey") % 10 === 0 && col("c_custkey") % 13 =!= 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      val inserts = cust.where(col("c_custkey") > 1000 && col("c_custkey") <= 1100)
      val deletes = cust.where(col("c_custkey") <= 1000 && col("c_custkey") % 13 === 0)
        .withColumn("c_name", lit("__DELETE__"))
      vt.mergeDataFrame(updates.unionByName(inserts).unionByName(deletes),
        Seq("c_custkey"),
        SaveModeMergeOptions(deleteCondition = Some("new.c_name = '__DELETE__'"))) // v1
      vt.changesBetween(0, Some(1))
    }),

    // CDC-INCREMENTAL CONSUMPTION of the versioned table (q100's
    // consumer sibling, the Delta streaming-source contract): two
    // config-driven stateful runs through the CLI state plumbing. Run 1
    // consumes the initial snapshot as `insert` rows and commits the
    // version; a MERGE lands (updates + inserts + condition-deletes);
    // run 2 (fresh registry, state restored from disk) consumes ONLY
    // the typed change rows of the new commit — computed from the
    // changed files, never a snapshot re-scan. A re-read duplicates
    // rows, a gap drops changes; either breaks the hash.
    "q107_cdc_incremental_consume" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q107").toString
      val cust = t(s, dir, "customer").select(col("c_custkey").cast("long"),
        col("c_name"), col("c_acctbal").cast("double"))
      val vt = sources.VersionedTableDataObject("q107_seed", s"$tmp/t",
        primaryKey = Seq("c_custkey"))
      vt.writeDataFrame(cust.where(col("c_custkey") <= 1000))              // v0
      val cfg =
        s"""dataObjects:
           |  src107: {type: versionedTable, path: $tmp/t, primaryKey: [c_custkey]}
           |  out107: {type: parquet, path: $tmp/out}
           |actions:
           |  consume107:
           |    type: copy
           |    inputId: src107
           |    outputId: out107
           |    saveMode: append
           |    executionMode: {type: cdcIncremental}
           |    metadata: {feed: q107}
           |""".stripMargin
      val cfgPath = s"$tmp/pipeline.conf"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(cfgPath), cfg)
      def consume(): Unit = app.GraftApp.run(app.GraftApp.CliArgs(
        configPaths = Seq(cfgPath), feedSel = Some("q107"),
        statePath = Some(s"$tmp/state"), appName = "q107"), s)
      consume()                                                            // snapshot as inserts
      val updates = cust.where(col("c_custkey") <= 1000 &&
          col("c_custkey") % 10 === 0 && col("c_custkey") % 13 =!= 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      val inserts = cust.where(col("c_custkey") > 1000 && col("c_custkey") <= 1100)
      val deletes = cust.where(col("c_custkey") <= 1000 && col("c_custkey") % 13 === 0)
        .withColumn("c_name", lit("__DELETE__"))
      vt.mergeDataFrame(updates.unionByName(inserts).unionByName(deletes),
        Seq("c_custkey"),
        SaveModeMergeOptions(deleteCondition = Some("new.c_name = '__DELETE__'"))) // v1
      consume()                                                            // delta only
      consume()  // no new commits → NoDataToProcess skip, sink untouched
      s.read.parquet(s"$tmp/out")
    }),

    // SemDeDup (Abbas et al. 2023): semantic dedup via k-means-clustered
    // embedding space — within-cluster pairs only, keep the row farthest
    // from the centroid. Planted EXACT copies (vec_id % 7 == 0, id+1000000,
    // identical vector) land in the same cell as their source with equal
    // centroid similarity, so the id tie-break drops the copy STRUCTURALLY
    // — recall is REQUIRED 1.0 in-query; the emitted planted-drop list is
    // what DuckDB recomputes relationally.
    "q108_semdedup_planted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      val copies = emb.where(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val corpus = emb.unionByName(copies)
      val dropped = graft.functions.SemDeDup.droppedIds(
        corpus, "vec_id", "embedding", k = 8, threshold = 0.99)
      val plantedDropped = dropped.where(col("vec_id") >= 1000000L).cache()
      val nPlanted = copies.count()
      require(plantedDropped.count() == nPlanted,
        "SemDeDup must drop every planted exact copy (id tie-break is structural)")
      // the dedup is consistent: kept + dropped partitions the corpus.
      // `dropped` is passed through: semDeDup would otherwise re-run the
      // whole k-means train + within-cell pair join (droppedIds is
      // deterministic under the fixed seed, so the reused frame is the
      // identical set — the partition check below is unchanged)
      val kept = graft.functions.SemDeDup.semDeDup(
        corpus, "vec_id", "embedding", k = 8, threshold = 0.99,
        precomputedDropped = Some(dropped))
      require(kept.count() + dropped.count() == corpus.count(),
        "semDeDup(kept) and droppedIds must partition the corpus")
      plantedDropped.select(col("vec_id").as("dropped_id"))
    }),

    // Merge-mode SCD2 historization end-to-end (reference mergeModeEnable):
    // load 2 writes ONLY the updateClose/insertNew op rows through the
    // versioned table's file-pruned MERGE — REQUIREd via the commit count
    // (exactly 2 versions: initial write + one merge commit). Same
    // incremental semantics as q19, so the oracle recomputes the SCD2
    // state relationally.
    "q109_historize_merge_mode" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q109").toString
      val customer = t(s, dir, "customer")
      c.registry.register(sources.ParquetFileDataObject("q109_feed", s"$tmp/feed"))
      c.registry.register(sources.VersionedTableDataObject("q109_hist", s"$tmp/hist",
        primaryKey = Seq("c_custkey")))
      def run(ts: java.sql.Timestamp): Unit =
        new ActionDAGRun(Seq(operators.HistorizeAction("h109", "q109_feed", "q109_hist",
          Seq("c_custkey"), mergeModeEnable = true, referenceTimestamp = () => ts))).run()
      customer.select(col("c_custkey"), col("c_acctbal"))
        .repartition(4).write.parquet(s"$tmp/feed")
      run(T1)
      customer.where(col("c_custkey") % 4 === 0)
        .select(col("c_custkey"), (col("c_acctbal") + 50.0).as("c_acctbal"))
        .write.mode("overwrite").parquet(s"$tmp/feed")
      run(T2)
      val vt = c.registry.dataObject("q109_hist").asInstanceOf[sources.VersionedTableDataObject]
      require(vt.latestVersion.contains(1),
        s"merge mode must commit exactly one merge version, got ${vt.latestVersion}")
      fmtTs(vt.getDataFrame(), operators.Historization.captured, operators.Historization.delimited)
    }),

    // Partitioned versioned table (Delta partitionValues design): values
    // live in the LOG, not the data files. v1 = dynamic partition
    // overwrite replaces ONLY status F; v2 = deletePartitions('P') is a
    // pure metadata commit (REQUIREd: every pre-delete file still on
    // disk, partition filter scans fewer files than the snapshot holds).
    // DuckDB recomputes the final state relationally.
    "q110_versioned_partitions" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q110").toString
      val orders = t(s, dir, "orders").where(col("o_orderkey") <= 20000)
        .select(col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_totalprice").cast("double").as("o_totalprice"), col("o_orderstatus"))
      val vt = sources.VersionedTableDataObject("q110_vt", s"$tmp/t",
        primaryKey = Seq("o_orderkey"), partitions = Seq("o_orderstatus"))
      vt.writeDataFrame(orders)                                            // v0
      vt.writeDataFrame(orders.where(col("o_orderstatus") === "F")
          .withColumn("o_totalprice", col("o_totalprice") + lit(1.0)),
        saveMode = Some(SdlSaveMode.OverwriteOptimized))                   // v1: F only
      val preDelete = vt.snapshotFiles().toSet
      vt.deletePartitions(Seq(PartitionValues("o_orderstatus" -> "P")))    // v2: metadata only
      require(preDelete.forall(f =>
        java.nio.file.Files.exists(java.nio.file.Paths.get(s"$tmp/t/$f"))),
        "deletePartitions must not touch data files")
      val filtered = vt.filesForFilters(Seq(
        org.apache.spark.sql.sources.EqualTo("o_orderstatus", "O")))
      require(filtered.size < vt.snapshotFiles().size,
        s"partition filter must prune: planned ${filtered.size} of ${vt.snapshotFiles().size}")
      vt.getDataFrame()
    }),

    // Metadata-only RESTORE (the public Delta RESTORE design): roll the
    // table back to v0 as a NEW commit built from the file-set diff —
    // zero data-file I/O (REQUIREd: the restored snapshot IS v0's exact
    // file set), and history stays intact (the pre-restore merge still
    // time-travels). Output = restored head + the surviving v1 snapshot.
    "q111_versioned_restore" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q111").toString
      val vt = sources.VersionedTableDataObject("q111_vt", s"$tmp/t",
        primaryKey = Seq("c_custkey"))
      val cust = t(s, dir, "customer").select(col("c_custkey").cast("long"),
        col("c_name"), col("c_acctbal").cast("double"))
      vt.writeDataFrame(cust.where(col("c_custkey") <= 800))               // v0
      vt.mergeDataFrame(cust.where(col("c_custkey") <= 900)
        .withColumn("c_acctbal", col("c_acctbal") + 50.0), Seq("c_custkey")) // v1
      val rv = vt.restore(0)                                               // v2 == v0
      require(rv == 2, s"restore committed v$rv, expected v2")
      require(vt.snapshotFiles().toSet == vt.snapshotFiles(Some(0)).toSet,
        "restore must reinstate v0's exact file set, metadata-only")
      vt.getDataFrame().withColumn("version", lit("restored"))
        .unionByName(vt.getDataFrameAsOf(Some(1)).withColumn("version", lit("pre")))
    }),

    // CDF as a STREAMING source (the Delta readChangeFeed streaming shape,
    // beyond q107's batch-incremental pull): a CDF-enabled versioned table
    // materializes per-commit change files at write time; a plain file
    // stream (AvailableNow) drains the full typed change history — no
    // state plumbing in the consumer, offsets/exactly-once come from the
    // engine's file-source checkpoint. Three commits: base load (inserts),
    // merge (update pre/post images + twin inserts), delete-merge
    // (pre-image delete rows), each stamped with its commit version.
    "q112_cdf_streaming_source" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q112").toString
      val vt = sources.VersionedTableDataObject("q112_vt", s"$tmp/t",
        primaryKey = Seq("c_custkey"), changeDataFeed = true)
      val cust = t(s, dir, "customer").select(col("c_custkey").cast("long"),
        col("c_name"), col("c_acctbal").cast("double"))
      vt.writeDataFrame(cust)                                              // v0: all inserts
      val upd = cust.where(col("c_custkey") % 7 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      val twins = cust.where(col("c_custkey") % 13 === 0)
        .withColumn("c_custkey", col("c_custkey") + 1000000L)
      vt.mergeDataFrame(upd.unionByName(twins), Seq("c_custkey"))          // v1: updates + inserts
      vt.mergeDataFrame(
        cust.where(col("c_custkey") % 11 === 0 && col("c_custkey") % 7 =!= 0)
          .withColumn("c_acctbal", lit(-1.0)),
        Seq("c_custkey"),
        SaveModeMergeOptions(deleteCondition = Some("true")))              // v2: deletes
      val dst = sources.ParquetFileDataObject("q112_dst", s"$tmp/out")
      val q = dst.writeStreamingDataFrame(vt.getStreamingDataFrame(Map.empty, None),
        org.apache.spark.sql.streaming.Trigger.AvailableNow(), Map.empty,
        s"$tmp/cp", "q112_stream")
      q.awaitTermination()
      dst.getDataFrame()
    }),

    // C4 line-level cleaning (Raffel et al. 2020 §2.2, the public C4
    // heuristics) over a structured corpus synthesized deterministically
    // from the documents table (the raw synthetic text has no lines or
    // punctuation, so the fixture plants every rule's trigger): short and
    // unterminated lines drop, terminal-punctuation lines survive, and
    // lorem-ipsum / curly-brace documents are rejected wholesale. The
    // oracle re-runs the SAME generic rules in DuckDB (list_filter +
    // regex), not the construction's known outcomes.
    "q113_c4_line_cleaning" -> ((s, dir) => {
      import graft.functions.TextAnalysis._
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val synth = docs.withColumn("_synth", concat_ws("\n",
        concat(lit("Document "), col("doc_id"), lit(" begins with a proper sentence.")),
        lit("too short"),
        lit("this line has no terminal punctuation"),
        when(col("doc_id") % 10 === 0, lit("A code block { lurks here.")),
        when(col("doc_id") % 17 === 0, lit("Lorem ipsum dolor sit amet.")),
        concat(lit("It ends with "), element_at(split(col("text"), " "), 1), lit("!"))))
      synth.withColumn("cleaned", c4CleanLines(col("_synth")))
        .select(col("doc_id"), col("cleaned"),
          c4DocumentAccept(col("cleaned")).as("accept"))
    }),

    // Gopher document-quality filter (Rae et al. 2021 §A1.1, the public
    // rule set) — every signal plus the paper's accept conjunction, over
    // a corpus where each rule's trigger is planted on a deterministic
    // slice (hash noise %9, bullets %13, ellipsis endings %7, a
    // stopword-bearing coda everywhere) so the base corpus' word-count /
    // mean-length variation decides the rest. The oracle recomputes every
    // signal generically, bit-for-bit.
    "q114_gopher_quality_filter" -> ((s, dir) => {
      import graft.functions.TextAnalysis._
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val synth = docs.withColumn("_synth", concat_ws("\n",
        concat(col("text"), lit(" and that is the point.")),
        when(col("doc_id") % 9 === 0, lit("# # # # # # # # # # # #")),
        when(col("doc_id") % 13 === 0, lit("- bullet one")),
        when(col("doc_id") % 13 === 0, lit("- bullet two")),
        when(col("doc_id") % 7 === 0, lit("to be continued..."))))
      withGopherSignals(synth, "_synth")
        .select(col("doc_id"), col("word_count"), col("mean_word_len"),
          col("symbol_word_ratio"), col("bullet_line_frac"),
          col("ellipsis_line_frac"), col("alpha_word_frac"),
          col("stopword_hits"), col("gopher_accept"))
    }),

    // Row-level DELETE (the Delta DELETE command, copy-on-write): the
    // predicate stats-prunes candidate files at PLAN time, only files
    // actually holding matching rows are rewritten (minus those rows),
    // everything else carries by reference — O(touched), not O(table).
    // The pre-delete snapshot stays time-travelable. DuckDB recomputes
    // the surviving set relationally (NULL-predicate rows survive, SQL
    // DELETE semantics).
    "q115_delete_where" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q115").toString
      val vt = sources.VersionedTableDataObject("q115_vt", s"$tmp/t")
      val p = t(s, dir, "part").select(col("p_partkey").cast("long"),
        col("p_name"), col("p_brand"), col("p_size").cast("int"),
        col("p_retailprice").cast("double"))
      // range-partitioned staging → per-file p_partkey ranges the delete
      // predicate can prune against
      vt.writeDataFrame(p.repartitionByRange(6, col("p_partkey")))         // v0
      val total = vt.snapshotFiles().size
      val deleted = vt.deleteWhere("p_partkey % 100 < 10 AND p_size > 25") // v1
      require(deleted > 0, "delete fixture must match rows")
      val removed = vt.history(1).collect().head.getAs[Int]("num_removed_files")
      require(removed <= total, s"delete rewrote $removed of $total files")
      require(vt.getDataFrameAsOf(Some(0)).count() > vt.getDataFrame().count(),
        "pre-delete snapshot must still read the full table")
      vt.getDataFrame()
    }),

    // Row-level UPDATE (the Delta UPDATE command, copy-on-write): only
    // files holding matching rows are rewritten, with assignment RHS
    // evaluating against PRE-update values; non-matching rows and files
    // pass through byte-identical. DuckDB mirrors it with CASE WHEN.
    "q116_update_where" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q116").toString
      val vt = sources.VersionedTableDataObject("q116_vt", s"$tmp/t")
      val p = t(s, dir, "part").select(col("p_partkey").cast("long"),
        col("p_brand"), col("p_size").cast("int"),
        col("p_retailprice").cast("double"))
      vt.writeDataFrame(p.repartitionByRange(6, col("p_partkey")))         // v0
      vt.updateWhere(Map(
        "p_retailprice" -> "p_retailprice * 1.1",
        "p_size" -> "p_size + 100"), "p_brand = 'Brand#13'")               // v1
      vt.getDataFrame()
    }),

    // Merge-on-read UPDATE through deletion vectors (the Delta DV-update
    // design): matched rows are tombstoned in place and their rewritten
    // versions APPENDED — the commit removes zero files (asserted), so an
    // update costs O(matched rows), not O(touched-file rewrite). Same
    // relational oracle as the copy-on-write q116: storage strategy must
    // be invisible to the result.
    "q118_update_dv" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q118").toString
      val vt = sources.VersionedTableDataObject("q118_vt", s"$tmp/t",
        deletionVectors = true)
      val p = t(s, dir, "part").select(col("p_partkey").cast("long"),
        col("p_brand"), col("p_size").cast("int"),
        col("p_retailprice").cast("double"))
      vt.writeDataFrame(p.repartitionByRange(6, col("p_partkey")))         // v0
      val files0 = vt.snapshotFiles().toSet
      vt.updateWhere(Map(
        "p_retailprice" -> "p_retailprice * 1.1",
        "p_size" -> "p_size + 100"), "p_brand = 'Brand#13'")               // v1 (DV)
      require(vt.history(1).collect().head.getAs[Int]("num_removed_files") == 0,
        "DV update must remove zero files")
      require(files0.subsetOf(vt.snapshotFiles().toSet),
        "DV update must carry every original file")
      vt.getDataFrame()
    }),

    // Streaming CDC merge into a DELETION-VECTOR table: each micro-batch
    // commits as MERGE_DV — matched rows tombstoned, updated versions +
    // inserts appended, ZERO data files rewritten or removed (asserted
    // across both batch commits). The lakehouse streaming-sink pattern at
    // its O(batch) cost floor; same oracle as the copy-on-write q100.
    "q119_streaming_merge_dv" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q119").toString
      val cust = t(s, dir, "customer").select(col("c_custkey").cast("long"),
        col("c_name"), col("c_acctbal").cast("double"))
      val updates = cust.where(col("c_custkey") % 5 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 50.0)
      val batch2 = updates.unionByName(
        updates.withColumn("c_custkey", col("c_custkey") + 10000L))
      def stage(df: DataFrame, name: String, mtime: Long): Unit = {
        val st = s"$tmp/stage_$name"
        df.coalesce(1).write.parquet(st)
        val part = new java.io.File(st).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/src"))
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$tmp/src/$name.parquet"))
        require(new java.io.File(s"$tmp/src/$name.parquet").setLastModified(mtime))
      }
      val t0 = 1700000000000L
      stage(cust, "b1", t0)
      stage(batch2, "b2", t0 + 60000)
      val cfg =
        s"""dataObjects:
           |  s119:
           |    type: parquet
           |    path: $tmp/src
           |    schema: "c_custkey bigint, c_name string, c_acctbal double"
           |  v119: {type: versionedTable, path: $tmp/t, primaryKey: [c_custkey],
           |         deletionVectors: true}
           |actions:
           |  sink119:
           |    type: copy
           |    inputId: s119
           |    outputId: v119
           |    saveMode: merge
           |    executionMode:
           |      type: streaming
           |      checkpointLocation: $tmp/cp
           |      triggerType: AvailableNow
           |      inputOptions: {maxFilesPerTrigger: "1"}
           |    metadata: {feed: q119}
           |""".stripMargin
      core.PipelineRunner.run(cfg, s, feedSel = Some("q119"))
      val vt = sources.VersionedTableDataObject("q119_read", s"$tmp/t")
      require(vt.latestVersion.contains(1),
        s"expected one commit per micro-batch (2), got version ${vt.latestVersion}")
      require(vt.history().collect().forall(_.getAs[Int]("num_removed_files") == 0),
        "DV streaming merge must never remove a data file")
      vt.getDataFrame().select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    }),

    // DELETION VECTORS (the public Delta DV design, from scratch):
    // merge-on-read DELETE records (file, row_index) tombstones instead
    // of rewriting files — the commit moves ZERO data bytes (asserted on
    // the physical file set), every read anti-joins the active DV set,
    // and the pre-delete snapshot still time-travels. Same relational
    // oracle as the copy-on-write path: the storage strategy must be
    // invisible to the query result.
    "q117_deletion_vectors" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q117").toString
      val vt = sources.VersionedTableDataObject("q117_vt", s"$tmp/t",
        deletionVectors = true)
      val p = t(s, dir, "part").select(col("p_partkey").cast("long"),
        col("p_name"), col("p_size").cast("int"))
      vt.writeDataFrame(p.repartitionByRange(6, col("p_partkey")))         // v0
      val before = vt.snapshotFiles().toSet
      val deleted = vt.deleteWhere("p_size BETWEEN 20 AND 30")             // v1 (DV)
      require(deleted > 0, "dv-delete fixture must match rows")
      require(vt.snapshotFiles().toSet == before,
        "deletion-vector delete must not rewrite or remove any data file")
      require(vt.getDataFrameAsOf(Some(0)).count() ==
        vt.getDataFrame().count() + deleted,
        "time travel must still see the tombstoned rows")
      vt.getDataFrame()
    }),

    // SHALLOW CLONE (the public Delta design): a zero-copy table clone —
    // the clone's v0 commit references the source's live files by
    // absolute path (asserted: NO parquet under the clone root), carries
    // their stats, then evolves independently: a copy-on-write DELETE on
    // the clone rewrites into the clone's own dir, and a post-clone
    // append to the SOURCE never leaks into the pinned clone.
    "q122_shallow_clone" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q122").toString
      val src = sources.VersionedTableDataObject("q122_src", s"$tmp/src",
        primaryKey = Seq("c_custkey"))
      val cust = t(s, dir, "customer").select(col("c_custkey").cast("long"),
        col("c_name"), col("c_acctbal").cast("double"))
      src.writeDataFrame(cust.repartitionByRange(4, col("c_custkey")))      // src v0
      val clone = src.shallowCloneTo("q122_clone", s"$tmp/clone")           // clone v0
      def parquetUnder(d: String): Boolean = {
        def walk(f: java.io.File): Boolean =
          if (f.isDirectory) f.listFiles.exists(walk)
          else f.getName.endsWith(".parquet")
        walk(new java.io.File(d))
      }
      require(!parquetUnder(s"$tmp/clone"), "shallow clone must stage zero data files")
      clone.deleteWhere("c_acctbal < 0")                                    // clone v1
      import s.implicits._
      src.writeDataFrame(Seq((-1L, "post-clone", 0.0)).toDF("c_custkey", "c_name", "c_acctbal"),
        saveMode = Some(SdlSaveMode.Append))                                // src v1
      require(clone.getDataFrame().where(col("c_custkey") === -1L).isEmpty,
        "post-clone source append must not leak into the pinned clone")
      clone.getDataFrame()
    }),

    // COLUMN MAPPING (the public Delta column-mapping design, from
    // scratch): immutable uuid'd physical column names + a logical→
    // physical map in the log make RENAME/DROP COLUMN metadata-only — on
    // a 100 TB table each costs ONE log write (asserted: zero snapshot
    // file changes). Reads keep pruning through the map; time travel
    // still sees the pre-rename schema.
    "q121_column_mapping_rename" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q121").toString
      val vt = sources.VersionedTableDataObject("q121_vt", s"$tmp/t",
        columnMapping = true)
      val p = t(s, dir, "part").select(col("p_partkey").cast("long"),
        col("p_name"), col("p_retailprice").cast("double"), col("p_type"))
      vt.writeDataFrame(p.repartitionByRange(4, col("p_partkey")))          // v0
      val before = vt.snapshotFiles().toSet
      vt.renameColumn("p_name", "part_name")                                // v1
      vt.dropColumn("p_type")                                                 // v2
      require(vt.snapshotFiles().toSet == before,
        "rename/drop must be metadata-only (no snapshot file changes)")
      require(vt.getDataFrameAsOf(Some(0)).columns.contains("p_name"),
        "time travel must still see the pre-rename schema")
      vt.getDataFrame()
    }),

    // DSIR importance resampling (Xie et al. 2023): rank the raw corpus by
    // hashed-n-gram importance vs a target slice, keep the top 50. The
    // scoring pass is shuffle-free (bucket→ratio rides as a broadcast map
    // literal; the per-doc fold sums in ASCENDING order so the double
    // addition sequence — and therefore the score bits — is a pure
    // function of the document, replayed exactly by the oracle's
    // list(ORDER BY)+list_reduce).
    "q120_dsir_importance_resampling" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val target = docs.where(col("doc_id") % 10 === 0)
      val corpus = docs.where(col("doc_id") % 10 =!= 0)
      graft.functions.ImportanceResampling.resampleTopK(
        corpus, target, col("doc_id"), col("text"), numBuckets = 256, k = 50)
        .select(col("doc_id"), col("rank"), col("n_grams"), col("score"))
    }),

    "q123_repeated_span_removal" -> ((s, dir) => {
      // plant a 12-token passage into every 10th doc (both sides of the
      // oracle replay the same planting), then remove every cross-corpus
      // duplicated run of ≥ 8 tokens — planted spans vanish, organic text
      // survives; the hash compare verifies both at once
      val planted = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" the quick brown fox jumps over the lazy dog again and again")))
          .otherwise(col("text")).as("text"))
      graft.functions.Dedup.removeRepeatedSpans(planted, "doc_id", "text", l = 8)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_dup_windows"),
          col("n_removed_tokens"), col("cleaned_text"))
    }),

    "q124_bm25_retrieval" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val queries = Seq((1, "table merge batch"), (2, "fast hash value"),
        (3, "slow scan row key")).toDF("query_id", "query_text")
      graft.functions.Retrieval.bm25TopK(docs, "doc_id", "text",
        queries, "query_id", "query_text", k = 10)
        // score_e6, not the raw double: JVM log vs C log differ by 1 ulp
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("n_terms_hit"), col("score_e6"))
    }),

    // Generated columns (the public Delta GENERATED ALWAYS AS design):
    // the feed OMITS o_month — the write plan populates it, the partition
    // layout uses it, and the read filters on it; REQUIREd: the month
    // filter prunes files at plan time off the logged partition values
    "q125_generated_columns" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q125").toString
      val orders = t(s, dir, "orders").where(col("o_orderkey") <= 30000)
        .select(col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_totalprice").cast("double").as("o_totalprice"),
          col("o_orderdate"))
      val vt = sources.VersionedTableDataObject("q125_vt", s"$tmp/t",
        primaryKey = Seq("o_orderkey"), partitions = Seq("o_month"),
        generatedColumns = Seq("o_month" -> "date_format(o_orderdate, 'yyyy-MM')"),
        optimizedWrite = false) // toy-scale trade, see SCALE.md: without it, tasks×months small files
      vt.writeDataFrame(orders)
      val pruned = vt.filesForFilters(Seq(
        org.apache.spark.sql.sources.EqualTo("o_month", "1995-06")))
      require(pruned.size < vt.snapshotFiles().size,
        s"generated partition column must prune: ${pruned.size} of ${vt.snapshotFiles().size}")
      vt.getDataFrame().where(col("o_month").between("1995-01", "1995-12"))
        .groupBy(col("o_month"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
    }),

    // CCNet-style NB quality classifier: a planted 3-token quality marker
    // on every 4th doc gives the corpus a REAL learnable signal (the
    // synthetic langs share one vocabulary, so lang itself is unlearnable);
    // train on the 1/3 seed, score the other 2/3, REQUIRE accuracy — and
    // the integer micro-nat evidence replays bit-exactly in DuckDB
    "q126_nb_quality_classifier" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 4 === 0,
          concat(col("text"), lit(" premium curated editorial"))).otherwise(col("text")).as("text"),
        (col("doc_id") % 4 === 0).as("hi"))
      val seed = docs.where(col("doc_id") % 3 === 0)
      val rest = docs.where(col("doc_id") % 3 =!= 0)
      val res = graft.functions.QualityClassifier.scoreNB(rest, col("text"),
        seed.where(col("hi")), col("text"),
        seed.where(!col("hi")), col("text"), numBuckets = 256)
        .select(col("doc_id"), col("n_grams"), col("score_micro"),
          col("predicted"), col("hi").as("actual_hi"))
      // one aggregate action for the gate (no persist: a cached result here
      // would outlive the query and skew every later bench number)
      val gate = res.agg(count(lit(1)).as("n"),
        count(when(col("predicted") === col("actual_hi"), 1)).as("ok")).head()
      val (n, ok) = (gate.getLong(0), gate.getLong(1))
      // 0.85, not higher: at sf0.001 the seed is ~111 docs and 256 hashed
      // buckets collide enough to cost a few points (measured 0.89 there,
      // ≥0.95 at sf0.01+) — the gate proves the signal is learned, the
      // hash compare pins the exact scores
      require(ok.toDouble / n >= 0.85,
        s"planted-marker classification accuracy $ok/$n below 0.85")
      res
    }),

    "q127_tfidf_keywords" -> ((s, dir) => {
      graft.functions.Retrieval.tfidfKeywords(
        t(s, dir, "documents"), "doc_id", "text", k = 5)
    }),

    // CCNet's head filter (Wenzek et al. 2020): score the corpus by the
    // perplexity of a bigram LM trained on a seed slice — hashed-bucket
    // conditionals, integer micro-nat evidence (sum of longs: exact,
    // order-free, replayed bit-for-bit by the oracle)
    "q128_lm_perplexity" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val seed = docs.where(col("doc_id") % 3 === 0)
      graft.functions.NgramLM.perplexity(
        docs.where(col("doc_id") % 3 =!= 0), col("text"),
        seed, col("text"), numBuckets = 4096)
        .select(col("doc_id"), col("n_bigrams"), col("nll_micro"), col("ppl_micro"))
    }),

    // CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): per
    // language, tercile the corpus by LM perplexity — pure integer rank
    // arithmetic over (ppl_micro, doc_id), replayed exactly by the oracle
    "q129_ccnet_ppl_buckets" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val seed = docs.where(col("doc_id") % 3 === 0)
      graft.functions.NgramLM.pplBuckets(
        docs.where(col("doc_id") % 3 =!= 0), "doc_id", col("text"), "lang",
        seed, col("text"), numBuckets = 4096)
        .select(col("doc_id"), col("lang"), col("ppl_micro"), col("bucket"))
    }),

    // Soft dedup (SoftDeDup, He et al. 2024): inverse-multiplicity
    // sampling weights instead of hard drops — same planted exact-copy
    // corpus as q24, integer micro-weights
    "q130_soft_dedup_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val dups = docs.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      graft.functions.Dedup.duplicationWeights(docs.unionByName(dups), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_copies"), col("weight_e6"))
    }),

    // Span-level decontamination: benchmark strings leaked verbatim into
    // training docs are STRIPPED (not whole-doc-dropped); organic text
    // survives. Both engines replay the same planting + window machinery.
    "q131_decontaminate_spans" -> ((s, dir) => {
      import s.implicits._
      val bench = Seq(
        (1, "what is the capital of france paris is the capital of france"),
        (2, "the mitochondria is the powerhouse of the cell as everyone knows"))
        .toDF("bid", "btext")
      val planted = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" what is the capital of france paris is the capital of france")))
          .when(col("doc_id") % 10 === 5,
            concat(lit("the mitochondria is the powerhouse of the cell as everyone knows "), col("text")))
          .otherwise(col("text")).as("text"))
      graft.functions.Dedup.removeContaminatedSpans(
        planted, "doc_id", "text", bench, "btext", l = 8)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_dup_windows"),
          col("n_removed_tokens"), col("cleaned_text"))
    }),

    // Temperature-scaled domain mixing (mT5/XLM-R): p_d ∝ tokens_d^0.5,
    // integer micro-rate keep decision — the frozen mix replays exactly
    "q132_temperature_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.functions.Sampling.temperatureMix(docs, col("doc_id"), col("source"),
        col("n_chars"), budgetTokens = 100000L, alpha = 0.5)
        .select(col("doc_id"), col("source"), col("_mix_rate_e6"))
    }),

    // FLAGSHIP COMPOSITION — the four-stage curation pipeline every
    // training-data team runs, each stage a library operator, the WHOLE
    // chain replayed in DuckDB: exact dedup (drop non-canonical copies) →
    // token-bound quality gate → benchmark decontamination (doc-level
    // drop) → DSIR top-k selection against a target slice. Composition is
    // the point: results only hash-match if every stage's output feeds the
    // next identically on both engines.
    "q133_curation_pipeline" -> ((s, dir) => {
      val docs0 = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = docs0.unionByName(docs0.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      // 1. exact dedup: canonical (min-id) survivor per normalized content.
      // canon persisted: the semi-join pushes into every corpus union
      // branch, and an unpersisted canon replicates the whole dedup
      // aggregate per branch (measured 2.2x on the 10x harness) — slim
      // id-only rows, spillable
      val canon = graft.functions.Dedup.exactDedup(corpus, "doc_id", "text")
        .select(col("canonical_id").as("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deduped = corpus.join(canon, Seq("doc_id"), "left_semi")
      // 2. quality gate: whitespace-token bounds. PERSISTED: quality is
      // consumed twice (the contamination flag subtree AND the anti-join's
      // left side) — on a multi-source union corpus, Catalyst's
      // semi/anti-join-through-Union pushdown otherwise replicates the
      // join + build side into EVERY branch, squaring the plan (measured:
      // a 10-branch corpus planned 25k nodes, 16.6 s of a 21 s stage —
      // SCALE.md round-14). Persisting the multi-consumer stage is what
      // the DAG engine does automatically (dataFrameReuseCounts); a
      // standalone composition must do it by hand.
      val quality = deduped.where(
        size(graft.functions.TextAnalysis.wsTokens(col("text"))).between(5, 10000))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // 3. decontaminate vs the benchmark slice (doc-level drop)
      val bench = docs0.where(col("doc_id") % 13 === 1).select(col("text"))
      val flagged = graft.functions.Decontamination.contaminationReport(
        quality, "doc_id", "text", bench, "text", n = 5, minOverlap = 1)
        .select(col("doc_id"))
      val clean = quality.join(flagged, Seq("doc_id"), "left_anti")
        .where(col("doc_id") % 10 =!= 0) // target slice is not selectable
      // 4. DSIR: top-100 most target-like survivors
      val target = docs0.where(col("doc_id") % 10 === 0)
      graft.functions.ImportanceResampling.resampleTopK(
        clean, target, col("doc_id"), col("text"), numBuckets = 256, k = 100)
        .select(col("doc_id"), col("rank"), col("n_grams"), col("score"))
    }),

    // Fixed-length token chunking with overlap (the BERT/long-doc stride
    // recipe): per-row explode, no shuffle; the last window is the first
    // to reach the doc's end
    "q134_token_chunking" -> ((s, dir) => {
      graft.functions.Packing.chunkTokens(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        col("doc_id"), col("text"), maxLen = 32, overlap = 8)
        .select(col("doc_id"), col("chunk_idx"), col("chunk_tokens"), col("chunk_text"))
    }),

    // Incremental ExactSubstr: a DELTA batch cleaned against the corpus
    // HISTORY's window-fingerprint store + itself — the corpus text is
    // never re-read (the q51 signature-store design applied to span
    // removal). A passage present in history is stripped from the delta.
    "q135_incremental_span_removal" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val passage = " pack my box with five dozen liquor jugs tonight"
      val hist = docs.where(col("doc_id") % 3 =!= 1).select(col("doc_id"),
        when(col("doc_id") % 10 === 0, concat(col("text"), lit(passage)))
          .otherwise(col("text")).as("text"))
      val store = graft.functions.Dedup.spanFingerprintStore(hist, "doc_id", "text", l = 8)
      val delta = docs.where(col("doc_id") % 3 === 1).select(col("doc_id"),
        when(col("doc_id") % 9 === 1, concat(col("text"), lit(passage)))
          .otherwise(col("text")).as("text"))
      graft.functions.Dedup.removeRepeatedSpansIncremental(delta, "doc_id", "text", store, l = 8)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_dup_windows"),
          col("n_removed_tokens"), col("cleaned_text"))
    }),

    // CCNet line-level dedup (Wenzek et al. 2020 §4.1): lines whose
    // normalized hash repeats corpus-wide are boilerplate — dropped from
    // every document; unique lines survive in place
    "q136_line_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val synth = docs.select(col("doc_id"), concat_ws("\n",
        lit("Cookie Policy: this site uses cookies."),
        col("text"),
        when(col("doc_id") % 4 === 0, lit("Subscribe to our newsletter!")),
        concat(lit("unique footer "), col("doc_id"))).as("text"))
      graft.functions.Dedup.removeDuplicatedLines(synth, "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_lines"), col("n_removed_lines"),
          col("cleaned_text"))
    }),

    // Perceptual image dedup over REAL decoded pixels: 20 distinct
    // deterministic PNGs repeated across the corpus, dHash64'd, paired by
    // the SimHash blocking machinery at hamming 0 — recovered pairs are
    // exactly the same-seed pairs (structural oracle, like q39: image
    // bytes aren't SQL-expressible, the planted group structure is)
    "q137_image_perceptual_dedup" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings").select(col("vec_id"))
        .where(col("vec_id") % 7 === 0)
        .withColumn("seed", col("vec_id") % 20)
      val imgs = graft.operators.Multimodal.withSynthImage(vecs, "seed", 16, 16)
      graft.operators.Multimodal.imageNearDupPairs(imgs, "vec_id", "content",
        maxHamming = 0)
        .select(col("id_a"), col("id_b"))
    }),

    // Audio twin of q137: 15 distinct deterministic WAV clips repeated
    // across the corpus, energy-contour fingerprints paired at hamming 0 —
    // structural oracle (gain-variant robustness is spec-gated; the oracle
    // pins exact-copy recall)
    "q138_audio_perceptual_dedup" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings").select(col("vec_id"))
        .where(col("vec_id") % 11 === 0)
        .withColumn("seed", col("vec_id") % 15)
      val clips = graft.operators.Multimodal.withSynthAudio(vecs, "seed", nSamples = 2000)
      graft.operators.Multimodal.audioNearDupPairs(clips, "vec_id", "content",
        maxHamming = 0)
        .select(col("id_a"), col("id_b"))
    }),

    // Video leg of the multimodal dedup trio: 6-frame synthetic videos in
    // 12 groups sharing all frames; near-dups = videos sharing ≥2
    // perceptual frame hashes. Structural oracle: same-group pairs with
    // the full shared-frame count (6)
    "q139_video_frame_dedup" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings").select(col("vec_id"))
        .where(col("vec_id") % 13 === 0)
        .withColumn("seed", col("vec_id") % 12)
      val vids = graft.operators.Multimodal.withSynthVideo(vecs, "seed",
        nFrames = 6, frameSize = 2048)
      graft.operators.Multimodal.videoNearDupPairs(vids, "vec_id", "content",
        frameSize = 2048, minSharedFrames = 2)
        .select(col("id_a"), col("id_b"), col("n_shared_frames"))
    }),

    // Incremental image dedup against a fingerprint STORE: the corpus is
    // decoded once into (id, dhash64); the delta batch decodes only itself
    // and block-joins its hashes against the store (the minhash-store
    // discipline for media — corpus bytes are not an input to the
    // incremental call at all). Planted: corpus seeds are {0,5,10,15}
    // (vec_id%20 over multiples of 5); the delta's (vec_id-1)%40 seeds are
    // the multiples of 5 in 0..35, so seeds 0/5/10/15 COLLIDE (positive
    // rows — the oracle must catch a missed duplicate, not just a false
    // one) and 20/25/30/35 are novel. Structural oracle like q137.
    "q140_image_incremental_dedup" -> ((s, dir) => {
      import graft.operators.Multimodal
      val corpus = t(s, dir, "embeddings").select(col("vec_id"))
        .where(col("vec_id") % 5 === 0).withColumn("seed", col("vec_id") % 20)
      val store = Multimodal.imageFingerprintStore(
        Multimodal.withSynthImage(corpus, "seed", 16, 16), "vec_id")
      val delta = t(s, dir, "embeddings").select(col("vec_id"))
        .where(col("vec_id") % 5 === 1).withColumn("seed", (col("vec_id") - 1) % 40)
      Multimodal.imageIncrementalPairs(
        Multimodal.withSynthImage(delta, "seed", 16, 16), store,
        "vec_id", maxHamming = 0)
        .select(col("id_new"), col("id_corpus"))
    }),

    // Audio twin of q140: energy-contour fingerprint store, delta batch
    // paired at hamming 0 against it. Delta seeds 0..14 collide.
    "q141_audio_incremental_dedup" -> ((s, dir) => {
      import graft.operators.Multimodal
      val corpus = t(s, dir, "embeddings").select(col("vec_id"))
        .where(col("vec_id") % 7 === 0).withColumn("seed", col("vec_id") % 15)
      val store = Multimodal.audioFingerprintStore(
        Multimodal.withSynthAudio(corpus, "seed", nSamples = 2000), "vec_id")
      val delta = t(s, dir, "embeddings").select(col("vec_id"))
        .where(col("vec_id") % 7 === 1).withColumn("seed", col("vec_id") % 30)
      Multimodal.audioIncrementalPairs(
        Multimodal.withSynthAudio(delta, "seed", nSamples = 2000), store,
        "vec_id", maxHamming = 0)
        .select(col("id_new"), col("id_corpus"))
    }),

    // Video leg: frame-hash store (exploded (id, fh)), delta frame hashes
    // joined against it — same-seed videos share all 6 distinct frames.
    "q142_video_incremental_dedup" -> ((s, dir) => {
      import graft.operators.Multimodal
      val corpus = t(s, dir, "embeddings").select(col("vec_id"))
        .where(col("vec_id") % 11 === 0).withColumn("seed", col("vec_id") % 10)
      val store = Multimodal.videoFrameHashStore(
        Multimodal.withSynthVideo(corpus, "seed", nFrames = 6, frameSize = 2048),
        "vec_id", "content", frameSize = 2048)
      val delta = t(s, dir, "embeddings").select(col("vec_id"))
        .where(col("vec_id") % 11 === 1).withColumn("seed", col("vec_id") % 20)
      Multimodal.videoIncrementalPairs(
        Multimodal.withSynthVideo(delta, "seed", nFrames = 6, frameSize = 2048),
        store, "vec_id", "content", frameSize = 2048, minSharedFrames = 2)
        .select(col("id_new"), col("id_corpus"), col("n_shared_frames"))
    }),

    // EXTENDED COMPOSITION — the q133 chain carried through to training
    // inputs: exact dedup → token-bound quality gate → temperature-scaled
    // domain mixing (α=0.5 over `source`, token-weighted) → fixed-length
    // token chunking. The end-to-end "curate → mix → pack" cost model the
    // brief ultimately wants, each stage the audited operator, the whole
    // chain replayed in DuckDB.
    "q143_curation_mix_pack" -> ((s, dir) => {
      import graft.functions.{Dedup, Packing, Sampling, TextAnalysis}
      val docs0 = t(s, dir, "documents").select(col("doc_id"), col("text"), col("source"))
      val corpus = docs0.unionByName(docs0.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"), col("source")))
      // canon persisted — same union-pushdown rationale as q133
      val canon = Dedup.exactDedup(corpus, "doc_id", "text")
        .select(col("canonical_id").as("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deduped = corpus.join(canon, Seq("doc_id"), "left_semi")
      // persisted for the same multi-consumer reason as q133: temperatureMix
      // reads its input twice (rate table + survivor filter)
      val quality = deduped
        .withColumn("n_tokens", size(TextAnalysis.wsTokens(col("text"))).cast("long"))
        .where(col("n_tokens").between(5, 10000))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mixed = Sampling.temperatureMix(quality, col("doc_id"), col("source"),
        col("n_tokens"), budgetTokens = 200000L, alpha = 0.5)
      Packing.chunkTokens(mixed, col("doc_id"), col("text"), maxLen = 32, overlap = 8)
        .select(col("doc_id"), col("source"), col("_mix_rate_e6"),
          col("chunk_idx"), col("chunk_tokens"), col("chunk_text"))
    }),

    // CONTINUOUS media ingestion dedup, DECLARATIVE: a real readStream
    // file source feeds three image batches through the productized
    // StreamingIncrementalDedupAction; each micro-batch decodes ONLY
    // ITSELF (once — the fingerprint frame is persisted and reused for
    // the store delta), joins its dHashes against the persisted
    // fingerprint store, and only store-novel images survive. The store
    // GROWS by the batch's novel fingerprints only (one batch-keyed
    // partition per micro-batch — per-batch store I/O is O(novel), never
    // O(store)), and BOTH sinks are batchId-keyed dynamic partition
    // overwrites, so a replayed micro-batch is idempotent. Cross-batch
    // dups (batch 2/3 re-post earlier seeds) are dropped; the corpus
    // bytes are never re-read. Structural oracle: survivors are exactly
    // the first poster of each seed (the q137 identical-seed →
    // identical-dHash argument).
    "q144_streaming_media_dedup" -> ((s, dir) => {
      import graft.operators.Multimodal
      val tmp = java.nio.file.Files.createTempDirectory("graft_q144").toString
      java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$tmp/src"))
      def mediaBatch(ids: Seq[(Long, Long)], batchNo: Int): DataFrame =
        Multimodal.withSynthImage(
          s.createDataFrame(ids).toDF("media_id", "seed"), "seed", 16, 16)
          .withColumn("batch", lit(batchNo))
      // batch 1: seeds 0..49 (all novel); batch 2: 25 dups of batch 1 +
      // seeds 125..149 novel; batch 3: 20 dups of batch 1 + 15 dups of
      // batch 2's novels + seeds 235..249 novel
      val b1 = (0L until 50L).map(i => (i, i))
      val b2 = (100L until 150L).map(i => (i, if (i < 125) i - 100 else i))
      val b3 = (200L until 250L).map(i =>
        (i, if (i < 220) i - 200 else if (i < 235) i - 95 else i))
      // file source orders batches by modification time (the q87 pattern)
      def addFile(df: DataFrame, stage: String, name: String, mtime: Long): Unit = {
        df.coalesce(1).write.parquet(s"$tmp/$stage")
        val part = new java.io.File(s"$tmp/$stage").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(s"$tmp/src/$name"))
        require(new java.io.File(s"$tmp/src/$name").setLastModified(mtime),
          s"cannot stamp mtime on $name")
      }
      val t0 = System.currentTimeMillis() - 60000
      addFile(mediaBatch(b1, 1), "s1", "batch1.parquet", t0)
      addFile(mediaBatch(b2, 2), "s2", "batch2.parquet", t0 + 2000)
      addFile(mediaBatch(b3, 3), "s3", "batch3.parquet", t0 + 4000)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("seed", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.types.StructField("batch", org.apache.spark.sql.types.IntegerType)))
      val reg = new graft.core.InstanceRegistry
      reg.register(graft.sources.ParquetFileDataObject("media_stream", s"$tmp/src",
        schema = Some(schema)))
      reg.register(graft.sources.ParquetFileDataObject("media_novel", s"$tmp/out",
        partitions = Seq("ingest_batch")))
      reg.register(graft.sources.ParquetFileDataObject("media_store", s"$tmp/store",
        partitions = Seq("ingest_batch")))
      implicit val ctx: graft.core.ActionPipelineContext =
        graft.core.ActionPipelineContext(s, reg)
      val action = graft.operators.StreamingIncrementalDedupAction("media_ingest",
        graft.operators.IncrementalMediaDedupTransformer("media_stream", "media_store",
          "media_id", modality = "image", maxHamming = 0,
          novelOutput = Some("media_novel")),
        graft.operators.modes.SparkStreamingMode(
          checkpointLocation = s"$tmp/cp", triggerType = "AvailableNow",
          inputOptions = Map("maxFilesPerTrigger" -> "1")))
      // fixed 50-image micro-batches: 8 shuffle partitions cut the
      // per-batch fixed task overhead (the q87/q79c knob)
      val prevSp = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try new graft.core.ActionDAGRun(Seq(action)).run()
      finally s.conf.set("spark.sql.shuffle.partitions", prevSp)
      s.read.parquet(s"$tmp/out").select(col("media_id"), col("batch"))
    }),

    // CONTINUOUS text ingestion dedup through the same declarative
    // StreamingIncrementalDedupAction — the TEXT twin of q144: per
    // micro-batch the docs are shingled/minhash-signed ONCE, joined
    // against the growing signature store (batch-keyed append partitions,
    // idempotent under replay), and only store-novel docs survive. Docs
    // are deterministic 40-token sequences of their seed (same seed →
    // identical text → jaccard 1; distinct seeds share ~no 5-gram
    // shingles at a 50k vocab), so the structural oracle is q144's:
    // survivors = the first poster of each seed.
    "q145_streaming_text_dedup" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q145").toString
      java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$tmp/src"))
      def docBatch(ids: Seq[(Long, Long)], batchNo: Int): DataFrame =
        s.createDataFrame(ids).toDF("doc_id", "seed")
          .withColumn("text", concat_ws(" ",
            transform(sequence(lit(0), lit(39)),
              i => concat(lit("w"),
                pmod(xxhash64(col("seed") * 1000 + i), lit(50000L))))))
          .withColumn("batch", lit(batchNo))
      val b1 = (0L until 50L).map(i => (i, i))
      val b2 = (100L until 150L).map(i => (i, if (i < 125) i - 100 else i))
      val b3 = (200L until 250L).map(i =>
        (i, if (i < 220) i - 200 else if (i < 235) i - 95 else i))
      def addFile(df: DataFrame, stage: String, name: String, mtime: Long): Unit = {
        df.coalesce(1).write.parquet(s"$tmp/$stage")
        val part = new java.io.File(s"$tmp/$stage").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(s"$tmp/src/$name"))
        require(new java.io.File(s"$tmp/src/$name").setLastModified(mtime),
          s"cannot stamp mtime on $name")
      }
      val t0 = System.currentTimeMillis() - 60000
      addFile(docBatch(b1, 1), "s1", "batch1.parquet", t0)
      addFile(docBatch(b2, 2), "s2", "batch2.parquet", t0 + 2000)
      addFile(docBatch(b3, 3), "s3", "batch3.parquet", t0 + 4000)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("seed", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("batch", org.apache.spark.sql.types.IntegerType)))
      val reg = new graft.core.InstanceRegistry
      reg.register(graft.sources.ParquetFileDataObject("doc_stream", s"$tmp/src",
        schema = Some(schema)))
      reg.register(graft.sources.ParquetFileDataObject("doc_novel", s"$tmp/out",
        partitions = Seq("ingest_batch")))
      reg.register(graft.sources.ParquetFileDataObject("doc_store", s"$tmp/store",
        partitions = Seq("ingest_batch")))
      implicit val ctx: graft.core.ActionPipelineContext =
        graft.core.ActionPipelineContext(s, reg)
      val action = graft.operators.StreamingIncrementalDedupAction("doc_ingest",
        graft.operators.IncrementalDedupTransformer("doc_stream", "doc_store",
          "doc_id", "text", threshold = 0.8, novelOutput = Some("doc_novel")),
        graft.operators.modes.SparkStreamingMode(
          checkpointLocation = s"$tmp/cp", triggerType = "AvailableNow",
          inputOptions = Map("maxFilesPerTrigger" -> "1")))
      val prevSp = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try new graft.core.ActionDAGRun(Seq(action)).run()
      finally s.conf.set("spark.sql.shuffle.partitions", prevSp)
      s.read.parquet(s"$tmp/out").select(col("doc_id"), col("batch"))
    }),

    // Incremental EMBEDDING dedup against a vector store — the semantic
    // leg of the incremental family (q51 text / q140 image / q141 audio /
    // q142 video): corpus vectors are hyperplane-LSH-signed ONCE into a
    // (id, emb, bucket) store; the delta signs only itself and
    // bucket-joins against the store, exact-cosine verified. Planted:
    // exact copies of every 10th-stored vector (identical vector →
    // identical bucket → structural recall, cosine 1) + genuinely novel
    // vectors. Output post-filtered to the planted pairs (the q39
    // argument: organic table near-dups exist, only the planted structure
    // is SQL-expressible).
    "q146_embedding_incremental_dedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val store = graft.functions.Dedup.embeddingStore(
        emb.where(col("vec_id") % 5 === 0), "vec_id", "embedding", dim = 64)
      val copies = emb.where(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
      val novel = emb.where(col("vec_id") % 5 === 1)
      graft.functions.Dedup.embeddingIncrementalPairs(
        copies.unionByName(novel), store, "vec_id", "embedding",
        dim = 64, threshold = 0.95)
        .where(col("id_new") === col("id_corpus") + 2000000L &&
          col("id_corpus") % 10 === 0)
        .select(col("id_new"), col("id_corpus"))
    }),

    // WITHIN-batch dedup in the incremental family: a real ingestion feed
    // bursts duplicates inside one micro-batch, and without intra-batch
    // dedup BOTH copies pass the store join (neither is stored yet) —
    // both reach the output and both signatures enter the store. The
    // transformer self-joins the batch on its already-persisted signature
    // frame (zero extra signings) and keeps the min-id head — the
    // reference contract is DeduplicateAction's within-load dedup.
    // Texts are q145's deterministic 40-token seed sequences (same seed →
    // jaccard 1; distinct seeds share ~no shingles), so the oracle is
    // structural: survivors = the min-id poster of each seed, across AND
    // within batches. Two transform runs: run 1 bootstraps the store from
    // an intra-dup-laden batch; run 2 dedups against store + itself.
    "q147_intra_batch_dedup" -> ((s, dir) => {
      def docs(ids: Seq[(Long, Long, Int)]): DataFrame =
        s.createDataFrame(ids).toDF("doc_id", "seed", "batch")
          .withColumn("text", concat_ws(" ",
            transform(sequence(lit(0), lit(39)),
              i => concat(lit("w"),
                pmod(xxhash64(col("seed") * 1000 + i), lit(50000L))))))
      // batch 1: ids 0..39 seed novelties; ids 40..49 re-post seeds 0..9
      // WITHIN the batch (intra dups — the min-id head survives)
      val b1 = docs((0L until 40L).map(i => (i, i, 1)) ++
        (40L until 50L).map(i => (i, i - 40, 1)))
      // batch 2: 100..119 novel, 120..129 intra dups of 100..109,
      // 130..144 store dups (seeds 0..14 — 0..9 stored via batch 1's
      // HEADS, so the store must hold head signatures), 145..149 novel
      val b2 = docs((100L until 120L).map(i => (i, i, 2)) ++
        (120L until 130L).map(i => (i, i - 20, 2)) ++
        (130L until 145L).map(i => (i, i - 130, 2)) ++
        (145L until 150L).map(i => (i, i, 2)))
      val tr = graft.operators.IncrementalDedupTransformer(
        "b", "store", "doc_id", "text", threshold = 0.8)
      implicit val ctx: graft.core.ActionPipelineContext =
        graft.core.ActionPipelineContext(s, new graft.core.InstanceRegistry)
      val run1 = tr.transform(Map("b" -> b1))
      // the store after run 1 = the bootstrap delta (store was empty)
      val run2 = tr.transform(Map("b" -> b2, "store" -> run1("store")))
      run1("b").select(col("doc_id"), col("batch"))
        .unionByName(run2("b").select(col("doc_id"), col("batch")))
    }),

    // ONE-PERMUTATION HASHING through the incremental store family: the
    // corpus-scale signing default (O(shingles + k) per row instead of
    // classic minhash's O(shingles × k)) oracled end-to-end — same
    // store-backed discipline as q147, signatures produced by the OPH
    // kernel. Signature VALUES differ from classic minhash (the sidecar
    // pins the scheme per store), but the dedup CONTRACT is identical:
    // exact copies sign identically and verify at shingle-jaccard 1, so
    // survivors = the min-id poster of each seed, across and within
    // batches — a structural oracle.
    "q148_oph_incremental_dedup" -> ((s, dir) => {
      def docs(ids: Seq[(Long, Long, Int)]): DataFrame =
        s.createDataFrame(ids).toDF("doc_id", "seed", "batch")
          .withColumn("text", concat_ws(" ",
            transform(sequence(lit(0), lit(39)),
              i => concat(lit("w"),
                pmod(xxhash64(col("seed") * 1000 + i), lit(50000L))))))
      // batch 1: seeds 0..29 novel; 30..34 re-post seeds 0..4 within-batch
      val b1 = docs((0L until 30L).map(i => (i, i, 1)) ++
        (30L until 35L).map(i => (i, i - 30, 1)))
      // batch 2: 100..114 novel, 115..124 re-post stored seeds 0..9,
      // 125..129 re-post 100..104 within-batch
      val b2 = docs((100L until 115L).map(i => (i, i, 2)) ++
        (115L until 125L).map(i => (i, i - 115, 2)) ++
        (125L until 130L).map(i => (i, i - 25, 2)))
      val tr = graft.operators.IncrementalDedupTransformer(
        "b", "store", "doc_id", "text", threshold = 0.8, signatureScheme = "oph")
      implicit val ctx: graft.core.ActionPipelineContext =
        graft.core.ActionPipelineContext(s, new graft.core.InstanceRegistry)
      val run1 = tr.transform(Map("b" -> b1))
      val run2 = tr.transform(Map("b" -> b2, "store" -> run1("store")))
      run1("b").select(col("doc_id"), col("batch"))
        .unionByName(run2("b").select(col("doc_id"), col("batch")))
    }),

    // BLOCKING-KEY-PRUNED signature store, end to end through the DAG:
    // the banded store layout (one row per band bucket, signature carried
    // for estimator verification) written PARTITIONED by
    // store_pfx = pmod(xxhash64(band, bucket), 64) — every batch's pair
    // join filters the store read to the delta's own bucket prefixes, so
    // parquet partition pruning skips the rest of the store's files: the
    // last per-batch O(store) READ term in the incremental family gone
    // (writes were already O(increment) via staged append). Three
    // ingestion runs with planted cross-batch and within-batch dups;
    // exact copies estimate signature agreement 1.0, distinct seeds share
    // ~no shingle hashes, so survivors = the min-id poster of each seed —
    // a structural oracle.
    "q149_pruned_store_dedup" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q149").toString
      def docs(ids: Seq[(Long, Long, Int)]): DataFrame =
        s.createDataFrame(ids).toDF("doc_id", "seed", "batch")
          .withColumn("text", concat_ws(" ",
            transform(sequence(lit(0), lit(39)),
              i => concat(lit("w"),
                pmod(xxhash64(col("seed") * 1000 + i), lit(50000L))))))
      // two ingestion runs (the three-batch growth ladder is spec'd in
      // PrunedStoreSpec; a bench query pays per-run DAG+write overhead,
      // so it plants every decision class in two): batch 1 seeds 0..39
      // novel + 40..44 within-batch re-posts; batch 2 100..119 novel,
      // 120..127 re-post STORED seeds, 128..129 within-batch re-posts
      val b1 = docs((0L until 40L).map(i => (i, i, 1)) ++
        (40L until 45L).map(i => (i, i - 40, 1)))
      val b2 = docs((100L until 120L).map(i => (i, i, 2)) ++
        (120L until 128L).map(i => (i, i - 120, 2)) ++
        (128L until 130L).map(i => (i, i - 28, 2)))
      val reg = new graft.core.InstanceRegistry
      reg.register(graft.sources.ParquetFileDataObject("docs_batch", s"$tmp/batch"))
      reg.register(graft.sources.ParquetFileDataObject("docs_novel", s"$tmp/novel"))
      // numberOfTasksPerPartition = 8: prefixes hash across 8 writer
      // tasks (each prefix still lands in exactly one task → one file per
      // touched prefix per batch — the file-count hygiene every
      // prefix-partitioned store should set), so a delta append writes
      // its prefix files in parallel instead of one task writing them
      // serially (measured 2.5s/run → 0.3s/run at this shape)
      reg.register(graft.sources.ParquetFileDataObject("docs_store", s"$tmp/store",
        partitions = Seq("store_pfx"), numberOfTasksPerPartition = Some(8)))
      implicit val ctx: graft.core.ActionPipelineContext =
        graft.core.ActionPipelineContext(s, reg)
      val action = graft.operators.CustomDataFrameAction(
        "inc", Seq("docs_batch"), Seq("docs_novel", "docs_store"),
        dfsTransformers = Seq(graft.operators.IncrementalDedupTransformer(
          "docs_batch", "docs_store", "doc_id", "text", threshold = 0.8,
          novelOutput = Some("docs_novel"),
          storeLayout = "banded", storePartitions = 16)),
        saveMode = Some(graft.core.SdlSaveMode.Append),
        recursiveInputIds = Seq("docs_store"))
      // small fixed batches: 8 shuffle partitions cut per-run task
      // overhead (the q87/q145 knob)
      val prevSp = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try Seq(b1, b2).foreach { b =>
        b.write.mode("overwrite").parquet(s"$tmp/batch")
        new graft.core.ActionDAGRun(Seq(action)).run()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevSp)
      s.read.parquet(s"$tmp/novel").select(col("doc_id"), col("batch"))
    }),

    // CONTINUOUS span scrubbing (ExactSubstr, store-backed): every batch
    // is cleaned against the corpus history's window-fingerprint store
    // plus itself, the batch is tokenized/fingerprinted ONCE, and the
    // store grows by appending the batch's window counts as PARTIAL rows
    // (summed per key after the delta semi-join — no read-merge-rewrite).
    // Plants cover every decision class: full history copy (all windows
    // dup → whole doc scrubbed), within-batch pair (both copies scrubbed
    // — window count 2), a PARTIAL span (8 fresh tokens + one stored
    // 8-token window → exactly that window's tokens removed), and a clean
    // doc. Audit counts are exact window arithmetic → structural oracle.
    "q150_incremental_span_store" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q150").toString
      def w(seed: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
        concat(lit("w"), pmod(xxhash64(seed * 1000 + i), lit(50000L)))
      def docs(ids: Seq[(Long, Long, Int)]): DataFrame =
        s.createDataFrame(ids).toDF("doc_id", "seed", "batch")
          .withColumn("text", concat_ws(" ",
            transform(sequence(lit(0), lit(39)), i => w(col("seed"), i))))
          .drop("seed")
      val b1 = docs((1L to 5L).map(i => (i, i, 1)))
      // 10 = full copy of seed 1; 11 novel; 12/13 an intra-batch pair;
      // 14 = 8 fresh tokens + seed 1's first 8 tokens (ONE stored window)
      val b2 = docs(Seq((10L, 1L, 2), (11L, 201L, 2), (12L, 202L, 2), (13L, 202L, 2)))
        .unionByName(s.createDataFrame(Seq((14L, 2))).toDF("doc_id", "batch")
          .withColumn("text", concat_ws(" ",
            concat_ws(" ", transform(sequence(lit(0), lit(7)), i => w(lit(777L), i))),
            concat_ws(" ", transform(sequence(lit(0), lit(7)), i => w(lit(1L), i))))))
      val reg = new graft.core.InstanceRegistry
      reg.register(graft.sources.ParquetFileDataObject("span_batch", s"$tmp/batch"))
      reg.register(graft.sources.ParquetFileDataObject("span_clean", s"$tmp/clean"))
      reg.register(graft.sources.ParquetFileDataObject("span_store", s"$tmp/store",
        partitions = Seq("store_pfx"), numberOfTasksPerPartition = Some(8)))
      implicit val ctx: graft.core.ActionPipelineContext =
        graft.core.ActionPipelineContext(s, reg)
      val action = graft.operators.CustomDataFrameAction(
        "scrub", Seq("span_batch"), Seq("span_clean", "span_store"),
        dfsTransformers = Seq(graft.operators.IncrementalSpanRemovalTransformer(
          "span_batch", "span_store", "doc_id", "text",
          windowTokens = 8, cleanOutput = Some("span_clean"), storePartitions = 16)),
        saveMode = Some(graft.core.SdlSaveMode.Append),
        recursiveInputIds = Seq("span_store"))
      val prevSp = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try Seq(b1, b2).foreach { b =>
        b.write.mode("overwrite").parquet(s"$tmp/batch")
        new graft.core.ActionDAGRun(Seq(action)).run()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevSp)
      s.read.parquet(s"$tmp/clean").select(col("doc_id"), col("batch"),
        col("n_tokens"), col("n_dup_windows"), col("n_removed_tokens"))
    }),

    // CONTINUOUS CCNet line dedup (store-backed): every batch's lines
    // counted against the history's line-count store plus the batch
    // itself — boilerplate (total count > maxOccurrences) dropped from
    // every occurrence, the store grown by appending partial count rows.
    // Plants: a line repeated WITHIN batch 1 (dropped from both docs at
    // run 1 — and its two partial... one count row enters the store), a
    // batch-2 line matching a SINGLY-stored batch-1 line (history makes
    // it boilerplate), a within-batch-2 pair, and clean docs. Line
    // arithmetic is exact → structural oracle.
    "q151_incremental_line_dedup" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q151").toString
      import s.implicits._
      val b1 = Seq(
        (1L, 1, "alpha one\nalpha two\ncookie banner accept all"),
        (2L, 1, "beta one\ncookie banner accept all\nbeta two"),
        (3L, 1, "gamma one\ngamma two\ngamma three"))
        .toDF("doc_id", "batch", "text")
      val b2 = Seq(
        (10L, 2, "alpha one\nfresh ten a\nfresh ten b"),
        (11L, 2, "delta one\ndelta two\ndelta three"),
        (12L, 2, "epsilon shared\ntwelve a\ntwelve b"),
        (13L, 2, "epsilon shared\nthirteen a\nthirteen b"))
        .toDF("doc_id", "batch", "text")
      val reg = new graft.core.InstanceRegistry
      reg.register(graft.sources.ParquetFileDataObject("line_batch", s"$tmp/batch"))
      reg.register(graft.sources.ParquetFileDataObject("line_clean", s"$tmp/clean"))
      reg.register(graft.sources.ParquetFileDataObject("line_store", s"$tmp/store",
        partitions = Seq("store_pfx"), numberOfTasksPerPartition = Some(8)))
      implicit val ctx: graft.core.ActionPipelineContext =
        graft.core.ActionPipelineContext(s, reg)
      val action = graft.operators.CustomDataFrameAction(
        "linescrub", Seq("line_batch"), Seq("line_clean", "line_store"),
        dfsTransformers = Seq(graft.operators.IncrementalLineDedupTransformer(
          "line_batch", "line_store", "doc_id", "text",
          cleanOutput = Some("line_clean"), storePartitions = 16)),
        saveMode = Some(graft.core.SdlSaveMode.Append),
        recursiveInputIds = Seq("line_store"))
      val prevSp = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try Seq(b1, b2).foreach { b =>
        b.write.mode("overwrite").parquet(s"$tmp/batch")
        new graft.core.ActionDAGRun(Seq(action)).run()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevSp)
      s.read.parquet(s"$tmp/clean").select(col("doc_id"), col("batch"),
        col("n_lines"), col("n_removed_lines"), col("text"))
    }),

    // CONTINUOUS media ingestion through the BLOCKED prefix-partitioned
    // image store (q149's discipline on the perceptual-fingerprint
    // modality): the store holds one row per Manku block key with the
    // dHash carried, laid out by store_pfx = pmod(xxhash64(block, bkey),
    // 16) — each batch's pair join reads only the store FILES in the
    // delta's own block-key set, with NO estimator trade (hamming on the
    // carried fingerprints; pigeonhole makes the pruning loss-free). Two
    // ingestion DAG runs planting every decision class incl. POSITIVE
    // store collisions (identical seed → identical dHash, the q137/q140
    // argument; distinct synth seeds sit far beyond hamming 2): batch 1
    // seeds 1..8 novel + id 9 re-posting seed 1 within the batch; batch 2
    // seeds 20..23 novel, id 24 re-posting STORED seed 2, id 25
    // re-posting seed 20 within the batch. Survivors = first poster of
    // each seed — a structural oracle.
    "q152_blocked_media_store_dedup" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q152").toString
      def imgs(rows: Seq[(Long, Long, Int)]): DataFrame =
        graft.operators.Multimodal.withSynthImage(
          s.createDataFrame(rows).toDF("media_id", "seed", "batch"), "seed", 16, 16)
          .drop("seed")
      val b1 = imgs((1L to 8L).map(i => (i, i, 1)) :+ (9L, 1L, 1))
      val b2 = imgs((20L to 23L).map(i => (i, i, 2)) ++ Seq((24L, 2L, 2), (25L, 20L, 2)))
      val reg = new graft.core.InstanceRegistry
      reg.register(graft.sources.ParquetFileDataObject("media_batch", s"$tmp/batch"))
      reg.register(graft.sources.ParquetFileDataObject("media_novel", s"$tmp/novel"))
      // the q149 cost-ladder knobs: 16 prefixes stay under the parallel-
      // listing threshold; 8 writer tasks give one file per touched prefix
      reg.register(graft.sources.ParquetFileDataObject("media_store", s"$tmp/store",
        partitions = Seq("store_pfx"), numberOfTasksPerPartition = Some(8)))
      implicit val ctx: graft.core.ActionPipelineContext =
        graft.core.ActionPipelineContext(s, reg)
      val action = graft.operators.CustomDataFrameAction(
        "incmedia", Seq("media_batch"), Seq("media_novel", "media_store"),
        dfsTransformers = Seq(graft.operators.IncrementalMediaDedupTransformer(
          "media_batch", "media_store", "media_id", modality = "image",
          maxHamming = 2, novelOutput = Some("media_novel"), storePartitions = 16)),
        saveMode = Some(graft.core.SdlSaveMode.Append),
        recursiveInputIds = Seq("media_store"))
      val prevSp = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try Seq(b1, b2).foreach { b =>
        b.write.mode("overwrite").parquet(s"$tmp/batch")
        new graft.core.ActionDAGRun(Seq(action)).run()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevSp)
      s.read.parquet(s"$tmp/novel").select(col("media_id"), col("batch"))
    }),

    // HOUSEKEEPING CHECKPOINT CLAMP end-to-end (the q144 streaming layout
    // + an aggressive retention + a genuine crash-replay): three committed
    // micro-batches, the LAST commit file removed (writes landed, commit
    // didn't — the at-least-once window), then a delete-EVERYTHING
    // retention sweep over the batchId-keyed store runs with the
    // streamingCheckpoint clamp. The clamp reads the commit log (last
    // committed = 1 after the removal) and lets retention delete ONLY
    // partition 0 — partitions 1 and 2 stay because the stream can still
    // replay them. The stream then restarts: batch 2 is REPLAYED against
    // the surviving store history and a fresh batch 3 arrives. The final
    // novel output hash-gates the whole sequence: had the clamp not held,
    // retention would have emptied the store and the replayed batch 2's
    // re-posts of batch-1 seeds (ids 210..219) plus batch 3's re-posts
    // (310..319) would re-enter as novel. Seed layout avoids batch-0
    // content in batches 2+ so deleting partition 0 (legitimate retention
    // of non-replayable history) never changes later decisions.
    "q153_housekeeping_checkpoint_clamp" -> ((s, dir) => {
      import graft.operators.Multimodal
      val tmp = java.nio.file.Files.createTempDirectory("graft_q153").toString
      java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$tmp/src"))
      def mediaBatch(ids: Seq[(Long, Long)], batchNo: Int): DataFrame =
        Multimodal.withSynthImage(
          s.createDataFrame(ids).toDF("media_id", "seed"), "seed", 16, 16)
          .withColumn("batch", lit(batchNo))
      def addFile(df: DataFrame, stage: String, name: String, mtime: Long): Unit = {
        df.coalesce(1).write.parquet(s"$tmp/$stage")
        val part = new java.io.File(s"$tmp/$stage").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(s"$tmp/src/$name"))
        require(new java.io.File(s"$tmp/src/$name").setLastModified(mtime),
          s"cannot stamp mtime on $name")
      }
      // b1: seeds 0..19 novel; b2: 100..119 novel + re-posts of b1 seeds
      // (120..129 → seeds 0..9); b3: 200..209 novel + re-posts of b2 seeds
      // (210..219 → seeds 100..109); b4 (arrives after the restart):
      // 300..309 novel + re-posts of b3 (310..314 → 200..204) and b2
      // (315..319 → 100..104) seeds
      val b1 = (0L until 20L).map(i => (i, i))
      val b2 = (100L until 120L).map(i => (i, i)) ++ (120L until 130L).map(i => (i, i - 120))
      val b3 = (200L until 210L).map(i => (i, i)) ++ (210L until 220L).map(i => (i, i - 110))
      val b4 = (300L until 310L).map(i => (i, i)) ++
        (310L until 315L).map(i => (i, i - 110)) ++ (315L until 320L).map(i => (i, i - 215))
      val t0 = System.currentTimeMillis() - 60000
      addFile(mediaBatch(b1, 1), "s1", "batch1.parquet", t0)
      addFile(mediaBatch(b2, 2), "s2", "batch2.parquet", t0 + 2000)
      addFile(mediaBatch(b3, 3), "s3", "batch3.parquet", t0 + 4000)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("seed", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.types.StructField("batch", org.apache.spark.sql.types.IntegerType)))
      val reg = new graft.core.InstanceRegistry
      reg.register(graft.sources.ParquetFileDataObject("media_stream", s"$tmp/src",
        schema = Some(schema)))
      reg.register(graft.sources.ParquetFileDataObject("media_novel", s"$tmp/out",
        partitions = Seq("ingest_batch")))
      reg.register(graft.sources.ParquetFileDataObject("media_store", s"$tmp/store",
        partitions = Seq("ingest_batch")))
      implicit val ctx: graft.core.ActionPipelineContext =
        graft.core.ActionPipelineContext(s, reg)
      def mkAction() = graft.operators.StreamingIncrementalDedupAction("clamp_ingest",
        graft.operators.IncrementalMediaDedupTransformer("media_stream", "media_store",
          "media_id", modality = "image", maxHamming = 0,
          novelOutput = Some("media_novel")),
        graft.operators.modes.SparkStreamingMode(
          checkpointLocation = s"$tmp/cp", triggerType = "AvailableNow",
          inputOptions = Map("maxFilesPerTrigger" -> "1")))
      val prevSp = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        new graft.core.ActionDAGRun(Seq(mkAction())).run()
        // the crash: batch 2's writes landed but its commit didn't. Delete
        // through the Hadoop FS so the ChecksumFs .crc sidecar goes with it
        // — a stale crc makes the replay's own commit re-add fail as a
        // phantom concurrent writer
        val commit2 = new org.apache.hadoop.fs.Path(s"$tmp/cp/commits/2")
        val cfs = commit2.getFileSystem(s.sparkContext.hadoopConfiguration)
        require(cfs.exists(commit2), "three commits expected before the simulated crash")
        require(cfs.delete(commit2, false), "cannot remove the last commit file")
        // delete-EVERYTHING retention over the store, clamped to the
        // checkpoint: last committed is now 1, so only partition 0 may go
        graft.sources.PartitionRetentionMode(retentionCondition = "false",
            streamingCheckpoint = Some(s"$tmp/cp"))
          .exec(reg.dataObject("media_store").asInstanceOf[graft.sources.SparkFileDataObject])
        val left = new java.io.File(s"$tmp/store").listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith("ingest_batch="))
          .map(_.getName).sorted.toSeq
        require(left == Seq("ingest_batch=1", "ingest_batch=2"),
          s"clamp must keep exactly the replayable partitions, got $left")
        // restart: batch 2 replays against the surviving history, then the
        // new file is picked up as batch 3
        addFile(mediaBatch(b4, 4), "s4", "batch4.parquet", t0 + 6000)
        new graft.core.ActionDAGRun(Seq(mkAction())).run()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevSp)
      s.read.parquet(s"$tmp/out").select(col("media_id"), col("batch"))
    }),

    // BATCH-KEYED NOVEL SINK end-to-end (exactly-once novel output on the
    // batch path): run 1 dies BETWEEN the novel write and the store append
    // (an always-failing constraint on the store — non-recursive outputs
    // write first, so the novel partition has already landed); the
    // guard-permitted rerun then OVERWRITES its own batch partition via
    // the batch-keyed dynamic partition overwrite instead of re-appending
    // it, and a second batch dedups against the store the rerun committed.
    // The hash gates the whole sequence: with a plain Append novel sink,
    // batch 1's rows would appear twice.
    "q154_batchkeyed_novel_rerun" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q154").toString
      def doc(id: Long, seed: Long): (Long, String) =
        (id, (0 until 40).map(i => s"w${seed}_$i").mkString(" "))
      def transformer(batchKey: String) = graft.operators.IncrementalDedupTransformer(
        "docs_batch", "sig_store", "doc_id", "text",
        threshold = 0.5, bands = 16, novelOutput = Some("docs_novel"),
        novelBatchKeyColumn = Some("ingest_batch"), novelBatchKeyValue = Some(batchKey))
      def action(batchKey: String) = graft.operators.CustomDataFrameAction(
        "inc154", Seq("docs_batch"), Seq("docs_novel", "sig_store"),
        dfsTransformers = Seq(transformer(batchKey)),
        saveMode = Some(graft.core.SdlSaveMode.Append),
        recursiveInputIds = Seq("sig_store"))
      def registry(storeConstraints: Seq[graft.quality.Constraint]) = {
        val reg = new graft.core.InstanceRegistry
        reg.register(graft.sources.ParquetFileDataObject("docs_batch", s"$tmp/batch"))
        reg.register(graft.sources.ParquetFileDataObject("docs_novel", s"$tmp/novel",
          partitions = Seq("ingest_batch")))
        reg.register(graft.sources.ParquetFileDataObject("sig_store", s"$tmp/store",
          constraints = storeConstraints))
        reg
      }
      val prevSp = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        // batch 1: ids 1..10, all novel
        s.createDataFrame((1L to 10L).map(i => doc(i, i))).toDF("doc_id", "text")
          .write.mode("overwrite").parquet(s"$tmp/batch")
        // run 1: the STORE append dies after the novel write landed
        val broken = registry(Seq(graft.quality.Constraint("store_down", "id IS NULL")))
        val failed = try {
          new graft.core.ActionDAGRun(Seq(action("b1")))
            .run()(graft.core.ActionPipelineContext(s, broken)); false
        } catch { case _: Exception => true }
        require(failed, "run 1 must die at the store constraint")
        require(s.read.parquet(s"$tmp/novel").count() == 10,
          "the novel partition lands before the store append fails")
        // run 2 (healthy store): guard permits — the append never
        // committed — and the rerun OVERWRITES partition b1
        implicit val ctx: graft.core.ActionPipelineContext =
          graft.core.ActionPipelineContext(s, registry(Seq.empty))
        new graft.core.ActionDAGRun(Seq(action("b1"))).run()
        // batch 2: 21..25 novel, 26..30 re-post batch 1's texts
        s.createDataFrame((21L to 25L).map(i => doc(i, i)) ++
            (26L to 30L).map(i => doc(i, i - 25)))
          .toDF("doc_id", "text").write.mode("overwrite").parquet(s"$tmp/batch")
        new graft.core.ActionDAGRun(Seq(action("b2"))).run()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevSp)
      s.read.parquet(s"$tmp/novel")
        .select(col("doc_id"), col("ingest_batch").cast("string").as("ingest_batch"))
    }),

    // CATALOG / LINEAGE EXPORT (the reference's ActionsExporter +
    // DataObjectsExporter surface, previously spec-only): a HOCON config
    // is parsed through the real ConfigParser — data objects with and
    // without metadata blocks, a multi-input/multi-output action and a
    // copy — and the two exporters' frames are joined into the lineage
    // edge table a catalog would ingest (one row per action×input, the
    // input's type/location/metadata resolved). Hash-gates the parse of
    // metadata fields (name/layer/tags incl. the empty-tags vs no-metadata
    // NULL distinction), class names, and the id-list encoding.
    "q155_catalog_lineage_export" -> ((s, dir) => {
      val cfg =
        """dataObjects {
          |  cust155 {
          |    type = parquet, path = "/data/lake/staging/customers"
          |    metadata = { name = "Customers", description = "raw customer feed",
          |                 layer = staging, subjectArea = crm, tags = [pii, daily] }
          |  }
          |  ord155 {
          |    type = csv, path = "/data/lake/staging/orders"
          |    metadata = { layer = staging, subjectArea = sales }
          |  }
          |  mart155 {
          |    type = parquet, path = "/data/lake/mart/cust_orders"
          |    metadata = { name = "CustOrders", layer = mart }
          |  }
          |  audit155 { type = parquet, path = "/data/lake/mart/audit" }
          |}
          |actions {
          |  build155 {
          |    type = customDataFrame
          |    inputIds = [cust155, ord155]
          |    outputIds = [mart155, audit155]
          |    outputSql = { mart155 = "select 1 as one", audit155 = "select 1 as one" }
          |  }
          |  copy155 { type = copy, inputId = cust155, outputId = audit155 }
          |}
          |""".stripMargin
      val reg = graft.core.ConfigParser.parse(cfg)
      implicit val ctx: graft.core.ActionPipelineContext =
        graft.core.ActionPipelineContext(s, reg)
      val dos = graft.sources.DataObjectsExporterDataObject("do_exp").getDataFrame()
      val acts = graft.sources.ActionsExporterDataObject("act_exp").getDataFrame()
      acts.withColumn("input_id", explode(split(col("input_ids"), ",")))
        .join(dos.select(col("id").as("input_id"), col("type").as("input_type"),
          col("location").as("input_location"), col("name").as("input_name"),
          col("layer").as("input_layer"), col("tags").as("input_tags")), Seq("input_id"))
        .select(col("id").as("action_id"), col("type").as("action_type"),
          col("input_id"), col("input_type"), col("input_location"),
          col("input_name"), col("input_layer"), col("input_tags"),
          col("output_ids"))
    }),

    // CUSTOM DF SOURCE by CLASS NAME (the reference's CustomDfCreator
    // reflection contract, previously programmatic+spec-only): the HOCON
    // config names a creator class ([[Q156SyntheticFeed]]) with options;
    // the parser resolves it reflectively at parse time and a copy action
    // pipelines the generated frame into parquet. The hash gates the
    // class resolution, the options pass-through, and the pipeline write.
    "q156_custom_df_classname" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q156").toString
      val cfg =
        s"""dataObjects {
           |  src156 {
           |    type = customDf
           |    className = "graft.Q156SyntheticFeed"
           |    options = { rows = "200", factor = "3", prefix = "row_" }
           |  }
           |  dst156 { type = parquet, path = "$tmp/dst" }
           |}
           |actions {
           |  load156 { type = copy, inputId = src156, outputId = dst156,
           |            metadata = { feed = q156 } }
           |}
           |""".stripMargin
      core.PipelineRunner.run(cfg, s, feedSel = Some("q156"))
      s.read.parquet(s"$tmp/dst").select(col("k"), col("v"), col("tag"))
    }),

    // CONFIG-ONLY EXACTLY-ONCE NOVEL OUTPUT (the derived batch key): the
    // incremental transformer sets novelBatchKeyColumn but NO value — the
    // enclosing action derives the key from PartitionDiffMode's batch
    // identity (the selected partition values, reference
    // `executionMode/PartitionDiffMode.scala:61-170`), so no driver loop
    // threads a key anywhere. Run 1 (dt=2024-01-01) dies BETWEEN the
    // novel write and the store append; the recovery rerun passes the
    // SAME partition explicitly (the diff would skip the half-written
    // partition — explicitly requested partitions win over the diff, the
    // reference's recovery practice) and, the token being a pure function
    // of the partition values, OVERWRITES its own batch partition instead
    // of re-appending. Run 3 diffs to dt=2024-01-02 alone and dedups
    // against the store the rerun committed. The hash gates the derived
    // tokens, the exactly-once rerun, and the cross-batch dedup at once.
    "q157_derived_batchkey_partitiondiff" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q157").toString
      def doc(id: Long, seed: Long): (Long, String) =
        (id, (0 until 40).map(i => s"w${seed}_$i").mkString(" "))
      def writeBatch(dt: String, docs: Seq[(Long, String)]): Unit =
        s.createDataFrame(docs).toDF("doc_id", "text")
          .withColumn("dt", lit(dt))
          .write.mode("append").partitionBy("dt").parquet(s"$tmp/batch")
      val action = graft.operators.CustomDataFrameAction(
        "inc157", Seq("docs_batch"), Seq("docs_novel", "sig_store"),
        dfsTransformers = Seq(graft.operators.IncrementalDedupTransformer(
          "docs_batch", "sig_store", "doc_id", "text",
          threshold = 0.5, bands = 16, novelOutput = Some("docs_novel"),
          novelBatchKeyColumn = Some("ingest_batch"))), // no value: derived
        saveMode = Some(graft.core.SdlSaveMode.Append),
        recursiveInputIds = Seq("sig_store"),
        executionMode = Some(graft.operators.modes.PartitionDiffMode()))
      def registry(storeConstraints: Seq[graft.quality.Constraint]) = {
        val reg = new graft.core.InstanceRegistry
        reg.register(graft.sources.ParquetFileDataObject("docs_batch", s"$tmp/batch",
          partitions = Seq("dt")))
        // batch key first (the dynamic-overwrite target), dt second (the
        // partition-diff key) — sub-partitioning by dt keeps the diff and
        // the keyed overwrite on one sink
        reg.register(graft.sources.ParquetFileDataObject("docs_novel", s"$tmp/novel",
          partitions = Seq("ingest_batch", "dt")))
        reg.register(graft.sources.ParquetFileDataObject("sig_store", s"$tmp/store",
          constraints = storeConstraints))
        reg
      }
      val prevSp = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        // batch dt=2024-01-01: ids 1..10, all novel
        writeBatch("2024-01-01", (1L to 10L).map(i => doc(i, i)))
        // run 1: the STORE append dies after the novel write landed
        val broken = registry(Seq(graft.quality.Constraint("store_down", "id IS NULL")))
        val failed = try {
          new graft.core.ActionDAGRun(Seq(action))
            .run()(graft.core.ActionPipelineContext(s, broken)); false
        } catch { case _: Exception => true }
        require(failed, "run 1 must die at the store constraint")
        require(s.read.parquet(s"$tmp/novel").count() == 10,
          "the novel partition lands before the store append fails")
        // run 2 (healthy store): the recovery rerun names the SAME batch
        // by explicit partition values — same derived key, guard permits
        // (the append never committed), partition overwritten not doubled
        implicit val ctx: graft.core.ActionPipelineContext =
          graft.core.ActionPipelineContext(s, registry(Seq.empty))
        new graft.core.ActionDAGRun(Seq(action)).run(Seq(graft.core.SubFeed(
          "docs_batch", partitionValues = Seq(
            graft.core.PartitionValues(Map("dt" -> "2024-01-01"))))))
        // batch dt=2024-01-02: 21..25 novel, 26..30 re-post batch 1's
        // texts; the diff selects ONLY the new partition
        writeBatch("2024-01-02", (21L to 25L).map(i => doc(i, i)) ++
          (26L to 30L).map(i => doc(i, i - 25)))
        new graft.core.ActionDAGRun(Seq(action)).run()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevSp)
      s.read.parquet(s"$tmp/novel")
        .select(col("doc_id"), col("dt").cast("string").as("dt"),
          col("ingest_batch").cast("string").as("ingest_batch"))
    }),

    // JMS RECEIVER against a LIVE loopback queue (the q93/q101 pattern —
    // upgrading the JMS row from injected-fake specs to the oracle): a
    // broker stub serves the nation table as JSON text messages over a
    // real TCP socket with a line protocol (RECV → one message or NONE,
    // ACK n → cumulative CLIENT_ACKNOWLEDGE commit); the DataObject runs
    // the reference's synchronous batch-receive loop against it
    // (`sdl-jms/.../SynchronousJmsReceiver.scala:62-125`: poll with
    // maxWait, stop at batchSize, intermediate ack every txBatchSize).
    // The run asserts every message was committed to the broker and the
    // hash gates the full payload decode.
    "q158_jms_loopback_queue" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      def js(v: String): String = "\"" + v.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case ch => ch.toString } + "\""
      val msgs = t(s, dir, "nation")
        .select(col("n_nationkey").cast("int"), col("n_name"), col("n_regionkey").cast("int"))
        .collect().sortBy(_.getInt(0)).map(r =>
          s"""{"n_nationkey":${r.getInt(0)},"n_name":${js(r.getString(1))},"n_regionkey":${r.getInt(2)}}""")
      // ---- broker stub: one queue, cumulative-ack bookkeeping ----
      val acked = new java.util.concurrent.atomic.AtomicInteger(0)
      val server = new java.net.ServerSocket(0, 1, java.net.InetAddress.getByName("127.0.0.1"))
      val broker = new Thread(() => {
        try {
          val sock = server.accept()
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
          val out = new java.io.PrintWriter(
            new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8"), true)
          var next = 0
          var line = in.readLine()
          while (line != null) {
            if (line == "RECV") {
              if (next < msgs.length) { out.println("MSG " + msgs(next)); next += 1 }
              else out.println("NONE")
            } else if (line.startsWith("ACK ")) {
              // cumulative: acking message n commits 1..n
              acked.set(line.drop(4).trim.toInt); out.println("OK")
            }
            line = in.readLine()
          }
          sock.close()
        } catch { case _: java.net.SocketException => () }
      })
      broker.setDaemon(true); broker.start()
      try {
        val port = server.getLocalPort
        def consumer(): sources.JmsConsumer = new sources.JmsConsumer {
          private val sock = new java.net.Socket("127.0.0.1", port)
          private val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
          private val out = new java.io.PrintWriter(
            new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8"), true)
          private var delivered = 0
          override def receive(maxWaitMs: Long): sources.JmsMessage = {
            sock.setSoTimeout(math.max(1, maxWaitMs).toInt)
            out.println("RECV")
            val resp = in.readLine()
            if (resp == null || resp == "NONE") null
            else {
              delivered += 1; val d = delivered
              new sources.JmsMessage {
                val text: String = resp.drop(4)
                def acknowledge(): Unit = { out.println(s"ACK $d"); in.readLine(); () }
              }
            }
          }
          override def close(): Unit = sock.close()
        }
        val df = sources.JmsDataObject("q158_jms", () => consumer(),
          batchSize = msgs.length, maxWaitMs = 1000, maxBatchAgeMs = 60000,
          txBatchSize = 7,
          schema = Some(StructType(Seq(
            StructField("n_nationkey", IntegerType),
            StructField("n_name", StringType),
            StructField("n_regionkey", IntegerType)))))
          .getDataFrame() // the receive/ack loop runs eagerly in here
        require(acked.get() == msgs.length,
          s"every delivered message must be committed to the broker, acked=${acked.get()}")
        df.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      } finally server.close()
    }),

    // SFTP-SHAPED FILE TRANSFER against a LIVE loopback file server (the
    // FileRef surface the reference models SFTP downloads with,
    // `sdl-core/.../SFtpFileRefDataObject.scala` — the ssh jar is
    // out-of-env, so the remote speaks a line protocol over a real TCP
    // socket: LIST glob → refs, GET path → bytes; the graft-side
    // [[graft.sources.FileRefTransport]] client plugs into the SAME
    // FileRefDataObject as the Hadoop transport). Two transfer passes
    // exercise the modified-after watermark: pass 1 lands four region
    // files; a fifth appears with a newer mtime and pass 2 moves ONLY it.
    // The landed CSVs read back through CsvFileDataObject and the hash
    // gates the full download path.
    "q159_sftp_fileref_transfer" -> ((s, dir) => {
      implicit val c: ActionPipelineContext = ctx(s)
      val lnd = java.nio.file.Files.createTempDirectory("graft_q159").toString
      val byRegion = t(s, dir, "nation")
        .select(col("n_nationkey").cast("int"), col("n_name"), col("n_regionkey").cast("int"))
        .collect().groupBy(_.getInt(2))
      def csv(r: Int): Array[Byte] =
        ("n_nationkey,n_name,n_regionkey\n" + byRegion(r).sortBy(_.getInt(0))
          .map(row => s"${row.getInt(0)},${row.getString(1)},${row.getInt(2)}")
          .mkString("\n") + "\n").getBytes("UTF-8")
      // ---- remote stub: path → (bytes, mtime); one command per connection
      val remote = new java.util.concurrent.ConcurrentHashMap[String, (Array[Byte], Long)]()
      (0 to 3).foreach(r => remote.put(s"/outbox/region_$r.csv", (csv(r), 1000L + r)))
      val server = new java.net.ServerSocket(0, 8, java.net.InetAddress.getByName("127.0.0.1"))
      val srv = new Thread(() => {
        try while (true) {
          val sock = server.accept()
          try {
            val in = new java.io.BufferedReader(
              new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
            val out = sock.getOutputStream
            def line(t: String): Unit = out.write((t + "\n").getBytes("UTF-8"))
            val cmd = in.readLine()
            if (cmd != null && cmd.startsWith("LIST ")) {
              val m = java.nio.file.FileSystems.getDefault
                .getPathMatcher("glob:" + cmd.drop(5))
              remote.forEach { (p, fm) =>
                if (m.matches(java.nio.file.Paths.get(p)))
                  line(s"F $p ${fm._1.length} ${fm._2}")
              }
              line("END")
            } else if (cmd != null && cmd.startsWith("GET ")) {
              Option(remote.get(cmd.drop(4))) match {
                case Some((bytes, _)) => line(s"SIZE ${bytes.length}"); out.write(bytes)
                case None => line("SIZE -1")
              }
            }
            out.flush()
          } finally sock.close()
        } catch { case _: java.net.SocketException => () }
      })
      srv.setDaemon(true); srv.start()
      try {
        val port = server.getLocalPort
        // graft-side protocol client behind the SAME FileRefTransport
        // interface the Hadoop transport implements — download-only, like
        // an SFTP source remote
        val sftpLike = new sources.FileRefTransport {
          private def connect[T](send: String)(read: java.io.InputStream => T): T = {
            val sock = new java.net.Socket("127.0.0.1", port)
            try {
              sock.getOutputStream.write((send + "\n").getBytes("UTF-8"))
              sock.getOutputStream.flush()
              read(sock.getInputStream)
            } finally sock.close()
          }
          private def readLine(in: java.io.InputStream): String = {
            val sb = new StringBuilder
            var b = in.read()
            while (b != -1 && b != '\n') { sb.append(b.toChar); b = in.read() }
            sb.toString
          }
          override def list(pattern: String): Seq[sources.FileRef] =
            connect(s"LIST $pattern") { in =>
              Iterator.continually(readLine(in)).takeWhile(_ != "END")
                .collect { case l if l.startsWith("F ") =>
                  val Array(p, sz, mt) = l.drop(2).split(' ')
                  sources.FileRef(p, sz.toLong, mt.toLong)
                }.toSeq
            }
          override def open(path: String): java.io.InputStream =
            connect(s"GET $path") { in =>
              val n = readLine(in).stripPrefix("SIZE ").toInt
              require(n >= 0, s"remote has no file $path")
              val buf = new Array[Byte](n)
              var off = 0
              while (off < n) {
                val r = in.read(buf, off, n - off)
                require(r > 0, s"short read from remote at $off/$n"); off += r
              }
              new java.io.ByteArrayInputStream(buf)
            }
          override def put(path: String, in: java.io.InputStream): Unit =
            throw new UnsupportedOperationException("download-only remote")
        }
        val src = sources.FileRefDataObject("q159_remote", "/outbox/*.csv", sftpLike)
        val dst = sources.FileRefDataObject("q159_landing", s"$lnd/*",
          new sources.HadoopFileRefTransport(s.sparkContext.hadoopConfiguration),
          targetDir = Some(lnd))
        val pass1 = src.transferTo(dst)
        require(pass1.size == 4, s"pass 1 must land the four initial files, got ${pass1.size}")
        // a fifth file arrives with a newer mtime; the watermark admits
        // ONLY it on the next pass
        remote.put("/outbox/region_4.csv", (csv(4), 2000L))
        val pass2 = src.transferTo(dst)
        require(pass2.map(_.path) == Seq("/outbox/region_4.csv"),
          s"pass 2 must move only the new file, got ${pass2.map(_.path)}")
        sources.CsvFileDataObject("q159_csv", lnd,
          schema = Some(StructType(Seq(
            StructField("n_nationkey", IntegerType),
            StructField("n_name", StringType),
            StructField("n_regionkey", IntegerType)))))
          .getDataFrame()
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      } finally server.close()
    })
  )

  private val T1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private val T2 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")

  /** Render SCD2 timestamp columns as fixed-precision strings for the oracle
    * compare. The doomsday bound 9999-12-31 overflows pandas' datetime64[ns]
    * range (max 2262-04-11), so a timestamp-typed result column hashes
    * differently depending on how the driver materializes it; a millisecond
    * string is representation-independent. The DuckDB side mirrors this with
    * strftime(..., '%Y-%m-%d %H:%M:%S.%g'). */
  private def fmtTs(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, date_format(col(c), "yyyy-MM-dd HH:mm:ss.SSS")))

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' AND l_discount > 0.05""".stripMargin,
    "q3_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS num_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q4_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q5_distinct_counts" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS distinct_parts,
        |  count(DISTINCT l_suppkey) AS distinct_supps,
        |  count(*) AS num_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q6_latest_event_per_user" ->
      """SELECT user_id, event_id, ts, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "q7_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""".stripMargin,
    "q8_customers_with_big_orders" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin,
    "q9_part_symmetric_difference" ->
      """WITH a AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity >= 49),
        |     b AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity <= 2)
        |SELECT l_partkey, TRUE AS in_first FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        |UNION ALL
        |SELECT l_partkey, FALSE AS in_first FROM (SELECT * FROM b EXCEPT SELECT * FROM a)""".stripMargin,
    "q10_rollup_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS num_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q11_string_functions" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_upper,
        |  substring(p_type, 1, 5) AS type_prefix,
        |  concat(p_brand, '#', p_type) AS brand_type,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  CAST(floor(p_retailprice * 10) AS BIGINT) AS price_tenths
        |FROM part""".stripMargin,
    "q12_date_functions" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS order_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS order_month,
        |  CAST(day(o_orderdate) AS INTEGER) AS order_day,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
        |FROM orders""".stripMargin,
    "q13_conditional_agg" ->
      """SELECT o_orderpriority,
        |  count(*) AS num_orders,
        |  CAST(sum(CASE WHEN o_totalprice > 250000.0 THEN 1 ELSE 0 END) AS BIGINT) AS num_big,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS num_finished
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q14_pk_violators" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IS NULL OR o_custkey IN (
        |  SELECT o_custkey FROM orders GROUP BY o_custkey HAVING count(*) > 1)""".stripMargin,
    "q15_orders_per_customer" ->
      """SELECT c_custkey,
        |  count(o_orderkey) AS num_orders,
        |  CAST(sum(CAST(coalesce(o_totalprice, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,
    // q16_approx_distinct: HLL sketch result is engine-specific — rows-only check.
    "q17_dedup_two_loads" ->
      """WITH existing AS (
        |  SELECT o_orderkey, o_totalprice, TIMESTAMP '2024-01-01' AS dl_ts_captured
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |feed AS (
        |  SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice, TIMESTAMP '2024-01-02' AS dl_ts_captured
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |u AS (SELECT * FROM existing UNION ALL SELECT * FROM feed)
        |SELECT o_orderkey, o_totalprice, dl_ts_captured FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY dl_ts_captured DESC) AS rn FROM u)
        |WHERE rn = 1""".stripMargin,
    // dl_ts_* rendered as ms-strings on both sides: the doomsday bound
    // 9999-12-31 is outside pandas' datetime64[ns] range, so a
    // timestamp-typed column is representation-dependent in the compare.
    "q18_historize_full" ->
      """SELECT c_custkey, c_acctbal,
        |  strftime(dl_ts_captured, '%Y-%m-%d %H:%M:%S.%g') AS dl_ts_captured,
        |  strftime(dl_ts_delimited, '%Y-%m-%d %H:%M:%S.%g') AS dl_ts_delimited
        |FROM (
        |WITH cur AS (SELECT c_custkey, c_acctbal FROM customer),
        |feed AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal
        |  FROM customer WHERE c_custkey % 5 <> 0)
        |SELECT e.c_custkey, e.c_acctbal,
        |  TIMESTAMP '2024-01-01' AS dl_ts_captured, TIMESTAMP '9999-12-31' AS dl_ts_delimited
        |FROM cur e JOIN feed n ON e.c_custkey = n.c_custkey AND e.c_acctbal = n.c_acctbal
        |UNION ALL
        |SELECT e.c_custkey, e.c_acctbal, TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-01 23:59:59.999'
        |FROM cur e LEFT JOIN feed n ON e.c_custkey = n.c_custkey
        |WHERE n.c_custkey IS NULL OR e.c_acctbal <> n.c_acctbal
        |UNION ALL
        |SELECT n.c_custkey, n.c_acctbal, TIMESTAMP '2024-01-02', TIMESTAMP '9999-12-31'
        |FROM feed n LEFT JOIN cur e ON n.c_custkey = e.c_custkey
        |WHERE e.c_custkey IS NULL OR e.c_acctbal <> n.c_acctbal
        |)""".stripMargin,
    "q19_historize_incremental" ->
      """SELECT c_custkey, c_acctbal,
        |  strftime(dl_ts_captured, '%Y-%m-%d %H:%M:%S.%g') AS dl_ts_captured,
        |  strftime(dl_ts_delimited, '%Y-%m-%d %H:%M:%S.%g') AS dl_ts_delimited
        |FROM (
        |WITH cur AS (SELECT c_custkey, c_acctbal FROM customer),
        |feed AS (SELECT c_custkey, c_acctbal + 50.0 AS c_acctbal FROM customer WHERE c_custkey % 4 = 0)
        |SELECT e.c_custkey, e.c_acctbal,
        |  TIMESTAMP '2024-01-01' AS dl_ts_captured, TIMESTAMP '9999-12-31' AS dl_ts_delimited
        |FROM cur e LEFT JOIN feed n ON e.c_custkey = n.c_custkey
        |WHERE n.c_custkey IS NULL OR e.c_acctbal = n.c_acctbal
        |UNION ALL
        |SELECT e.c_custkey, e.c_acctbal, TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-01 23:59:59.999'
        |FROM cur e JOIN feed n ON e.c_custkey = n.c_custkey
        |WHERE e.c_acctbal <> n.c_acctbal
        |UNION ALL
        |SELECT n.c_custkey, n.c_acctbal, TIMESTAMP '2024-01-02', TIMESTAMP '9999-12-31'
        |FROM feed n LEFT JOIN cur e ON n.c_custkey = e.c_custkey
        |WHERE e.c_custkey IS NULL OR e.c_acctbal <> n.c_acctbal
        |)""".stripMargin,
    "q20_cdc_historize" ->
      """SELECT user_id, event_id, value,
        |  strftime(dl_ts_captured, '%Y-%m-%d %H:%M:%S.%g') AS dl_ts_captured,
        |  strftime(dl_ts_delimited, '%Y-%m-%d %H:%M:%S.%g') AS dl_ts_delimited
        |FROM (
        |SELECT user_id, event_id, value, ts AS dl_ts_captured,
        |  CASE WHEN next_ts IS NULL THEN TIMESTAMP '9999-12-31'
        |       ELSE next_ts - INTERVAL 1 MILLISECOND END AS dl_ts_delimited
        |FROM (
        |  SELECT user_id, event_id, value, ts, event_type,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        |  FROM events)
        |WHERE event_type <> 'error'
        |)""".stripMargin,
    "q21_merge_upsert" ->
      """WITH existing AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 3 <> 0),
        |feed AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice * 1.1 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT e.o_orderkey,
        |  CASE WHEN n.o_totalprice > e.o_totalprice THEN n.o_orderstatus ELSE e.o_orderstatus END AS o_orderstatus,
        |  CASE WHEN n.o_totalprice > e.o_totalprice THEN n.o_totalprice ELSE e.o_totalprice END AS o_totalprice
        |FROM existing e JOIN feed n ON e.o_orderkey = n.o_orderkey
        |WHERE n.o_orderstatus <> 'P'
        |UNION ALL
        |SELECT e.o_orderkey, e.o_orderstatus, e.o_totalprice
        |FROM existing e LEFT JOIN feed n ON e.o_orderkey = n.o_orderkey
        |WHERE n.o_orderkey IS NULL
        |UNION ALL
        |SELECT n.o_orderkey, n.o_orderstatus, n.o_totalprice
        |FROM feed n LEFT JOIN existing e ON n.o_orderkey = e.o_orderkey
        |WHERE e.o_orderkey IS NULL""".stripMargin,
    "q22_schema_evolution" ->
      """SELECT c_custkey, c_name, c_acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment FROM customer
        |UNION ALL
        |SELECT c_custkey, c_name, CAST(NULL AS DOUBLE), c_mktsegment FROM customer
        |WHERE c_custkey > 100""".stripMargin,
    "q23_text_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INTEGER) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |    / greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0) AS mean_tok_len,
        |  CAST(len(list_filter(string_split(lower(text), ' '),
        |    t -> t IN ('the', 'a', 'and', 'of'))) AS INTEGER) AS stop_hits
        |FROM documents""".stripMargin,
    "q24_exact_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0),
        |normed AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'),
        |      '\s+', ' ', 'g'))) AS text_hash
        |  FROM corpus)
        |SELECT text_hash, min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM normed GROUP BY text_hash""".stripMargin,
    "q25_quality_ratios" ->
      """SELECT doc_id,
        |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}]', '', 'g')) AS DOUBLE)
        |    / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
        |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
        |    / greatest(CAST(length(text) AS DOUBLE), 1.0) AS digit_ratio,
        |  CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
        |    / greatest(CAST(length(text) AS DOUBLE), 1.0) AS upper_ratio,
        |  CAST(len(list_filter(string_split(lower(text), ' '),
        |    t -> t IN ('the','a','an','and','or','of','to','in','is','it','that','was','for','on','with','as','at','by','be','this'))) AS DOUBLE)
        |    / greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0) AS stop_ratio
        |FROM documents""".stripMargin,
    "q29_token_jaccard" ->
      """WITH modified AS (
        |  SELECT doc_id, text,
        |    text || ' extra trailing tokens appended here' AS text2
        |  FROM documents WHERE doc_id % 7 = 0),
        |sets AS (
        |  SELECT doc_id,
        |    list_distinct(string_split(text, ' ')) AS a,
        |    list_distinct(string_split(text2, ' ')) AS b
        |  FROM modified)
        |SELECT doc_id,
        |  CAST(len(list_filter(a, x -> list_contains(b, x))) AS DOUBLE) /
        |  CAST(len(a) + len(b) - len(list_filter(a, x -> list_contains(b, x))) AS DOUBLE) AS jaccard
        |FROM sets""".stripMargin,
    "q30_embedding_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT vec_id,
        |    list_reduce(list_transform(list_zip(embedding, (SELECT qe FROM q)),
        |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)
        |    / (sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v))
        |       * sqrt(list_reduce(list_transform((SELECT qe FROM q), x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v)))
        |    AS cosine
        |  FROM embeddings WHERE vec_id <> 0)
        |SELECT vec_id, cosine FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin,
    "q33_duplicate_clusters" ->
      """WITH RECURSIVE
        |edges AS (
        |  SELECT doc_id AS src, doc_id * 2 AS dst FROM documents
        |  WHERE doc_id > 0 AND doc_id * 2 <= (SELECT max(doc_id) FROM documents)),
        |sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        |nodes AS (SELECT DISTINCT src AS id FROM sym),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT s.dst, reach.r FROM sym s JOIN reach ON s.src = reach.id)
        |SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id""".stripMargin,
    "q36_corpus_curation" ->
      """WITH scored AS (
        |  SELECT doc_id, text,
        |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}]', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
        |    len(string_split(text, ' ')) AS n_tokens
        |  FROM documents),
        |filtered AS (
        |  SELECT * FROM scored WHERE n_tokens >= 20 AND punct_ratio < 0.2),
        |canonical AS (
        |  SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'),
        |    '\s+', ' ', 'g'))) AS text_hash,
        |    min(doc_id) AS doc_id, min(n_tokens) AS n_tokens
        |  FROM filtered GROUP BY 1)
        |SELECT count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens, min(doc_id) AS min_doc_id
        |FROM canonical""".stripMargin,
    "q35_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    // q27: FULL set equality vs DuckDB's exhaustive all-pairs exact
    // jaccard, computed via an inverted index (explode shingles →
    // equi-join → per-pair intersection count — ~25× faster than naive
    // all-pairs list_intersect at oracle scale). Precision matches because
    // Spark verifies candidates with the same exact jaccard; recall
    // matches because bands=16 at j >= 0.5 finds every pair
    // (deterministic with fixed seeds + fixed driver data; verified
    // bit-equal locally, 106 pairs at sf0.01).
    // q28: xxhash-seeded simhash is not SQL-expressible — rows-only; q46
    // carries the hard per-pair oracle for the simhash operator.
    "q27_minhash_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g')) AS n
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    trim(regexp_replace(regexp_replace(lower(text || ' extra trailing tokens appended here'), '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g')) AS n
        |  FROM documents WHERE doc_id % 7 = 0
        |), sets AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(length(n)-4,1)+1), i -> substring(n, i, 5))) AS sh
        |  FROM corpus
        |), sizes AS (
        |  SELECT doc_id, len(sh) AS n FROM sets
        |), ex AS (
        |  SELECT doc_id, unnest(sh) AS s FROM sets
        |), inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS li
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b,
        |  CAST(li AS DOUBLE) / (CAST(sa.n + sb.n AS DOUBLE) - CAST(li AS DOUBLE)) AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(li AS DOUBLE) / (CAST(sa.n + sb.n AS DOUBLE) - CAST(li AS DOUBLE)) >= 0.5""".stripMargin,

    // q28: full simhash pipeline replicated — portable md5-derived 32-bit
    // shingle hashes → per-bit majority vote → signature → exact all-pairs
    // hamming. Manku blocking on the Spark side is exhaustive within the
    // bound, so the blocked-join result must equal this brute force.
    "q28_simhash_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g')) AS n
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    trim(regexp_replace(regexp_replace(lower(text || ' extra trailing tokens appended here'), '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g')) AS n
        |  FROM documents WHERE doc_id % 7 = 0
        |), sets AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(length(n)-4,1)+1), i -> substring(n, i, 5))) AS sh
        |  FROM corpus
        |), ex AS (
        |  SELECT doc_id, CAST(('0x' || substring(md5(unnest(sh)), 1, 8)) AS BIGINT) AS h
        |  FROM sets
        |), votes AS (
        |  SELECT doc_id, j,
        |    sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM ex, range(0, 32) t(j) GROUP BY doc_id, j
        |), sim AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS s
        |  FROM votes GROUP BY doc_id
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
        |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.s, b.s)) <= 6""".stripMargin,

    // q16: the HLL sketch value is engine-specific; the oracle checks the
    // exact count and that Spark's sketch landed within 3*rsd of it.
    "q16_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts, true AS approx_ok
        |FROM lineitem""".stripMargin,

    // q26: quality/langId are deterministic ratio arithmetic replicated
    // exactly (same operation order → bit-identical doubles; earliest-max
    // tie-break); fingerprint is checked via its normalization contract.
    "q26_quality_lang_fingerprint" ->
      """WITH feat AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS DOUBLE) AS n_chars,
        |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}]', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS digit_ratio,
        |    CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0) AS mean_tok_len,
        |    greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0) AS n_toks,
        |    string_split(lower(text), ' ') AS lotoks,
        |    CAST(length(text) - length(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS cjk_ratio
        |  FROM documents),
        |scores AS (
        |  SELECT doc_id, n_chars, punct_ratio, digit_ratio, mean_tok_len, cjk_ratio,
        |    CAST(len(list_filter(lotoks, t -> t IN ('the','a','an','and','or','of','to','in','is','it','that','was','for','on','with','as','at','by','be','this'))) AS DOUBLE) / n_toks AS s_en,
        |    CAST(len(list_filter(lotoks, t -> t IN ('der','die','das','und','ist','von','mit','für','auf','ein','eine','nicht','den','des','im','zu','sich','dass','auch','wird'))) AS DOUBLE) / n_toks AS s_de,
        |    CAST(len(list_filter(lotoks, t -> t IN ('el','la','los','las','de','que','y','en','un','una','es','por','con','para','del','se','su','al','lo','como'))) AS DOUBLE) / n_toks AS s_es,
        |    CAST(len(list_filter(lotoks, t -> t IN ('le','la','les','de','des','et','est','un','une','du','dans','que','qui','pour','sur','avec','au','pas','ce','il'))) AS DOUBLE) / n_toks AS s_fr
        |  FROM feat)
        |SELECT doc_id,
        |  least(n_chars / 500.0, 1.0) * 0.25
        |    + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2
        |    + (1.0 - least(digit_ratio * 5.0, 1.0)) * 0.15
        |    + (CASE WHEN mean_tok_len BETWEEN 2.5 AND 9.0 THEN 1.0 ELSE 0.3 END) * 0.2
        |    + least(s_en * 4.0, 1.0) * 0.2 AS quality,
        |  CASE WHEN cjk_ratio > 0.25 THEN 'zh'
        |       WHEN greatest(s_en, s_de, s_es, s_fr) > 0.05 THEN
        |         CASE WHEN s_en >= greatest(s_de, s_es, s_fr) THEN 'en'
        |              WHEN s_de >= greatest(s_es, s_fr) THEN 'de'
        |              WHEN s_es >= s_fr THEN 'es'
        |              ELSE 'fr' END
        |       ELSE 'und' END AS lang_pred,
        |  true AS fp_ws_invariant,
        |  true AS fp_case_invariant
        |FROM scores""".stripMargin,

    // q31/q34: batch ANN joins oracled via the structural self-match
    // guarantee — every query vector is a corpus/index row, so rank 1 is
    // exactly itself.
    "q31_ann_lsh_topk" ->
      """SELECT vec_id AS qid, vec_id AS id, 1 AS rank
        |FROM embeddings WHERE vec_id % 40 = 0""".stripMargin,
    "q34_ivf_ann_topk" ->
      """SELECT vec_id AS qid, vec_id AS id, 1 AS rank
        |FROM embeddings WHERE vec_id % 40 = 0""".stripMargin,

    // q32: text payloads are never images, so metadata is the honest stub
    // and the frame count is byte arithmetic on octet_length.
    "q32_multimodal_pipeline" ->
      """SELECT doc_id,
        |  0 AS width, 0 AS height,
        |  CASE WHEN strlen(text) = 0 THEN 'empty' ELSE 'stub' END AS format,
        |  8 AS n_features,
        |  CASE WHEN strlen(text) >= 16
        |    THEN CAST(floor((strlen(text) - 16) / 64.0) AS INT) + 1
        |    ELSE 0 END AS n_frames
        |FROM documents""".stripMargin,

    // q37: the planted pairs' exact char-5-gram jaccard IS computable in SQL
    // (shingle-hash sets are collision-free at this scale, so |hash set| =
    // |string set| and the ratio matches bit-for-bit); LSH recall on the
    // planted pairs must be 1.0 for rows to match.
    "q37_minhash_planted_recall" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g')) AS na,
        |    trim(regexp_replace(regexp_replace(lower(text || ' extra trailing tokens appended here'), '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g')) AS nb
        |  FROM documents WHERE doc_id % 7 = 0
        |), sets AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(length(na)-4,1)+1), i -> substring(na, i, 5))) AS sa,
        |    list_distinct(list_transform(range(1, greatest(length(nb)-4,1)+1), i -> substring(nb, i, 5))) AS sb
        |  FROM planted
        |), j AS (
        |  SELECT doc_id AS id_a, doc_id + 2000000 AS id_b,
        |    CAST(len(list_intersect(sa, sb)) AS DOUBLE) /
        |      (CAST(len(sa) + len(sb) AS DOUBLE) - CAST(len(list_intersect(sa, sb)) AS DOUBLE)) AS jaccard
        |  FROM sets
        |)
        |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.5""".stripMargin,
    "q38_decontamination" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g')) AS n
        |  FROM documents
        |), ngrams AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(n, ' '))-4,1)+1),
        |    i -> array_to_string(list_slice(string_split(n, ' '), i, i+4), ' '))) AS ngs
        |  FROM norm
        |), bench AS (
        |  SELECT DISTINCT unnest(ngs) AS ng FROM ngrams WHERE doc_id % 13 = 1
        |), corpus AS (
        |  SELECT doc_id, unnest(ngs) AS ng FROM ngrams
        |)
        |SELECT c.doc_id, count(*) AS n_contaminated_ngrams
        |FROM corpus c JOIN bench b USING (ng)
        |GROUP BY c.doc_id
        |HAVING count(*) >= 1""".stripMargin,
    "q39_embedding_neardup_planted" ->
      """SELECT vec_id AS id_a, vec_id + 2000000 AS id_b
        |FROM embeddings WHERE vec_id % 5 = 0""".stripMargin,

    // q40: DuckDB's native ASOF LEFT JOIN is the ground truth for our
    // union+window implementation
    "q40_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT c.user_id, c.event_id, c.ts,
        |  p.purchase_value AS purchase_value_asof, p.ts AS ts_asof
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    "q41_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  epoch_ms(max(ts)) - epoch_ms(min(ts)) AS duration_ms
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    "q42_range_join" ->
      """WITH intervals AS (
        |  SELECT p_partkey, CAST(p_partkey % 480 AS DOUBLE) AS lo,
        |    CAST(p_partkey % 480 AS DOUBLE) + 3.0 AS hi
        |  FROM part WHERE p_partkey % 17 = 0)
        |SELECT i.p_partkey, count(*) AS n_points,
        |  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN intervals i ON e.value >= i.lo AND e.value <= i.hi
        |GROUP BY i.p_partkey""".stripMargin,
    "q43_repetition_ratios" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i+1]) ELSE [] END AS g2,
        |    CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks)-1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) ELSE [] END AS g3
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN len(toks) > 0 THEN 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)/CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS dup_word_frac,
        |  CASE WHEN len(g2) > 0 THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)/CAST(len(g2) AS DOUBLE) ELSE 0.0 END AS dup_bigram_frac,
        |  CASE WHEN len(g3) > 0 THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE)/CAST(len(g3) AS DOUBLE) ELSE 0.0 END AS dup_trigram_frac
        |FROM g""".stripMargin,
    "q44_pii_redaction" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or +1 555 01' || doc_id AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}')) AS INTEGER) AS n_phones,
        |  CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}', '<PHONE>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g')) AS INTEGER) AS redacted_len
        |FROM w""".stripMargin,
    // q45: the keep decision is md5-derived on both sides — the sample is a
    // pure function of the data, so the engines agree row-for-row
    "q45_weighted_sample" ->
      """WITH docs AS (
        |  SELECT doc_id, text, doc_id % 5 AS domain,
        |    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
        |      / 4294967296.0 AS u
        |  FROM documents),
        |kept AS (
        |  SELECT * FROM docs WHERE u <
        |    CASE CAST(domain AS VARCHAR) WHEN '0' THEN 0.9 WHEN '1' THEN 0.5
        |      WHEN '2' THEN 0.25 WHEN '3' THEN 0.1 ELSE 0.05 END)
        |SELECT domain, count(*) AS n_kept,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
        |FROM kept GROUP BY domain""".stripMargin,
    // q46: per planted pair, the Manku-blocking implication
    // (hamming <= bound ⇒ found) must hold — `ok` is structurally true
    "q46_simhash_planted_recall" ->
      """SELECT doc_id AS id_a, doc_id + 2000000 AS id_b, true AS ok
        |FROM documents WHERE doc_id % 7 = 0""".stripMargin,
    // q49: the whole mix is deterministic arithmetic — md5 keep decision
    // (q45's pattern), integer-division budgets, double rate comparison
    "q49_token_budget_mix" ->
      """WITH docs AS (
        |  SELECT doc_id, CAST(doc_id % 4 AS VARCHAR) AS domain,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
        |      / 4294967296.0 AS u
        |  FROM documents),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM docs),
        |dt AS (SELECT domain, CAST(sum(n_tokens) AS BIGINT) AS dtot FROM docs GROUP BY domain),
        |rates AS (
        |  SELECT domain,
        |    least(1.0, CAST(CASE domain
        |      WHEN '0' THEN (SELECT total FROM tot)
        |      WHEN '1' THEN (SELECT total FROM tot) // 16
        |      WHEN '2' THEN (SELECT total FROM tot) // 32
        |      WHEN '3' THEN (SELECT total FROM tot) // 5
        |      ELSE 9223372036854775807 END AS DOUBLE) / CAST(dtot AS DOUBLE)) AS rate
        |  FROM dt)
        |SELECT d.domain, count(*) AS n_kept,
        |  CAST(sum(d.n_tokens) AS BIGINT) AS kept_tokens, min(r.rate) AS rate
        |FROM docs d JOIN rates r USING (domain)
        |WHERE d.u < r.rate
        |GROUP BY d.domain""".stripMargin,
    // q50: exclusive shard-local cumulative sum, integer-exact
    "q50_sequence_packing" ->
      """WITH docs AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |off AS (
        |  SELECT doc_id, shard, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_offset
        |  FROM docs)
        |SELECT doc_id, shard, n_tokens, start_offset,
        |  CAST(floor(CAST(start_offset AS DOUBLE) / 512.0) AS BIGINT) AS pack_id,
        |  start_offset % 512 AS pack_offset
        |FROM off""".stripMargin,
    // q53: same md5-derived order statistic, same (u, key-string) tie-break.
    "q53_source_caps" ->
      """WITH u AS (
        |  SELECT doc_id, source,
        |    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
        |      / 4294967296.0 AS u
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY u, CAST(doc_id AS VARCHAR)) AS rk
        |  FROM u)
        |SELECT doc_id, source FROM r WHERE rk <= 15""".stripMargin,

    // q52: same three stages in SQL; the (count desc, token asc) order is
    // total, so the top-K cut is identical in both engines.
    "q52_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |), vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
        |    ORDER BY cnt DESC, tok ASC LIMIT 1000)
        |), per AS (
        |  SELECT t.doc_id, count(*) AS n_tokens,
        |    sum(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS n_in_topk
        |  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        |  GROUP BY t.doc_id
        |)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_in_topk AS BIGINT) AS n_in_topk,
        |  CAST(n_in_topk AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS topk_coverage
        |FROM per""".stripMargin,

    // q51: exhaustive new-batch × corpus exact char-5-gram jaccard — the
    // incremental LSH join must find exactly these pairs (q27 argument).
    "q51_incremental_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g')) AS n
        |  FROM documents
        |), newb AS (
        |  SELECT doc_id + 3000000 AS doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text || ' appended updates for the second crawl'), '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g')) AS n
        |  FROM documents WHERE doc_id % 9 = 0
        |), cs AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(n)-4,1)+1), i -> substring(n, i, 5))) AS sh FROM corpus
        |), ns AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(n)-4,1)+1), i -> substring(n, i, 5))) AS sh FROM newb
        |), csz AS (SELECT doc_id, len(sh) AS n FROM cs
        |), nsz AS (SELECT doc_id, len(sh) AS n FROM ns
        |), cex AS (SELECT doc_id, unnest(sh) AS s FROM cs
        |), nex AS (SELECT doc_id, unnest(sh) AS s FROM ns
        |), inter AS (
        |  SELECT a.doc_id AS id_new, b.doc_id AS id_corpus, count(*) AS li
        |  FROM nex a JOIN cex b ON a.s = b.s GROUP BY 1, 2
        |)
        |SELECT id_new, id_corpus,
        |  CAST(li AS DOUBLE) / (CAST(na.n + nb.n AS DOUBLE) - CAST(li AS DOUBLE)) AS jaccard
        |FROM inter JOIN nsz na ON na.doc_id = id_new JOIN csz nb ON nb.doc_id = id_corpus
        |WHERE CAST(li AS DOUBLE) / (CAST(na.n + nb.n AS DOUBLE) - CAST(li AS DOUBLE)) >= 0.5""".stripMargin,
    // q47: doc frequency over raw normalized passages (Spark groups their
    // xxhash64 — collision-free here, counts agree)
    "q47_passage_dedup" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g')) AS n
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(string_split(n,' '))-7,1)+1),
        |    i -> array_to_string(list_slice(string_split(n,' '), i, i+7), ' ')))) AS ps
        |  FROM norm
        |), dfreq AS (
        |  SELECT ps, count(*) AS df FROM p GROUP BY ps
        |)
        |SELECT p.doc_id, count(*) AS n_passages,
        |  CAST(sum(CASE WHEN dfreq.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages,
        |  CAST(sum(CASE WHEN dfreq.df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_passage_frac
        |FROM p JOIN dfreq USING (ps)
        |GROUP BY p.doc_id""".stripMargin,
    // q48: every rule recomputed with identical arithmetic order
    "q48_doc_filter" ->
      """WITH feat AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |    CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0) AS mean_tok_len,
        |    CAST(len(list_filter(list_distinct(string_split(lower(text), ' ')),
        |      t -> t IN ('the','a','an','and','or','of','to','in','is','it','that','was','for','on','with','as','at','by','be','this'))) AS INT) AS n_stop_distinct,
        |    1.0 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS dup_word_frac
        |  FROM documents)
        |SELECT doc_id, n_tokens, mean_tok_len, n_stop_distinct, dup_word_frac,
        |  (n_tokens BETWEEN 20 AND 1000) AND (mean_tok_len BETWEEN 2.5 AND 9.0)
        |    AND n_stop_distinct >= 2 AND dup_word_frac <= 0.6 AS keep
        |FROM feat""".stripMargin,

    // q54: the split label is pure md5 arithmetic — same cumulative-
    // threshold CASE on both sides
    "q54_train_split" ->
      """SELECT doc_id,
        |  CASE
        |    WHEN u >= 0.0 AND u < 0.05 THEN 'val'
        |    WHEN u >= 0.05 AND u < 0.10 THEN 'test'
        |    ELSE 'train' END AS split
        |FROM (
        |  SELECT doc_id,
        |    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
        |      / 4294967296.0 AS u
        |  FROM documents)""".stripMargin,
    // q55: shard from md5 chars 9-16 (independent of the order hash from
    // chars 1-8); pos = per-shard rank with the same (u, key-string)
    // tie-break as the Spark window
    "q55_shard_assignment" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
        |      / 4294967296.0 AS u,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 9, 8)) AS BIGINT) % 8 AS shard
        |  FROM documents)
        |SELECT doc_id, shard,
        |  row_number() OVER (PARTITION BY shard ORDER BY u, CAST(doc_id AS VARCHAR)) - 1 AS pos
        |FROM h""".stripMargin,
    // q56: document frequency over per-doc DISTINCT trigrams; the
    // (doc_freq desc, ngram asc) order is total so the top-20 cut is
    // identical in both engines
    "q56_ngram_hotspots" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(string_split(text, ' ')) >= 3 THEN
        |      list_transform(range(1, len(string_split(text, ' ')) - 1),
        |        i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])
        |    ELSE [] END)) AS ngram
        |  FROM documents)
        |SELECT ngram, count(*) AS doc_freq FROM g
        |GROUP BY ngram ORDER BY doc_freq DESC, ngram ASC LIMIT 20""".stripMargin,
    // q57: quantile_cont is the same linear-interpolation definition as
    // Spark's exact percentile; round(4) absorbs last-ulp differences
    "q57_exact_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // q58: DuckDB's nfc_normalize is the same Unicode NFC; md5 runs over
    // identical UTF-8 bytes. chr(224) = 'à' precomposed... the perturbed
    // text uses the decomposed form a+U+0300 (chr(768)) on both sides.
    "q58_nfc_normalize" ->
      """WITH p AS (
        |  SELECT doc_id, replace(text, 'a', 'a' || chr(768)) AS t FROM documents)
        |SELECT doc_id,
        |  CAST(length(t) AS INT) AS len_raw,
        |  CAST(length(nfc_normalize(t)) AS INT) AS len_nfc,
        |  md5(nfc_normalize(t)) AS md5_nfc
        |FROM p""".stripMargin,
    // q59: the sketch estimate must land in the error envelope of the
    // exact distinct count — ok is structurally true; exact count is
    // recomputed exactly in SQL
    "q59_hll_union" ->
      """SELECT lang,
        |  CAST(count(DISTINCT tok) AS BIGINT) AS n_exact, true AS ok
        |FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY lang""".stripMargin,

    // q60: identical regex chain (tags → entities with &amp; last →
    // whitespace squash); md5 over the same UTF-8 bytes
    "q60_html_strip" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><body><h1>Doc</h1><p class="c">'
        |      || replace(text, ' the ', ' &amp;the&#39; ')
        |      || '</p><div>footer &lt;nav&gt;</div></body></html>' AS html
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(
        |        regexp_replace(html, '<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS t
        |  FROM h)
        |SELECT doc_id, CAST(length(t) AS INT) AS n_chars_clean, md5(t) AS md5_clean
        |FROM c""".stripMargin,
    // q61: exact all-pairs jaccard (q27's inverted-index oracle) → pair
    // graph → recursive min-label clustering (q33's pattern) → survivors
    "q61_near_dedup_survivors" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g')) AS n
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    trim(regexp_replace(regexp_replace(lower(text || ' extra trailing tokens appended here'), '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g')) AS n
        |  FROM documents WHERE doc_id % 7 = 0
        |), sets AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(length(n)-4,1)+1), i -> substring(n, i, 5))) AS sh
        |  FROM corpus
        |), sizes AS (
        |  SELECT doc_id, len(sh) AS nsh FROM sets
        |), ex AS (
        |  SELECT doc_id, unnest(sh) AS s FROM sets
        |), inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS li
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT id_a, id_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(li AS DOUBLE) / (CAST(sa.nsh + sb.nsh AS DOUBLE) - CAST(li AS DOUBLE)) >= 0.5
        |), sym AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), nodes AS (SELECT DISTINCT src AS id FROM sym),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT s.dst, reach.r FROM sym s JOIN reach ON s.src = reach.id
        |), clusters AS (
        |  SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
        |)
        |SELECT doc_id FROM corpus
        |WHERE doc_id NOT IN (SELECT id FROM clusters WHERE id <> cluster_id)""".stripMargin,

    // q62: same two stages — distinct-word counts, then char-pair explode
    // weighted by word count; integer-exact, total-ordered cut
    "q62_bpe_merge_candidates" ->
      """WITH words AS (
        |  SELECT w, count(*) AS wcnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0 GROUP BY w),
        |pairs AS (
        |  SELECT unnest(list_transform(range(1, greatest(length(w) - 1, 0) + 1),
        |    i -> substring(w, i, 2))) AS pair, wcnt
        |  FROM words WHERE length(w) >= 2)
        |SELECT pair, CAST(sum(wcnt) AS BIGINT) AS cnt FROM pairs
        |GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 20""".stripMargin,

    // q63: same split labels (md5 thresholds), same normalized word
    // 8-gram windows (fewer-than-8-token docs yield ONE window), same
    // train-vs-held-out overlap — leak counts match row for row
    "q63_split_contamination" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 4000000, text || ' trailing continuation for the twin copy'
        |  FROM documents WHERE doc_id % 11 = 0),
        |lab AS (
        |  SELECT doc_id, text,
        |    CASE WHEN u >= 0.0 AND u < 0.1 THEN 'val'
        |         WHEN u >= 0.1 AND u < 0.2 THEN 'test'
        |         ELSE 'train' END AS split
        |  FROM (
        |    SELECT doc_id, text,
        |      CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
        |        / 4294967296.0 AS u
        |    FROM base)),
        |norm AS (
        |  SELECT doc_id, split,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g')) AS n
        |  FROM lab),
        |p AS (
        |  SELECT doc_id, split, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(string_split(n, ' ')) - 7, 1) + 1),
        |    i -> array_to_string(list_slice(string_split(n, ' '), i, i + 7), ' ')))) AS ps
        |  FROM norm),
        |trainp AS (SELECT DISTINCT ps FROM p WHERE split = 'train'),
        |held AS (SELECT doc_id, split, ps FROM p WHERE split <> 'train'),
        |leaks AS (
        |  SELECT doc_id, count(*) AS nl FROM held JOIN trainp USING (ps) GROUP BY doc_id)
        |SELECT h.doc_id, h.split,
        |  CAST(coalesce(l.nl, 0) AS BIGINT) AS n_leaked_ngrams,
        |  coalesce(l.nl, 0) > 0 AS leaked
        |FROM (SELECT DISTINCT doc_id, split FROM held) h
        |LEFT JOIN leaks l USING (doc_id)""".stripMargin,

    "q64_length_histogram" ->
      """SELECT (CAST(len(string_split(text, ' ')) AS BIGINT) // 10) * 10 AS bucket,
        |  count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
        |FROM documents GROUP BY 1""".stripMargin,

    // q65: quality is the q26 recipe (bit-identical there), so the
    // (quality desc, doc_id asc) total order cuts identically
    "q65_topk_per_source" ->
      """WITH feat AS (
        |  SELECT doc_id, source,
        |    CAST(length(text) AS DOUBLE) AS n_chars,
        |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()\[\]{}]', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(length(text) AS DOUBLE), 1.0) AS digit_ratio,
        |    CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
        |      / greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0) AS mean_tok_len,
        |    greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0) AS n_toks,
        |    string_split(lower(text), ' ') AS lotoks
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, source,
        |    least(n_chars / 500.0, 1.0) * 0.25
        |      + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2
        |      + (1.0 - least(digit_ratio * 5.0, 1.0)) * 0.15
        |      + (CASE WHEN mean_tok_len BETWEEN 2.5 AND 9.0 THEN 1.0 ELSE 0.3 END) * 0.2
        |      + least(CAST(len(list_filter(lotoks, t -> t IN ('the','a','an','and','or','of','to','in','is','it','that','was','for','on','with','as','at','by','be','this'))) AS DOUBLE) / n_toks * 4.0, 1.0) * 0.2 AS quality
        |  FROM feat),
        |r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, source, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 3""".stripMargin,

    // q66: the oracle replays the merge clauses branch by branch. The
    // additionalMergePredicate joins on key AND status, so a key-matched
    // row with differing status lands in BOTH unmatched branches.
    "q66_merge_fine_grained" ->
      """WITH existing AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |feed AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN 'P' ELSE o_orderstatus END AS o_orderstatus,
        |    o_totalprice * 1.1 AS o_totalprice,
        |    o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT e.o_orderkey, e.o_orderstatus,
        |  CASE WHEN n.o_totalprice > e.o_totalprice THEN n.o_totalprice ELSE e.o_totalprice END AS o_totalprice,
        |  e.o_orderpriority
        |FROM existing e JOIN feed n
        |  ON e.o_orderkey = n.o_orderkey AND e.o_orderstatus = n.o_orderstatus
        |WHERE NOT (n.o_orderstatus = 'P' AND e.o_totalprice < 150000)
        |UNION ALL
        |SELECT e.o_orderkey, e.o_orderstatus, e.o_totalprice, e.o_orderpriority
        |FROM existing e LEFT JOIN feed n
        |  ON e.o_orderkey = n.o_orderkey AND e.o_orderstatus = n.o_orderstatus
        |WHERE n.o_orderkey IS NULL
        |UNION ALL
        |SELECT n.o_orderkey, upper(n.o_orderstatus) || '!' AS o_orderstatus,
        |  n.o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
        |FROM feed n LEFT JOIN existing e
        |  ON n.o_orderkey = e.o_orderkey AND n.o_orderstatus = e.o_orderstatus
        |WHERE e.o_orderkey IS NULL AND n.o_totalprice > 50000""".stripMargin,

    "q67_nested_schema_evolution" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_name END AS p_name,
        |  CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_acctbal END AS p_acctbal,
        |  CAST(NULL AS VARCHAR) AS p_segment
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, c_name, CAST(NULL AS DOUBLE), c_mktsegment
        |FROM customer WHERE c_custkey > 100""".stripMargin,

    "q68_csv_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |UNION ALL
        |SELECT * FROM (VALUES
        |  (9001, 'comma, separated', 90),
        |  (9002, 'quoted "name" here', 91),
        |  (9003, 'line one' || chr(10) || 'line two', 92),
        |  (9004, CAST(NULL AS VARCHAR), 93),
        |  (9005, '  padded  ', 94)) AS v(n_nationkey, n_name, n_regionkey)""".stripMargin,

    "q69_quality_metrics" ->
      """WITH m AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS row_count,
        |    CAST(count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS DOUBLE) / count(*) AS returned_frac,
        |    (CAST(count(l_orderkey) AS DOUBLE) + CAST(count(l_shipdate) AS DOUBLE)
        |      + CAST(count(l_returnflag) AS DOUBLE)) / (count(*) * 3) AS completeness,
        |    CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS DOUBLE) / count(*) AS unique_key,
        |    max(l_quantity) AS max_qty
        |  FROM lineitem)
        |SELECT 'row_count' AS metric, row_count AS value FROM m
        |UNION ALL SELECT 'returned_frac', returned_frac FROM m
        |UNION ALL SELECT 'completeness', completeness FROM m
        |UNION ALL SELECT 'unique_key', unique_key FROM m
        |UNION ALL SELECT 'max_qty', max_qty FROM m""".stripMargin,

    "q70_pipeline_e2e" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_items
        |FROM lineitem WHERE l_discount > 0.02
        |GROUP BY l_returnflag""".stripMargin,

    "q71_streaming_pipeline" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem WHERE l_discount > 0.05""".stripMargin,

    // q72: same exhaustive-planted-recall construction as q37 — DuckDB
    // recomputes the exact jaccard of every planted pair; Spark must find
    // them all via OPH banding and report identical values.
    "q72_oph_planted_recall" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g')) AS na,
        |    trim(regexp_replace(regexp_replace(lower(text || ' v2'), '[^\p{L}\p{N}\s]', '', 'g'), '\s+', ' ', 'g')) AS nb
        |  FROM documents WHERE doc_id % 7 = 0
        |), sets AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(length(na)-4,1)+1), i -> substring(na, i, 5))) AS sa,
        |    list_distinct(list_transform(range(1, greatest(length(nb)-4,1)+1), i -> substring(nb, i, 5))) AS sb
        |  FROM planted
        |), j AS (
        |  SELECT doc_id AS id_a, doc_id + 2000000 AS id_b,
        |    CAST(len(list_intersect(sa, sb)) AS DOUBLE) /
        |      (CAST(len(sa) + len(sb) AS DOUBLE) - CAST(len(list_intersect(sa, sb)) AS DOUBLE)) AS jaccard
        |  FROM sets
        |)
        |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.7""".stripMargin,

    "q73_append_evolution" ->
      """SELECT c_custkey, c_name, c_acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, c_name, CAST(NULL AS DOUBLE), c_mktsegment
        |FROM customer WHERE c_custkey > 100""".stripMargin,

    "q74_partition_diff_incremental" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
        |  CASE WHEN substring(o_orderpriority, 1, 1) IN ('1','2') THEN 1 ELSE 2 END AS load_nr,
        |  substring(o_orderpriority, 1, 1) AS prio
        |FROM orders""".stripMargin,

    "q74b_watermark_incremental" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
        |  CASE WHEN o_orderdate <= (SELECT max(o_orderdate) FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01')
        |       THEN 1 ELSE 2 END AS load_nr
        |FROM orders""".stripMargin,

    "q75_excel_roundtrip" ->
      """SELECT CAST(c_custkey AS DOUBLE) AS c_custkey, c_name,
        |  c_name || ', "' || c_mktsegment || '" <&>' AS tricky,
        |  CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment,
        |  CAST(c_nationkey AS DOUBLE) AS c_nationkey, c_acctbal
        |FROM customer""".stripMargin,

    "q76_avro_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM orders
        |UNION ALL SELECT * FROM (VALUES
        |  (9000000001, 'é-ünïcode ✓', 1.25, TIMESTAMP '2031-05-06 07:08:09.123'),
        |  (9000000002, '', -2.5, NULL),
        |  (9000000003, NULL, NULL, NULL))
        |  t(o_orderkey, o_orderstatus, o_totalprice, o_orderdate)""".stripMargin,

    "q76b_orc_roundtrip" ->
      """SELECT c_custkey, c_name, c_acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment
        |FROM customer WHERE c_custkey % 2 = 0
        |UNION ALL
        |SELECT c_custkey, c_name, CAST(NULL AS DOUBLE), c_mktsegment
        |FROM customer WHERE c_custkey % 2 = 1""".stripMargin,

    "q77_jdbc_merge" ->
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey > 500 THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal,
        |  CASE WHEN c_custkey > 1000 THEN lower(c_mktsegment) ELSE c_mktsegment END AS c_mktsegment
        |FROM customer""".stripMargin,

    "q78_distributed_components" ->
      """WITH RECURSIVE
        |edges AS (
        |  SELECT doc_id AS src, doc_id * 2 AS dst FROM documents
        |  WHERE doc_id > 0 AND doc_id * 2 <= (SELECT max(doc_id) FROM documents)),
        |sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        |nodes AS (SELECT DISTINCT src AS id FROM sym),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT s.dst, reach.r FROM sym s JOIN reach ON s.src = reach.id)
        |SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id""".stripMargin,

    "q79_event_time_windows" ->
      """WITH b AS (
        |  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type,
        |    count(*) AS n_events,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, n_events, sum_value, window_start,
        |  window_start + INTERVAL 1 HOUR AS window_end
        |FROM b
        |WHERE window_start + INTERVAL 1 HOUR <= (SELECT max(ts) FROM events)""".stripMargin,

    // q79c: append-mode emission lag under the Trigger.Once loop — after
    // runs over f1|f2|f3 the sink holds exactly the windows closed by the
    // watermark as of f2's max event time (batch N evicts with the
    // watermark from batch N-1's data; no flush batch without new data)
    "q79c_sync_stream_loop" ->
      """WITH b AS (
        |  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type,
        |    count(*) AS n_events,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, n_events, sum_value, window_start,
        |  window_start + INTERVAL 1 HOUR AS window_end
        |FROM b
        |WHERE window_start + INTERVAL 1 HOUR <=
        |  (SELECT max(ts) FROM events WHERE ts < TIMESTAMP '2024-01-21 00:00:00')""".stripMargin,

    "q79b_session_windows" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS grp FROM o)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  min(ts) AS window_start, max(ts) + INTERVAL 30 MINUTE AS window_end
        |FROM g GROUP BY user_id, grp""".stripMargin,

    "q80_xml_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey, n_name || ' <&> ' AS note FROM nation
        |UNION ALL
        |SELECT * FROM (VALUES
        |  (9001, '<angle & amp>', 90, 'quote "' || ' and ''single'''),
        |  (9002, 'é-ünïcode ✓', 91, 'line one' || chr(10) || 'line two'),
        |  (9003, CAST(NULL AS VARCHAR), 92, CAST(NULL AS VARCHAR)))
        |  AS v(n_nationkey, n_name, n_regionkey, note)""".stripMargin,

    "q81_relaxed_csv_headers" ->
      """SELECT n_nationkey, n_name, CAST(NULL AS INTEGER) AS n_regionkey FROM nation
        |UNION ALL
        |SELECT n_nationkey, CAST(NULL AS VARCHAR), n_regionkey FROM nation""".stripMargin,

    "q82_file_move_incremental" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        |  CASE WHEN n_nationkey < 12 THEN 1 ELSE 2 END AS load_nr
        |FROM nation""".stripMargin,

    "q83_state_incremental" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        |  CASE WHEN n_nationkey < 12 THEN 1 ELSE 2 END AS load_nr
        |FROM nation""".stripMargin,

    "q84_hive_evolution" ->
      """SELECT c_custkey, c_name, c_acctbal, CAST(NULL AS INTEGER) AS c_nationkey,
        |  c_mktsegment, 1 AS load_nr
        |FROM customer WHERE c_custkey % 2 = 0
        |UNION ALL
        |SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS c_acctbal, c_nationkey,
        |  c_mktsegment, 2 AS load_nr
        |FROM customer WHERE c_custkey % 2 <> 0""".stripMargin,

    "q85_ticktock_swap" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        |  CASE WHEN n_nationkey < 12 THEN 1 ELSE 2 END AS load_nr
        |FROM nation""".stripMargin,

    "q86_housekeeping_compaction" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |  o_orderpriority,
        |  CASE WHEN substring(o_orderpriority, 1, 1) IN ('1', '2') THEN 'X'
        |       ELSE substring(o_orderpriority, 1, 1) END AS prio
        |FROM orders""".stripMargin,

    "q87_streaming_dedup" ->
      """SELECT event_id, user_id, event_type, ts, value FROM events
        |UNION ALL
        |SELECT event_id, user_id, event_type, ts + INTERVAL 31 DAY AS ts, value
        |FROM events
        |WHERE event_id % 10 = 0
        |  AND ts + INTERVAL 2 HOUR < (SELECT max(ts) - INTERVAL 2 HOUR FROM events)""".stripMargin,

    "q88_json_roundtrip" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 50 = 0 THEN NULL
        |       ELSE c_name || ' "quoted" \ é✓' || chr(10) || 'newline' END AS c_name,
        |  c_acctbal, c_nationkey AS p_nation, c_mktsegment AS p_segment,
        |  c_custkey AS tag1, CAST(NULL AS BIGINT) AS tag3,
        |  CAST(NULL AS VARCHAR) AS c_mktsegment
        |FROM customer WHERE c_custkey % 2 = 0
        |UNION ALL
        |SELECT c_custkey, c_name, CAST(NULL AS DOUBLE),
        |  c_nationkey, c_mktsegment, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |  c_mktsegment
        |FROM customer WHERE c_custkey % 2 = 1""".stripMargin,

    "q89_custom_dfs_action" ->
      """SELECT 'seg' AS part, c_mktsegment AS k, n_orders, total FROM (
        |  SELECT c.c_mktsegment, count(*) AS n_orders,
        |    CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_mktsegment)
        |UNION ALL
        |SELECT 'top', CAST(o_custkey AS VARCHAR), count(*), CAST(NULL AS DOUBLE)
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 15""".stripMargin,

    "q90_file_actions" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_nationkey % 2 = 0""".stripMargin,

    "q91_diamond_union" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, 'A' AS branch
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 45
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, 'B'
        |FROM lineitem
        |WHERE l_returnflag = 'N' AND l_linenumber = 1 AND l_discount >= 0.09""".stripMargin,

    "q92_partition_retention" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  substring(o_orderpriority, 1, 1) AS prio
        |FROM orders WHERE substring(o_orderpriority, 1, 1) >= '3'""".stripMargin,

    "q93_webservice_http" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        |  CAST(n_regionkey AS VARCHAR) AS region FROM nation""".stripMargin,

    "q94_odata_pagination" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, c_acctbal,
        |  c_mktsegment FROM customer""".stripMargin,

    "q95_airbyte_subprocess" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
        |  CAST(s_nationkey AS BIGINT) AS s_nationkey,
        |  CAST(s_acctbal AS DOUBLE) AS s_acctbal FROM supplier""".stripMargin,
    // q96: the script node's awk-derived column recomputed relationally
    "q96_script_between_copies" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
        |  CAST(s_nationkey AS INT) AS s_nationkey,
        |  CAST(s_suppkey % 7 AS INT) AS key_mod FROM supplier""".stripMargin,
    // q97: kafka wire decode — DuckDB rebuilds partition/offset assignment
    // and replays the configured offset ranges (start inclusive, end
    // exclusive, -1/absent unbounded)
    "q97_kafka_wire_decode" ->
      """WITH w AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS sk, s_name,
        |    CAST(s_acctbal AS DOUBLE) AS sb,
        |    CAST(s_suppkey % 3 AS INT) AS kpart,
        |    CAST(row_number() OVER (PARTITION BY s_suppkey % 3 ORDER BY s_suppkey) - 1 AS BIGINT) AS koff
        |  FROM supplier)
        |SELECT sk AS key_suppkey, sk AS s_suppkey, s_name, sb AS s_acctbal,
        |  kpart AS partition, koff AS "offset"
        |FROM w
        |WHERE (kpart <> 0 OR (koff >= 5 AND koff < 30))
        |  AND (kpart <> 2 OR (koff >= 3 AND koff < 20))""".stripMargin,
    // q103: avro registry decode — DuckDB rebuilds partition/offset
    // assignment; rows written under writer schema id 1 (even suppkeys)
    // must surface a NULL s_acctbal after alignment to the latest schema
    "q103_kafka_avro_decode" ->
      """WITH w AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS sk, s_name,
        |    CAST(s_acctbal AS DOUBLE) AS sb,
        |    CAST(s_suppkey % 3 AS INT) AS kpart,
        |    CAST(row_number() OVER (PARTITION BY s_suppkey % 3 ORDER BY s_suppkey) - 1 AS BIGINT) AS koff
        |  FROM supplier)
        |SELECT sk AS key_suppkey, sk AS s_suppkey, s_name,
        |  CASE WHEN sk % 2 = 1 THEN sb ELSE NULL END AS s_acctbal,
        |  kpart AS partition, koff AS "offset"
        |FROM w""".stripMargin,
    // q104: recall verified in-query against brute-force exact top-1
    // (require recall == 1.0); the surfaced mapping is the planted pairs
    "q104_ivfpq_planted_recall" ->
      """SELECT CAST(vec_id + 2000000 AS BIGINT) AS qid,
        |  CAST(vec_id AS BIGINT) AS id, 1 AS rank
        |FROM embeddings WHERE vec_id % 40 = 0""".stripMargin,
    // q105: the z-order rewrite must be data-invariant — the filtered
    // read equals the plain relational filter (file pruning is asserted
    // in-query via require)
    "q105_zorder_skipping" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |  CAST(o_custkey AS BIGINT) AS o_custkey,
        |  CAST(o_totalprice AS DOUBLE) AS o_totalprice
        |FROM orders WHERE o_custkey = 7""".stripMargin,
    // q106: every change class recomputed relationally — deletes carry
    // the OLD row, updates both images, equal rewrites emit nothing
    "q106_change_data_feed" ->
      """WITH cust AS (SELECT CAST(c_custkey AS BIGINT) AS ck, c_name,
        |  CAST(c_acctbal AS DOUBLE) AS ab FROM customer)
        |SELECT ck AS c_custkey, c_name, ab AS c_acctbal,
        |  'update_preimage' AS _change_type
        |FROM cust WHERE ck <= 1000 AND ck % 10 = 0 AND ck % 13 <> 0
        |UNION ALL SELECT ck, c_name, ab + 100.0, 'update_postimage'
        |FROM cust WHERE ck <= 1000 AND ck % 10 = 0 AND ck % 13 <> 0
        |UNION ALL SELECT ck, c_name, ab, 'delete'
        |FROM cust WHERE ck <= 1000 AND ck % 13 = 0
        |UNION ALL SELECT ck, c_name, ab, 'insert'
        |FROM cust WHERE ck > 1000 AND ck <= 1100""".stripMargin,
    // q107: run 1 = initial snapshot as inserts, run 2 = exactly the
    // q106 change classes — exactly-once across the two stateful runs
    "q107_cdc_incremental_consume" ->
      """WITH cust AS (SELECT CAST(c_custkey AS BIGINT) AS ck, c_name,
        |  CAST(c_acctbal AS DOUBLE) AS ab FROM customer)
        |SELECT ck AS c_custkey, c_name, ab AS c_acctbal,
        |  'insert' AS _change_type FROM cust WHERE ck <= 1000
        |UNION ALL SELECT ck, c_name, ab, 'update_preimage'
        |FROM cust WHERE ck <= 1000 AND ck % 10 = 0 AND ck % 13 <> 0
        |UNION ALL SELECT ck, c_name, ab + 100.0, 'update_postimage'
        |FROM cust WHERE ck <= 1000 AND ck % 10 = 0 AND ck % 13 <> 0
        |UNION ALL SELECT ck, c_name, ab, 'delete'
        |FROM cust WHERE ck <= 1000 AND ck % 13 = 0
        |UNION ALL SELECT ck, c_name, ab, 'insert'
        |FROM cust WHERE ck > 1000 AND ck <= 1100""".stripMargin,
    // q109: merge-mode historize = q19's incremental SCD2 semantics (keys
    // absent from the feed stay untouched), reached through the action +
    // versioned-table MERGE instead of a full-state rewrite
    "q109_historize_merge_mode" ->
      """SELECT c_custkey, c_acctbal,
        |  strftime(dl_ts_captured, '%Y-%m-%d %H:%M:%S.%g') AS dl_ts_captured,
        |  strftime(dl_ts_delimited, '%Y-%m-%d %H:%M:%S.%g') AS dl_ts_delimited
        |FROM (
        |WITH cur AS (SELECT c_custkey, c_acctbal FROM customer),
        |feed AS (SELECT c_custkey, c_acctbal + 50.0 AS c_acctbal FROM customer WHERE c_custkey % 4 = 0)
        |SELECT e.c_custkey, e.c_acctbal,
        |  TIMESTAMP '2024-01-01' AS dl_ts_captured, TIMESTAMP '9999-12-31' AS dl_ts_delimited
        |FROM cur e LEFT JOIN feed n ON e.c_custkey = n.c_custkey
        |WHERE n.c_custkey IS NULL OR e.c_acctbal = n.c_acctbal
        |UNION ALL
        |SELECT e.c_custkey, e.c_acctbal, TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-01 23:59:59.999'
        |FROM cur e JOIN feed n ON e.c_custkey = n.c_custkey
        |WHERE e.c_acctbal <> n.c_acctbal
        |UNION ALL
        |SELECT n.c_custkey, n.c_acctbal, TIMESTAMP '2024-01-02', TIMESTAMP '9999-12-31'
        |FROM feed n LEFT JOIN cur e ON n.c_custkey = e.c_custkey
        |WHERE e.c_custkey IS NULL OR e.c_acctbal <> n.c_acctbal
        |)""".stripMargin,
    // q110: final state = non-P orders, F partition carrying the +1.0
    // overwrite — the partition ops recompute relationally
    "q110_versioned_partitions" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |  CAST(o_totalprice AS DOUBLE) +
        |    CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS o_totalprice,
        |  o_orderstatus
        |FROM orders WHERE o_orderkey <= 20000 AND o_orderstatus <> 'P'""".stripMargin,
    // q111: restored head == v0 exactly; pre-restore v1 (the merge that
    // bumped every <=900 balance by 50) still time-travels intact
    "q111_versioned_restore" ->
      """WITH cust AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
        |    CAST(c_acctbal AS DOUBLE) AS c_acctbal FROM customer)
        |SELECT c_custkey, c_name, c_acctbal, 'restored' AS version
        |FROM cust WHERE c_custkey <= 800
        |UNION ALL
        |SELECT c_custkey, c_name, c_acctbal + 50.0, 'pre'
        |FROM cust WHERE c_custkey <= 900""".stripMargin,
    // q112: the typed change history replayed relationally — v0 inserts
    // everything, v1 updates %7 (pre+post images) and inserts %13 twins,
    // v2 deletes %11 minus %7 with PRE-image values (original balances)
    "q112_cdf_streaming_source" ->
      """WITH cust AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS k, c_name,
        |    CAST(c_acctbal AS DOUBLE) AS bal FROM customer)
        |SELECT k AS c_custkey, c_name, bal AS c_acctbal,
        |  'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version FROM cust
        |UNION ALL SELECT k, c_name, bal, 'update_preimage', 1 FROM cust WHERE k % 7 = 0
        |UNION ALL SELECT k, c_name, bal + 100.0, 'update_postimage', 1 FROM cust WHERE k % 7 = 0
        |UNION ALL SELECT k + 1000000, c_name, bal, 'insert', 1 FROM cust WHERE k % 13 = 0
        |UNION ALL SELECT k, c_name, bal, 'delete', 2 FROM cust WHERE k % 11 = 0 AND k % 7 <> 0""".stripMargin,
    // q113: the SAME generic C4 rules re-run in DuckDB over the same
    // synthesized corpus — line filter (terminal punctuation + >=3 words)
    // then the document-level lorem-ipsum/brace/empty drops
    "q113_c4_line_cleaning" ->
      """WITH synth AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    'Document ' || doc_id || ' begins with a proper sentence.',
        |    'too short',
        |    'this line has no terminal punctuation',
        |    CASE WHEN doc_id % 10 = 0 THEN 'A code block { lurks here.' END,
        |    CASE WHEN doc_id % 17 = 0 THEN 'Lorem ipsum dolor sit amet.' END,
        |    'It ends with ' || string_split(text, ' ')[1] || '!') AS s
        |  FROM documents),
        |cleaned AS (
        |  SELECT doc_id, array_to_string(list_filter(string_split(s, chr(10)),
        |    l -> regexp_matches(l, '[.!?"'']\s*$')
        |      AND len(list_filter(string_split_regex(l, '\s+'), w -> len(w) > 0)) >= 3),
        |    chr(10)) AS cleaned
        |  FROM synth)
        |SELECT doc_id, cleaned,
        |  (NOT contains(lower(cleaned), 'lorem ipsum')) AND (NOT contains(cleaned, '{'))
        |    AND len(cleaned) > 0 AS accept
        |FROM cleaned""".stripMargin,
    // q114: every Gopher signal recomputed generically in DuckDB with the
    // identical arithmetic (same splits, same operand order → same double
    // bits), then the paper's accept conjunction
    "q114_gopher_quality_filter" ->
      """WITH synth AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    text || ' and that is the point.',
        |    CASE WHEN doc_id % 9 = 0 THEN '# # # # # # # # # # # #' END,
        |    CASE WHEN doc_id % 13 = 0 THEN '- bullet one' END,
        |    CASE WHEN doc_id % 13 = 0 THEN '- bullet two' END,
        |    CASE WHEN doc_id % 7 = 0 THEN 'to be continued...' END) AS s
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id, s,
        |    list_filter(string_split_regex(s, '\s+'), w -> len(w) > 0) AS words,
        |    list_filter(string_split(s, chr(10)), l -> len(trim(l)) > 0) AS lines
        |  FROM synth),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(words) AS INT) AS word_count,
        |    CAST(list_sum(list_transform(words, w -> len(w))) AS DOUBLE) /
        |      greatest(CAST(len(words) AS DOUBLE), 1.0) AS mean_word_len,
        |    CAST(len(regexp_extract_all(s, '#')) + len(regexp_extract_all(s, '\.\.\.')) AS DOUBLE) /
        |      greatest(CAST(len(words) AS DOUBLE), 1.0) AS symbol_word_ratio,
        |    CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-•*]'))) AS DOUBLE) /
        |      greatest(CAST(len(lines) AS DOUBLE), 1.0) AS bullet_line_frac,
        |    CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) AS DOUBLE) /
        |      greatest(CAST(len(lines) AS DOUBLE), 1.0) AS ellipsis_line_frac,
        |    CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) /
        |      greatest(CAST(len(words) AS DOUBLE), 1.0) AS alpha_word_frac,
        |    CAST(len(list_intersect(list_distinct(string_split(lower(s), ' ')),
        |      ['the','be','to','of','and','that','have','with'])) AS INT) AS stopword_hits
        |  FROM sig)
        |SELECT doc_id, word_count, mean_word_len, symbol_word_ratio,
        |  bullet_line_frac, ellipsis_line_frac, alpha_word_frac, stopword_hits,
        |  (word_count BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
        |    AND symbol_word_ratio <= 0.1 AND bullet_line_frac <= 0.9
        |    AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
        |    AND stopword_hits >= 2 AS gopher_accept
        |FROM m""".stripMargin,
    // q108: the planted-copy drop is structural (same vector → same
    // cluster, equal centroid sim, id tie-break) — REQUIREd in-query, so
    // the emitted drop list equals the planted list, which DuckDB
    // rebuilds without any clustering
    "q108_semdedup_planted" ->
      """SELECT CAST(vec_id + 1000000 AS BIGINT) AS dropped_id
        |FROM embeddings WHERE vec_id % 7 = 0""".stripMargin,
    // q98: every historical snapshot recomputed relationally; the
    // post-OPTIMIZE latest must equal v2 exactly
    "q98_versioned_time_travel" ->
      """WITH cust AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
        |    CAST(c_acctbal AS DOUBLE) AS c_acctbal FROM customer),
        |v2 AS (
        |  SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal
        |  FROM cust WHERE c_custkey <= 1200
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_acctbal FROM cust
        |  WHERE c_custkey > 1200 AND c_custkey <= 1300)
        |SELECT c_custkey, c_name, c_acctbal, 'v0' AS version FROM cust WHERE c_custkey <= 1000
        |UNION ALL SELECT c_custkey, c_name, c_acctbal, 'v1' FROM cust WHERE c_custkey <= 1200
        |UNION ALL SELECT c_custkey, c_name, c_acctbal, 'v2' FROM v2
        |UNION ALL SELECT c_custkey, c_name, c_acctbal, 'latest' FROM v2""".stripMargin,
    // q99: exactly-once incremental consumption — the union of both runs
    // must equal the whole topic, no duplicates, no gaps
    "q99_kafka_state_incremental" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
        |  CAST(c_acctbal AS DOUBLE) AS c_acctbal,
        |  CAST(c_custkey % 4 AS INT) AS partition,
        |  CAST(row_number() OVER (PARTITION BY c_custkey % 4 ORDER BY c_custkey) - 1 AS BIGINT) AS "offset"
        |FROM customer""".stripMargin,
    // q100: base load + one upsert batch replayed relationally
    "q100_streaming_cdc_versioned" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
        |  CASE WHEN c_custkey % 5 = 0 THEN CAST(c_acctbal AS DOUBLE) + 50.0
        |       ELSE CAST(c_acctbal AS DOUBLE) END AS c_acctbal
        |FROM customer
        |UNION ALL
        |SELECT CAST(c_custkey AS BIGINT) + 10000, c_name,
        |  CAST(c_acctbal AS DOUBLE) + 50.0
        |FROM customer WHERE c_custkey % 5 = 0""".stripMargin,
    // q101: the windowed export tiles [2024-01-01, 2024-02-01) exactly, so
    // the union of windows is simply every click event; string-typed
    // because Splunk events are field->string maps
    "q101_splunk_windowed_export" ->
      """SELECT CAST(event_id AS VARCHAR) AS event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |  CAST(user_id AS VARCHAR) AS user_id
        |FROM events WHERE event_type = 'click'""".stripMargin,
    // q102: structural self-match guarantee (see q34)
    "q102_ivfpq_ann_topk" ->
      """SELECT vec_id AS qid, vec_id AS id, 1 AS rank
        |FROM embeddings WHERE vec_id % 40 = 0""".stripMargin,
    // q115: surviving set of a SQL DELETE — rows where the predicate is
    // not TRUE (false or NULL) remain
    "q115_delete_where" ->
      """SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name, p_brand,
        |  CAST(p_size AS INT) AS p_size, CAST(p_retailprice AS DOUBLE) AS p_retailprice
        |FROM part
        |WHERE NOT (p_partkey % 100 < 10 AND p_size > 25)
        |   OR (p_partkey % 100 < 10 AND p_size > 25) IS NULL""".stripMargin,
    // q116: SQL UPDATE semantics — CASE WHEN on the pre-image
    "q116_update_where" ->
      """SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_brand,
        |  CASE WHEN p_brand = 'Brand#13' THEN CAST(p_size + 100 AS INT)
        |       ELSE CAST(p_size AS INT) END AS p_size,
        |  CASE WHEN p_brand = 'Brand#13' THEN CAST(p_retailprice AS DOUBLE) * 1.1
        |       ELSE CAST(p_retailprice AS DOUBLE) END AS p_retailprice
        |FROM part""".stripMargin,
    // q119: same streaming-merge oracle as q100 — MERGE_DV storage must be
    // invisible to the result
    "q119_streaming_merge_dv" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
        |  CASE WHEN c_custkey % 5 = 0 THEN CAST(c_acctbal AS DOUBLE) + 50.0
        |       ELSE CAST(c_acctbal AS DOUBLE) END AS c_acctbal
        |FROM customer
        |UNION ALL
        |SELECT CAST(c_custkey AS BIGINT) + 10000, c_name,
        |  CAST(c_acctbal AS DOUBLE) + 50.0
        |FROM customer WHERE c_custkey % 5 = 0""".stripMargin,
    // q118: same UPDATE oracle as q116 — merge-on-read storage must be
    // invisible to the result
    "q118_update_dv" ->
      """SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_brand,
        |  CASE WHEN p_brand = 'Brand#13' THEN CAST(p_size + 100 AS INT)
        |       ELSE CAST(p_size AS INT) END AS p_size,
        |  CASE WHEN p_brand = 'Brand#13' THEN CAST(p_retailprice AS DOUBLE) * 1.1
        |       ELSE CAST(p_retailprice AS DOUBLE) END AS p_retailprice
        |FROM part""".stripMargin,
    // q117: merge-on-read storage must be invisible to the result — the
    // same relational surviving set as a rewrite-based delete
    "q117_deletion_vectors" ->
      """SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name,
        |  CAST(p_size AS INT) AS p_size
        |FROM part
        |WHERE NOT (p_size BETWEEN 20 AND 30)
        |   OR (p_size BETWEEN 20 AND 30) IS NULL""".stripMargin,
    // q122: the clone's divergent history must read as source-v0 minus
    // the clone's own delete — never the source's later appends
    "q122_shallow_clone" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
        |  CAST(c_acctbal AS DOUBLE) AS c_acctbal
        |FROM customer
        |WHERE NOT (c_acctbal < 0) OR (c_acctbal < 0) IS NULL""".stripMargin,
    // q121: the storage indirection (physical names, the map) must be
    // invisible to the relational result — rename is a projection alias,
    // drop is a projection
    "q121_column_mapping_rename" ->
      """SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name AS part_name,
        |  CAST(p_retailprice AS DOUBLE) AS p_retailprice
        |FROM part""".stripMargin,
    // q120: DSIR replayed exactly — same md5 bucket hash, same
    // (ct+1)*(Nr+m)/((cr+1)*(Nt+m)) ratio operation order, same
    // ascending-sorted left-fold summation → bit-identical double scores
    "q120_dsir_importance_resampling" ->
      """WITH tokd AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    t || list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS g
        |  FROM tokd),
        |bucketed AS (
        |  SELECT doc_id, CAST(len(g) AS INT) AS n_grams,
        |    list_transform(g, x -> CAST(('0x' || substring(md5(x), 1, 8)) AS BIGINT) % 256) AS b
        |  FROM grams),
        |tcnt AS (
        |  SELECT bucket, count(*) AS c FROM (
        |    SELECT unnest(b) AS bucket FROM bucketed WHERE doc_id % 10 = 0) GROUP BY 1),
        |rcnt AS (
        |  SELECT bucket, count(*) AS c FROM (
        |    SELECT unnest(b) AS bucket FROM bucketed WHERE doc_id % 10 <> 0) GROUP BY 1),
        |tot AS (SELECT
        |  (SELECT COALESCE(sum(c), 0) FROM tcnt) + 256 AS ntm,
        |  (SELECT COALESCE(sum(c), 0) FROM rcnt) + 256 AS nrm),
        |ratios AS (
        |  SELECT r.range AS bucket,
        |    (CAST(COALESCE(t.c, 0) + 1 AS DOUBLE) * CAST(tot.nrm AS DOUBLE)) /
        |    (CAST(COALESCE(rc.c, 0) + 1 AS DOUBLE) * CAST(tot.ntm AS DOUBLE)) AS ratio
        |  FROM range(0, 256) r
        |  LEFT JOIN tcnt t ON t.bucket = r.range
        |  LEFT JOIN rcnt rc ON rc.bucket = r.range, tot),
        |terms AS (
        |  SELECT doc_id, list(ratio ORDER BY ratio) AS l
        |  FROM (SELECT doc_id, unnest(b) AS bucket FROM bucketed WHERE doc_id % 10 <> 0) x
        |  JOIN ratios USING (bucket) GROUP BY doc_id),
        |scoredocs AS (
        |  SELECT bk.doc_id, bk.n_grams,
        |    COALESCE(list_reduce(list_prepend(CAST(0 AS DOUBLE), tm.l), (a, x) -> a + x), 0.0) AS score
        |  FROM bucketed bk LEFT JOIN terms tm ON bk.doc_id = tm.doc_id
        |  WHERE bk.doc_id % 10 <> 0)
        |SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
        |  n_grams, score
        |FROM scoredocs ORDER BY score DESC, doc_id LIMIT 50""".stripMargin,

    "q123_repeated_span_removal" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0
        |      THEN text || ' the quick brown fox jumps over the lazy dog again and again'
        |      ELSE text END AS text
        |  FROM documents),
        |tokd AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        |  FROM planted),
        |wins AS (
        |  SELECT doc_id, CAST(pos AS INT) AS pos,
        |    CAST(('0x' || substring(md5(array_to_string(t[pos+1:pos+8], ' ')), 1, 15)) AS BIGINT) AS h,
        |    CAST(('0x' || substring(md5(array_to_string(t[pos+1:pos+8], ' ')), 16, 15)) AS BIGINT) AS h2
        |  FROM tokd, LATERAL unnest(range(0, greatest(len(t) - 7, 0))) AS u(pos)),
        |dup AS (SELECT h, h2 FROM wins GROUP BY h, h2 HAVING count(*) > 1),
        |starts AS (
        |  SELECT doc_id, list(pos ORDER BY pos) AS s
        |  FROM wins JOIN dup USING (h, h2) GROUP BY doc_id)
        |SELECT tokd.doc_id,
        |  CAST(len(t) AS INT) AS n_tokens,
        |  CAST(COALESCE(len(s), 0) AS INT) AS n_dup_windows,
        |  CAST(len(t) - len(kept) AS INT) AS n_removed_tokens,
        |  COALESCE(array_to_string(list_transform(kept, j -> t[j+1]), ' '), '') AS cleaned_text
        |FROM (
        |  SELECT tokd.doc_id, t,
        |    list_filter(range(0, len(t)), j ->
        |      len(list_filter(COALESCE(s, []), x -> x <= j AND j < x + 8)) = 0) AS kept, s
        |  FROM tokd LEFT JOIN starts ON tokd.doc_id = starts.doc_id) tokd""".stripMargin,

    "q124_bm25_retrieval" ->
      """WITH q(query_id, query_text) AS (VALUES
        |    (1, 'table merge batch'), (2, 'fast hash value'), (3, 'slow scan row key')),
        |tokd AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |stats AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(len(t)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        |  FROM tokd),
        |qterms AS (
        |  SELECT query_id, unnest(list_distinct(
        |    list_filter(regexp_split_to_array(lower(query_text), '\s+'), x -> x <> ''))) AS term
        |  FROM q),
        |termset AS (SELECT DISTINCT term FROM qterms),
        |expl AS (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM tokd),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf, first(dl) AS dl
        |  FROM expl JOIN termset USING (term) GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |ts AS (
        |  SELECT query_id, doc_id, term,
        |    ln(1.0 + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
        |      / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * CAST(dl AS DOUBLE) / avgdl)) AS s
        |  FROM tf JOIN dfreq USING (term) JOIN qterms USING (term), stats)
        |SELECT query_id, CAST(row_number() OVER (
        |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank,
        |  doc_id, n_terms_hit,
        |  CAST(floor(score * 1000000.0 + 0.5) AS BIGINT) AS score_e6
        |FROM (
        |  SELECT query_id, doc_id, count(*) AS n_terms_hit,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(s ORDER BY term)), (a, x) -> a + x) AS score
        |  FROM ts GROUP BY query_id, doc_id)
        |QUALIFY rank <= 10""".stripMargin,

    "q125_generated_columns" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE o_orderkey <= 30000
        |  AND strftime(o_orderdate, '%Y-%m') BETWEEN '1995-01' AND '1995-12'
        |GROUP BY 1""".stripMargin,

    "q126_nb_quality_classifier" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0 THEN text || ' premium curated editorial' ELSE text END AS text,
        |    doc_id % 4 = 0 AS hi
        |  FROM documents),
        |tokd AS (
        |  SELECT doc_id, hi,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM planted),
        |grams AS (
        |  SELECT doc_id, hi,
        |    t || list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS g
        |  FROM tokd),
        |bucketed AS (
        |  SELECT doc_id, hi, CAST(len(g) AS INT) AS n_grams,
        |    list_transform(g, x -> CAST(('0x' || substring(md5(x), 1, 8)) AS BIGINT) % 256) AS b
        |  FROM grams),
        |tcnt AS (
        |  SELECT bucket, count(*) AS c FROM (
        |    SELECT unnest(b) AS bucket FROM bucketed WHERE doc_id % 3 = 0 AND hi) GROUP BY 1),
        |bcnt AS (
        |  SELECT bucket, count(*) AS c FROM (
        |    SELECT unnest(b) AS bucket FROM bucketed WHERE doc_id % 3 = 0 AND NOT hi) GROUP BY 1),
        |tot AS (SELECT
        |  (SELECT COALESCE(sum(c), 0) FROM tcnt) + 256 AS ntm,
        |  (SELECT COALESCE(sum(c), 0) FROM bcnt) + 256 AS nbm,
        |  (SELECT count(*) FROM planted WHERE doc_id % 3 = 0 AND hi) AS dt,
        |  (SELECT count(*) FROM planted WHERE doc_id % 3 = 0 AND NOT hi) AS db),
        |lr AS (
        |  SELECT r.range AS bucket,
        |    CAST(floor(ln((CAST(COALESCE(t.c, 0) + 1 AS DOUBLE) * CAST(tot.nbm AS DOUBLE)) /
        |      (CAST(COALESCE(bc.c, 0) + 1 AS DOUBLE) * CAST(tot.ntm AS DOUBLE))) * 1000000.0 + 0.5) AS BIGINT) AS m
        |  FROM range(0, 256) r
        |  LEFT JOIN tcnt t ON t.bucket = r.range
        |  LEFT JOIN bcnt bc ON bc.bucket = r.range, tot),
        |pri AS (SELECT CAST(floor(ln(CAST(dt + 1 AS DOUBLE) / CAST(db + 1 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS p FROM tot),
        |evid AS (
        |  SELECT doc_id, sum(m) AS s
        |  FROM (SELECT doc_id, unnest(b) AS bucket FROM bucketed WHERE doc_id % 3 <> 0) x
        |  JOIN lr USING (bucket) GROUP BY doc_id)
        |SELECT bk.doc_id, bk.n_grams,
        |  CAST(COALESCE(e.s, 0) + pri.p AS BIGINT) AS score_micro,
        |  (COALESCE(e.s, 0) + pri.p) > 0 AS predicted,
        |  bk.hi AS actual_hi
        |FROM bucketed bk LEFT JOIN evid e ON bk.doc_id = e.doc_id, pri
        |WHERE bk.doc_id % 3 <> 0""".stripMargin,

    "q127_tfidf_keywords" ->
      """WITH tokd AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |n AS (SELECT count(*) AS nd FROM tokd),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(t) AS term FROM tokd) GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |scored AS (
        |  SELECT doc_id, term, tf,
        |    CAST(tf AS DOUBLE) * (ln((CAST(nd AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) + 1.0) AS s
        |  FROM tf JOIN dfreq USING (term), n)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, term) AS INT) AS rank,
        |  term, tf,
        |  CAST(floor(s * 1000000.0 + 0.5) AS BIGINT) AS score_e6
        |FROM scored
        |QUALIFY rank <= 5""".stripMargin,

    // q128: the hashed bigram LM replayed exactly — same md5 bucket hash,
    // same micro-nat quantization of both ln tables, integer-only
    // per-document sums. nll is clamped at 0 on BOTH engines (collision
    // artifacts below the smoothing floor carry no signal), which also
    // keeps the integer division on non-negative operands where DuckDB //
    // (floor) and Spark div (truncate) agree
    "q128_lm_perplexity" ->
      """WITH tokd AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |c1 AS (
        |  SELECT bucket, count(*) AS c FROM (
        |    SELECT unnest(list_transform(t,
        |      x -> CAST(('0x' || substring(md5(x),1,8)) AS BIGINT) % 4096)) AS bucket
        |    FROM tokd WHERE doc_id % 3 = 0) GROUP BY 1),
        |c2 AS (
        |  SELECT bucket, count(*) AS c FROM (
        |    SELECT unnest(list_transform(range(1, len(t)),
        |      i -> CAST(('0x' || substring(md5(t[i] || ' ' || t[i+1]),1,8)) AS BIGINT) % 4096)) AS bucket
        |    FROM tokd WHERE doc_id % 3 = 0) GROUP BY 1),
        |lnprev AS (
        |  SELECT r.range AS bucket,
        |    CAST(floor(ln(CAST(COALESCE(c1.c,0) + 4096 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS m
        |  FROM range(0, 4096) r LEFT JOIN c1 ON c1.bucket = r.range),
        |lnpair AS (
        |  SELECT r.range AS bucket,
        |    CAST(floor(ln(CAST(COALESCE(c2.c,0) + 1 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS m
        |  FROM range(0, 4096) r LEFT JOIN c2 ON c2.bucket = r.range),
        |posl AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> {
        |      'b1': CAST(('0x' || substring(md5(t[i]),1,8)) AS BIGINT) % 4096,
        |      'b2': CAST(('0x' || substring(md5(t[i] || ' ' || t[i+1]),1,8)) AS BIGINT) % 4096 })) AS p
        |  FROM tokd WHERE doc_id % 3 <> 0),
        |evid AS (
        |  SELECT doc_id, sum(lp.m - lq.m) AS s
        |  FROM posl JOIN lnprev lp ON lp.bucket = posl.p.b1
        |            JOIN lnpair lq ON lq.bucket = posl.p.b2
        |  GROUP BY doc_id),
        |base AS (
        |  SELECT doc_id, CAST(GREATEST(len(t) - 1, 0) AS INT) AS n_bigrams
        |  FROM tokd WHERE doc_id % 3 <> 0)
        |SELECT base.doc_id, base.n_bigrams,
        |  CAST(GREATEST(COALESCE(e.s, 0), 0) AS BIGINT) AS nll_micro,
        |  CAST(CASE WHEN base.n_bigrams > 0
        |       THEN GREATEST(COALESCE(e.s, 0), 0) // base.n_bigrams
        |       ELSE 0 END AS BIGINT) AS ppl_micro
        |FROM base LEFT JOIN evid e USING (doc_id)""".stripMargin,

    // q129: q128's perplexity replay + the CCNet tercile window — integer
    // rank arithmetic (rn*3 <= n), ties broken by doc_id on both engines
    "q129_ccnet_ppl_buckets" ->
      """WITH tokd AS (
        |  SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |c1 AS (
        |  SELECT bucket, count(*) AS c FROM (
        |    SELECT unnest(list_transform(t,
        |      x -> CAST(('0x' || substring(md5(x),1,8)) AS BIGINT) % 4096)) AS bucket
        |    FROM tokd WHERE doc_id % 3 = 0) GROUP BY 1),
        |c2 AS (
        |  SELECT bucket, count(*) AS c FROM (
        |    SELECT unnest(list_transform(range(1, len(t)),
        |      i -> CAST(('0x' || substring(md5(t[i] || ' ' || t[i+1]),1,8)) AS BIGINT) % 4096)) AS bucket
        |    FROM tokd WHERE doc_id % 3 = 0) GROUP BY 1),
        |lnprev AS (
        |  SELECT r.range AS bucket,
        |    CAST(floor(ln(CAST(COALESCE(c1.c,0) + 4096 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS m
        |  FROM range(0, 4096) r LEFT JOIN c1 ON c1.bucket = r.range),
        |lnpair AS (
        |  SELECT r.range AS bucket,
        |    CAST(floor(ln(CAST(COALESCE(c2.c,0) + 1 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS m
        |  FROM range(0, 4096) r LEFT JOIN c2 ON c2.bucket = r.range),
        |posl AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> {
        |      'b1': CAST(('0x' || substring(md5(t[i]),1,8)) AS BIGINT) % 4096,
        |      'b2': CAST(('0x' || substring(md5(t[i] || ' ' || t[i+1]),1,8)) AS BIGINT) % 4096 })) AS p
        |  FROM tokd WHERE doc_id % 3 <> 0),
        |evid AS (
        |  SELECT doc_id, sum(lp.m - lq.m) AS s
        |  FROM posl JOIN lnprev lp ON lp.bucket = posl.p.b1
        |            JOIN lnpair lq ON lq.bucket = posl.p.b2
        |  GROUP BY doc_id),
        |scored AS (
        |  SELECT tokd.doc_id, tokd.lang,
        |    CAST(CASE WHEN len(t) - 1 > 0
        |         THEN GREATEST(COALESCE(e.s, 0), 0) // (len(t) - 1)
        |         ELSE 0 END AS BIGINT) AS ppl_micro
        |  FROM tokd LEFT JOIN evid e USING (doc_id)
        |  WHERE tokd.doc_id % 3 <> 0),
        |ranked AS (
        |  SELECT doc_id, lang, ppl_micro,
        |    row_number() OVER (PARTITION BY lang ORDER BY ppl_micro, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM scored)
        |SELECT doc_id, lang, ppl_micro,
        |  CASE WHEN rn * 3 <= n THEN 'head'
        |       WHEN rn * 3 <= n * 2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM ranked""".stripMargin,

    // q130: q24's normalization + hash, joined back for per-row weights;
    // floordiv on both engines (positive operands)
    "q130_soft_dedup_weights" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0),
        |normed AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'),
        |      '\s+', ' ', 'g'))) AS ck
        |  FROM corpus),
        |counts AS (SELECT ck, count(*) AS n_copies FROM normed GROUP BY ck)
        |SELECT doc_id, n_copies,
        |  CAST(1000000 // n_copies AS BIGINT) AS weight_e6
        |FROM normed JOIN counts USING (ck)""".stripMargin,

    // q131: q123's window machinery, dup set = the BENCHMARK's windows
    "q131_decontaminate_spans" ->
      """WITH bench(btext) AS (VALUES
        |    ('what is the capital of france paris is the capital of france'),
        |    ('the mitochondria is the powerhouse of the cell as everyone knows')),
        |planted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0
        |      THEN text || ' what is the capital of france paris is the capital of france'
        |      WHEN doc_id % 10 = 5
        |      THEN 'the mitochondria is the powerhouse of the cell as everyone knows ' || text
        |      ELSE text END AS text
        |  FROM documents),
        |tokd AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        |  FROM planted),
        |btokd AS (
        |  SELECT list_filter(regexp_split_to_array(btext, '\s+'), x -> x <> '') AS t
        |  FROM bench),
        |bwins AS (
        |  SELECT DISTINCT
        |    CAST(('0x' || substring(md5(array_to_string(t[pos+1:pos+8], ' ')), 1, 15)) AS BIGINT) AS h,
        |    CAST(('0x' || substring(md5(array_to_string(t[pos+1:pos+8], ' ')), 16, 15)) AS BIGINT) AS h2
        |  FROM btokd, LATERAL unnest(range(0, greatest(len(t) - 7, 0))) AS u(pos)),
        |wins AS (
        |  SELECT doc_id, CAST(pos AS INT) AS pos,
        |    CAST(('0x' || substring(md5(array_to_string(t[pos+1:pos+8], ' ')), 1, 15)) AS BIGINT) AS h,
        |    CAST(('0x' || substring(md5(array_to_string(t[pos+1:pos+8], ' ')), 16, 15)) AS BIGINT) AS h2
        |  FROM tokd, LATERAL unnest(range(0, greatest(len(t) - 7, 0))) AS u(pos)),
        |starts AS (
        |  SELECT doc_id, list(pos ORDER BY pos) AS s
        |  FROM wins JOIN bwins USING (h, h2) GROUP BY doc_id)
        |SELECT tokd.doc_id,
        |  CAST(len(t) AS INT) AS n_tokens,
        |  CAST(COALESCE(len(s), 0) AS INT) AS n_dup_windows,
        |  CAST(len(t) - len(kept) AS INT) AS n_removed_tokens,
        |  COALESCE(array_to_string(list_transform(kept, j -> t[j+1]), ' '), '') AS cleaned_text
        |FROM (
        |  SELECT tokd.doc_id, t,
        |    list_filter(range(0, len(t)), j ->
        |      len(list_filter(COALESCE(s, []), x -> x <= j AND j < x + 8)) = 0) AS kept, s
        |  FROM tokd LEFT JOIN starts ON tokd.doc_id = starts.doc_id) tokd""".stripMargin,

    // q132: integer micro-unit weights/normalizer (order-free long sum; the
    // libm pow is confined to per-domain quantization), exactly-rounded
    // double ops downstream, integer keep compare
    "q132_temperature_mix" ->
      """WITH totals AS (
        |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS t
        |  FROM documents GROUP BY source HAVING sum(n_chars) > 0),
        |pw AS (
        |  SELECT source, t,
        |    CAST(floor(pow(CAST(t AS DOUBLE), 0.5) * 1000000.0 + 0.5) AS BIGINT) AS pw
        |  FROM totals),
        |rates AS (
        |  SELECT source,
        |    LEAST(1000000, CAST(floor(
        |      floor(100000.0 * CAST(pw AS DOUBLE) / CAST(z AS DOUBLE))
        |        * 1000000.0 / CAST(t AS DOUBLE)) AS BIGINT)) AS rate_e6
        |  FROM (SELECT source, t, pw, sum(pw) OVER () AS z FROM pw))
        |SELECT d.doc_id, d.source, r.rate_e6 AS _mix_rate_e6
        |FROM documents d JOIN rates r USING (source)
        |WHERE CAST(floor((CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |        / 4294967296.0) * 1000000.0) AS BIGINT) < r.rate_e6""".stripMargin,

    // q133: the full four-stage curation chain replayed — q24's dedup,
    // a token-bound gate, q38's decontamination, q120's DSIR — each CTE
    // feeding the next exactly as the Spark stages do
    "q133_curation_pipeline" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0),
        |normed AS (
        |  SELECT doc_id, text,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'),
        |      '\s+', ' ', 'g'))) AS ck
        |  FROM corpus),
        |canon AS (SELECT min(doc_id) AS doc_id FROM normed GROUP BY ck),
        |deduped AS (SELECT n.doc_id, n.text FROM normed n JOIN canon USING (doc_id)),
        |quality AS (
        |  SELECT doc_id, text FROM deduped
        |  WHERE len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))
        |    BETWEEN 5 AND 10000),
        |normq AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'),
        |      '\s+', ' ', 'g')) AS n
        |  FROM quality),
        |benchn AS (
        |  SELECT trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'),
        |      '\s+', ' ', 'g')) AS n
        |  FROM documents WHERE doc_id % 13 = 1),
        |qgrams AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(string_split(n, ' ')) - 4, 1) + 1),
        |    i -> array_to_string(list_slice(string_split(n, ' '), i, i + 4), ' '))) AS ngs
        |  FROM normq),
        |bgrams AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |    range(1, greatest(len(string_split(n, ' ')) - 4, 1) + 1),
        |    i -> array_to_string(list_slice(string_split(n, ' '), i, i + 4), ' ')))) AS ng
        |  FROM benchn),
        |flagged AS (
        |  SELECT DISTINCT doc_id
        |  FROM (SELECT doc_id, unnest(ngs) AS ng FROM qgrams) x JOIN bgrams USING (ng)),
        |clean AS (
        |  SELECT doc_id, text FROM quality
        |  WHERE doc_id NOT IN (SELECT doc_id FROM flagged) AND doc_id % 10 <> 0),
        |tokd AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM clean),
        |ttokd AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents WHERE doc_id % 10 = 0),
        |bucketed AS (
        |  SELECT doc_id,
        |    CAST(len(t || list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS INT) AS n_grams,
        |    list_transform(t || list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]),
        |      x -> CAST(('0x' || substring(md5(x), 1, 8)) AS BIGINT) % 256) AS b
        |  FROM tokd),
        |tbucketed AS (
        |  SELECT list_transform(t || list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]),
        |      x -> CAST(('0x' || substring(md5(x), 1, 8)) AS BIGINT) % 256) AS b
        |  FROM ttokd),
        |tcnt AS (
        |  SELECT bucket, count(*) AS c FROM (SELECT unnest(b) AS bucket FROM tbucketed) GROUP BY 1),
        |rcnt AS (
        |  SELECT bucket, count(*) AS c FROM (SELECT unnest(b) AS bucket FROM bucketed) GROUP BY 1),
        |tot AS (SELECT
        |  (SELECT COALESCE(sum(c), 0) FROM tcnt) + 256 AS ntm,
        |  (SELECT COALESCE(sum(c), 0) FROM rcnt) + 256 AS nrm),
        |ratios AS (
        |  SELECT r.range AS bucket,
        |    (CAST(COALESCE(t.c, 0) + 1 AS DOUBLE) * CAST(tot.nrm AS DOUBLE)) /
        |    (CAST(COALESCE(rc.c, 0) + 1 AS DOUBLE) * CAST(tot.ntm AS DOUBLE)) AS ratio
        |  FROM range(0, 256) r
        |  LEFT JOIN tcnt t ON t.bucket = r.range
        |  LEFT JOIN rcnt rc ON rc.bucket = r.range, tot),
        |terms AS (
        |  SELECT doc_id, list(ratio ORDER BY ratio) AS l
        |  FROM (SELECT doc_id, unnest(b) AS bucket FROM bucketed) x
        |  JOIN ratios USING (bucket) GROUP BY doc_id),
        |scoredocs AS (
        |  SELECT bk.doc_id, bk.n_grams,
        |    COALESCE(list_reduce(list_prepend(CAST(0 AS DOUBLE), tm.l), (a, x) -> a + x), 0.0) AS score
        |  FROM bucketed bk LEFT JOIN terms tm ON bk.doc_id = tm.doc_id)
        |SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
        |  n_grams, score
        |FROM scoredocs ORDER BY score DESC, doc_id LIMIT 100""".stripMargin,

    // q134: chunk count = max(1, ceil((n − maxLen)/stride) + 1) with
    // maxLen=32, stride=24; inclusive-index slices on the DuckDB side
    "q134_token_chunking" ->
      """WITH tokd AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, t,
        |    unnest(range(0,
        |      greatest(CAST(ceil(CAST(len(t) - 32 AS DOUBLE) / 24.0) AS BIGINT), 0) + 1)) AS i
        |  FROM tokd WHERE len(t) > 0)
        |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |  CAST(len(t[i*24 + 1 : i*24 + 32]) AS INT) AS chunk_tokens,
        |  array_to_string(t[i*24 + 1 : i*24 + 32], ' ') AS chunk_text
        |FROM idx""".stripMargin,

    // q135: the q123 machinery with the dup set = delta counts + stored
    // history counts (> 1), history never re-tokenized beyond its store CTE
    "q135_incremental_span_removal" ->
      """WITH hist AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0
        |      THEN text || ' pack my box with five dozen liquor jugs tonight'
        |      ELSE text END AS text
        |  FROM documents WHERE doc_id % 3 <> 1),
        |delta AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 1
        |      THEN text || ' pack my box with five dozen liquor jugs tonight'
        |      ELSE text END AS text
        |  FROM documents WHERE doc_id % 3 = 1),
        |htok AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        |  FROM hist),
        |store AS (
        |  SELECT h, h2, count(*) AS c FROM (
        |    SELECT
        |      CAST(('0x' || substring(md5(array_to_string(t[pos+1:pos+8], ' ')), 1, 15)) AS BIGINT) AS h,
        |      CAST(('0x' || substring(md5(array_to_string(t[pos+1:pos+8], ' ')), 16, 15)) AS BIGINT) AS h2
        |    FROM htok, LATERAL unnest(range(0, greatest(len(t) - 7, 0))) AS u(pos))
        |  GROUP BY h, h2),
        |tokd AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        |  FROM delta),
        |wins AS (
        |  SELECT doc_id, CAST(pos AS INT) AS pos,
        |    CAST(('0x' || substring(md5(array_to_string(t[pos+1:pos+8], ' ')), 1, 15)) AS BIGINT) AS h,
        |    CAST(('0x' || substring(md5(array_to_string(t[pos+1:pos+8], ' ')), 16, 15)) AS BIGINT) AS h2
        |  FROM tokd, LATERAL unnest(range(0, greatest(len(t) - 7, 0))) AS u(pos)),
        |dcnt AS (SELECT h, h2, count(*) AS dc FROM wins GROUP BY h, h2),
        |dup AS (
        |  SELECT d.h, d.h2 FROM dcnt d LEFT JOIN store s ON d.h = s.h AND d.h2 = s.h2
        |  WHERE d.dc + COALESCE(s.c, 0) > 1),
        |starts AS (
        |  SELECT doc_id, list(pos ORDER BY pos) AS s
        |  FROM wins JOIN dup USING (h, h2) GROUP BY doc_id)
        |SELECT tokd.doc_id,
        |  CAST(len(t) AS INT) AS n_tokens,
        |  CAST(COALESCE(len(s), 0) AS INT) AS n_dup_windows,
        |  CAST(len(t) - len(kept) AS INT) AS n_removed_tokens,
        |  COALESCE(array_to_string(list_transform(kept, j -> t[j+1]), ' '), '') AS cleaned_text
        |FROM (
        |  SELECT tokd.doc_id, t,
        |    list_filter(range(0, len(t)), j ->
        |      len(list_filter(COALESCE(s, []), x -> x <= j AND j < x + 8)) = 0) AS kept, s
        |  FROM tokd LEFT JOIN starts ON tokd.doc_id = starts.doc_id) tokd""".stripMargin,

    // q136: normalized line hashes counted corpus-wide; >1 = boilerplate
    "q136_line_dedup" ->
      """WITH synth AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    'Cookie Policy: this site uses cookies.',
        |    text,
        |    CASE WHEN doc_id % 4 = 0 THEN 'Subscribe to our newsletter!' END,
        |    'unique footer ' || doc_id) AS s
        |  FROM documents),
        |ld AS (SELECT doc_id, string_split(s, chr(10)) AS l FROM synth),
        |content AS (
        |  SELECT doc_id, CAST(pos AS INT) AS pos, md5(lower(trim(l[pos+1]))) AS lh
        |  FROM ld, LATERAL unnest(range(0, len(l))) AS u(pos)
        |  WHERE trim(l[pos+1]) <> ''),
        |hot AS (SELECT lh FROM content GROUP BY lh HAVING count(*) > 1),
        |agg AS (
        |  SELECT doc_id, list(pos ORDER BY pos) AS d
        |  FROM content JOIN hot USING (lh) GROUP BY doc_id)
        |SELECT ld.doc_id,
        |  CAST(len(l) AS INT) AS n_lines,
        |  CAST(COALESCE(len(d), 0) AS INT) AS n_removed_lines,
        |  array_to_string(list_transform(
        |    list_filter(range(0, len(l)), j -> NOT list_contains(COALESCE(d, []), j)),
        |    j -> l[j+1]), chr(10)) AS cleaned_text
        |FROM ld LEFT JOIN agg ON ld.doc_id = agg.doc_id""".stripMargin,

    // q137: structural oracle — identical seeds produce byte-identical
    // PNGs, identical pixels produce identical dHash, so the pair set IS
    // the same-seed pair set (distinct 16×16 noise images colliding to the
    // same 64-bit dHash is ~2^-64-improbable, and hamming 0 admits nothing
    // else)
    "q137_image_perceptual_dedup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id % 20 = b.vec_id % 20 AND a.vec_id < b.vec_id
        |WHERE a.vec_id % 7 = 0 AND b.vec_id % 7 = 0""".stripMargin,

    // q138: same structural argument — identical seeds → byte-identical
    // WAVs → identical fingerprints; distinct random contours never land
    // at hamming 0
    "q138_audio_perceptual_dedup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id % 15 = b.vec_id % 15 AND a.vec_id < b.vec_id
        |WHERE a.vec_id % 11 = 0 AND b.vec_id % 11 = 0""".stripMargin,

    // q139: same-seed videos share all 6 distinct frames (distinct random
    // frames colliding in dHash across groups is ~2^-64-improbable)
    "q139_video_frame_dedup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b, CAST(6 AS BIGINT) AS n_shared_frames
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id % 12 = b.vec_id % 12 AND a.vec_id < b.vec_id
        |WHERE a.vec_id % 13 = 0 AND b.vec_id % 13 = 0""".stripMargin,

    // q140: structural oracle (the q137 argument, incrementally) — a delta
    // doc pairs with a corpus doc iff their seeds coincide: delta seed =
    // (vec_id-1) % 40, corpus seed = vec_id % 20, so the join predicate is
    // the seed equality itself (delta seeds 0/5/10/15 MATCH — positive
    // rows — and 20/25/30/35 match nothing)
    "q140_image_incremental_dedup" ->
      """SELECT d.vec_id AS id_new, c.vec_id AS id_corpus
        |FROM embeddings d JOIN embeddings c
        |  ON (d.vec_id - 1) % 40 = c.vec_id % 20
        |WHERE d.vec_id % 5 = 1 AND c.vec_id % 5 = 0""".stripMargin,

    // q141: same argument on audio fingerprints
    "q141_audio_incremental_dedup" ->
      """SELECT d.vec_id AS id_new, c.vec_id AS id_corpus
        |FROM embeddings d JOIN embeddings c
        |  ON d.vec_id % 30 = c.vec_id % 15
        |WHERE d.vec_id % 7 = 1 AND c.vec_id % 7 = 0""".stripMargin,

    // q142: same-seed delta/corpus videos share all 6 distinct frames
    "q142_video_incremental_dedup" ->
      """SELECT d.vec_id AS id_new, c.vec_id AS id_corpus,
        |  CAST(6 AS BIGINT) AS n_shared_frames
        |FROM embeddings d JOIN embeddings c
        |  ON d.vec_id % 20 = c.vec_id % 10
        |WHERE d.vec_id % 11 = 1 AND c.vec_id % 11 = 0""".stripMargin,

    // q143: the q133 dedup/gate CTEs + the q132 mixing CTEs (budget
    // 200000, weight = token count) + the q134 chunking CTEs, composed
    "q143_curation_mix_pack" ->
      """WITH corpus AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, source FROM documents WHERE doc_id % 5 = 0),
        |normed AS (
        |  SELECT doc_id, text, source,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'),
        |      '\s+', ' ', 'g'))) AS ck
        |  FROM corpus),
        |canon AS (SELECT min(doc_id) AS doc_id FROM normed GROUP BY ck),
        |deduped AS (SELECT n.doc_id, n.text, n.source FROM normed n JOIN canon USING (doc_id)),
        |quality AS (
        |  SELECT doc_id, text, source,
        |    CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM deduped
        |  WHERE len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))
        |    BETWEEN 5 AND 10000),
        |totals AS (
        |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t
        |  FROM quality GROUP BY source HAVING sum(n_tokens) > 0),
        |pw AS (
        |  SELECT source, t,
        |    CAST(floor(pow(CAST(t AS DOUBLE), 0.5) * 1000000.0 + 0.5) AS BIGINT) AS pw
        |  FROM totals),
        |rates AS (
        |  SELECT source,
        |    LEAST(1000000, CAST(floor(
        |      floor(200000.0 * CAST(pw AS DOUBLE) / CAST(z AS DOUBLE))
        |        * 1000000.0 / CAST(t AS DOUBLE)) AS BIGINT)) AS rate_e6
        |  FROM (SELECT source, t, pw, sum(pw) OVER () AS z FROM pw)),
        |mixed AS (
        |  SELECT q.doc_id, q.text, q.source, r.rate_e6 AS _mix_rate_e6
        |  FROM quality q JOIN rates r USING (source)
        |  WHERE CAST(floor((CAST(('0x' || substring(md5(CAST(q.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |          / 4294967296.0) * 1000000.0) AS BIGINT) < r.rate_e6),
        |tokd AS (
        |  SELECT doc_id, source, _mix_rate_e6,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        |  FROM mixed),
        |idx AS (
        |  SELECT doc_id, source, _mix_rate_e6, t,
        |    unnest(range(0,
        |      greatest(CAST(ceil(CAST(len(t) - 32 AS DOUBLE) / 24.0) AS BIGINT), 0) + 1)) AS i
        |  FROM tokd WHERE len(t) > 0)
        |SELECT doc_id, source, _mix_rate_e6, CAST(i AS INT) AS chunk_idx,
        |  CAST(len(t[i*24 + 1 : i*24 + 32]) AS INT) AS chunk_tokens,
        |  array_to_string(t[i*24 + 1 : i*24 + 32], ' ') AS chunk_text
        |FROM idx""".stripMargin,

    // q144: structural oracle — survivors are the first poster of each
    // seed: all of batch 1 (ids 0..49), batch 2's novel tail (125..149),
    // batch 3's novel tail (235..249); every other row re-posts an
    // already-stored seed and is dropped by the store join
    "q144_streaming_media_dedup" ->
      """SELECT CAST(id AS BIGINT) AS media_id, CAST(1 AS INT) AS batch FROM range(0, 50) t(id)
        |UNION ALL
        |SELECT CAST(id AS BIGINT), CAST(2 AS INT) FROM range(125, 150) t(id)
        |UNION ALL
        |SELECT CAST(id AS BIGINT), CAST(3 AS INT) FROM range(235, 250) t(id)""".stripMargin,

    // q145: same structural oracle as q144 (first poster of each seed),
    // text modality — the seed → batch layout is identical by construction
    "q145_streaming_text_dedup" ->
      """SELECT CAST(id AS BIGINT) AS doc_id, CAST(1 AS INT) AS batch FROM range(0, 50) t(id)
        |UNION ALL
        |SELECT CAST(id AS BIGINT), CAST(2 AS INT) FROM range(125, 150) t(id)
        |UNION ALL
        |SELECT CAST(id AS BIGINT), CAST(3 AS INT) FROM range(235, 250) t(id)""".stripMargin,

    // q146: the planted copies (every 10th-stored vector, relabeled
    // +2000000) must each pair with exactly their source — identical
    // vectors share a hyperplane bucket structurally, cosine 1 ≥ 0.95
    "q146_embedding_incremental_dedup" ->
      """SELECT vec_id + 2000000 AS id_new, vec_id AS id_corpus
        |FROM embeddings WHERE vec_id % 10 = 0""".stripMargin,

    // q147: structural oracle — survivors are the min-id poster of each
    // seed, across AND within batches: batch 1's ids 0..39 (40..49 are
    // within-batch re-posts of seeds 0..9), batch 2's 100..119 and
    // 145..149 (120..129 are within-batch re-posts, 130..144 re-post
    // stored seeds 0..14)
    "q147_intra_batch_dedup" ->
      """SELECT CAST(id AS BIGINT) AS doc_id, CAST(1 AS INT) AS batch FROM range(0, 40) t(id)
        |UNION ALL
        |SELECT CAST(id AS BIGINT), CAST(2 AS INT) FROM range(100, 120) t(id)
        |UNION ALL
        |SELECT CAST(id AS BIGINT), CAST(2 AS INT) FROM range(145, 150) t(id)""".stripMargin,

    // q148: structural oracle (q147's argument through OPH signing) —
    // survivors are the min-id poster of each seed: batch 1's 0..29
    // (30..34 re-post within-batch), batch 2's 100..114 (115..124
    // re-post stored seeds, 125..129 re-post within-batch)
    "q148_oph_incremental_dedup" ->
      """SELECT CAST(id AS BIGINT) AS doc_id, CAST(1 AS INT) AS batch FROM range(0, 30) t(id)
        |UNION ALL
        |SELECT CAST(id AS BIGINT), CAST(2 AS INT) FROM range(100, 115) t(id)""".stripMargin,

    // q149: structural oracle — survivors per batch through the banded
    // prefix-partitioned store: batch 1's 0..39 (40..44 intra dups),
    // batch 2's 100..119 (120..127 store dups, 128..129 intra)
    "q149_pruned_store_dedup" ->
      """SELECT CAST(id AS BIGINT) AS doc_id, CAST(1 AS INT) AS batch FROM range(0, 40) t(id)
        |UNION ALL
        |SELECT CAST(id AS BIGINT), CAST(2 AS INT) FROM range(100, 120) t(id)""".stripMargin,

    // q150: exact window arithmetic — batch 1 (ids 1..5) is clean
    // history (40 tokens, 0 dup windows); batch 2: id 10 full copy of
    // stored seed 1 (all 33 windows dup → 40 tokens removed), 11 novel,
    // 12/13 an intra-batch pair (window counts 2 → both fully scrubbed),
    // 14 = 8 fresh + 8 stored tokens (exactly ONE dup window → 8 removed)
    "q150_incremental_span_store" ->
      """SELECT CAST(id AS BIGINT) AS doc_id, CAST(1 AS INT) AS batch,
        |  CAST(40 AS INT) AS n_tokens, CAST(0 AS INT) AS n_dup_windows,
        |  CAST(0 AS INT) AS n_removed_tokens
        |FROM range(1, 6) t(id)
        |UNION ALL
        |SELECT * FROM (VALUES
        |  (CAST(10 AS BIGINT), CAST(2 AS INT), CAST(40 AS INT), CAST(33 AS INT), CAST(40 AS INT)),
        |  (CAST(11 AS BIGINT), CAST(2 AS INT), CAST(40 AS INT), CAST(0 AS INT), CAST(0 AS INT)),
        |  (CAST(12 AS BIGINT), CAST(2 AS INT), CAST(40 AS INT), CAST(33 AS INT), CAST(40 AS INT)),
        |  (CAST(13 AS BIGINT), CAST(2 AS INT), CAST(40 AS INT), CAST(33 AS INT), CAST(40 AS INT)),
        |  (CAST(14 AS BIGINT), CAST(2 AS INT), CAST(16 AS INT), CAST(1 AS INT), CAST(8 AS INT))
        |) v(doc_id, batch, n_tokens, n_dup_windows, n_removed_tokens)""".stripMargin,

    // q151: exact line arithmetic — the shared batch-1 line is dropped
    // from docs 1/2 at run 1; 'alpha one' (stored once) makes doc 10's
    // copy boilerplate at run 2; docs 12/13 share a within-batch line
    "q151_incremental_line_dedup" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(1 AS INT), CAST(3 AS INT), CAST(1 AS INT),
        |   'alpha one' || chr(10) || 'alpha two'),
        |  (CAST(2 AS BIGINT), CAST(1 AS INT), CAST(3 AS INT), CAST(1 AS INT),
        |   'beta one' || chr(10) || 'beta two'),
        |  (CAST(3 AS BIGINT), CAST(1 AS INT), CAST(3 AS INT), CAST(0 AS INT),
        |   'gamma one' || chr(10) || 'gamma two' || chr(10) || 'gamma three'),
        |  (CAST(10 AS BIGINT), CAST(2 AS INT), CAST(3 AS INT), CAST(1 AS INT),
        |   'fresh ten a' || chr(10) || 'fresh ten b'),
        |  (CAST(11 AS BIGINT), CAST(2 AS INT), CAST(3 AS INT), CAST(0 AS INT),
        |   'delta one' || chr(10) || 'delta two' || chr(10) || 'delta three'),
        |  (CAST(12 AS BIGINT), CAST(2 AS INT), CAST(3 AS INT), CAST(1 AS INT),
        |   'twelve a' || chr(10) || 'twelve b'),
        |  (CAST(13 AS BIGINT), CAST(2 AS INT), CAST(3 AS INT), CAST(1 AS INT),
        |   'thirteen a' || chr(10) || 'thirteen b')
        |) v(doc_id, batch, n_lines, n_removed_lines, text)""".stripMargin,

    // q152: structural oracle — survivors through the blocked prefix-
    // partitioned image store are the first poster of each seed: batch
    // 1's 1..8 (9 an intra dup of seed 1), batch 2's 20..23 (24 a store
    // dup of seed 2, 25 an intra dup of seed 20)
    "q152_blocked_media_store_dedup" ->
      """SELECT CAST(id AS BIGINT) AS media_id, CAST(1 AS INT) AS batch FROM range(1, 9) t(id)
        |UNION ALL
        |SELECT CAST(id AS BIGINT), CAST(2 AS INT) FROM range(20, 24) t(id)""".stripMargin,

    // q153: structural oracle — first poster of each seed through the
    // crash-replay + clamped-retention sequence. Every re-post (120..129,
    // 210..219, 310..319) must be ABSENT: the replayed batch 2 and the
    // post-restart batch 3 dedup against store partitions the checkpoint
    // clamp protected from the delete-everything retention sweep; had the
    // clamp not held, those ids would re-enter as novel and the hash
    // would diverge
    "q153_housekeeping_checkpoint_clamp" ->
      """SELECT CAST(id AS BIGINT) AS media_id, CAST(1 AS INT) AS batch FROM range(0, 20) t(id)
        |UNION ALL
        |SELECT CAST(id AS BIGINT), CAST(2 AS INT) FROM range(100, 120) t(id)
        |UNION ALL
        |SELECT CAST(id AS BIGINT), CAST(3 AS INT) FROM range(200, 210) t(id)
        |UNION ALL
        |SELECT CAST(id AS BIGINT), CAST(4 AS INT) FROM range(300, 310) t(id)""".stripMargin,

    // q154: structural oracle — exactly-once novel output through the
    // fail-between-writes + rerun sequence: batch 1's ids 1..10 appear
    // ONCE under partition b1 (the rerun overwrote, never re-appended);
    // batch 2's novels 21..25 under b2; 26..30 re-post batch-1 texts and
    // are dropped by the store the rerun committed
    "q154_batchkeyed_novel_rerun" ->
      """SELECT CAST(id AS BIGINT) AS doc_id, 'b1' AS ingest_batch FROM range(1, 11) t(id)
        |UNION ALL
        |SELECT CAST(id AS BIGINT), 'b2' FROM range(21, 26) t(id)""".stripMargin,

    // q155: literal oracle — the lineage edge table the two exporters
    // produce over the parsed config: one row per action×input with the
    // input's resolved type/location/metadata; ord155 has metadata but no
    // name/tags (NULL name, EMPTY-string tags), audit155 never appears as
    // an input; id lists keep declaration order
    "q155_catalog_lineage_export" ->
      """SELECT * FROM (VALUES
        |  ('build155','CustomDataFrameAction','cust155','ParquetFileDataObject',
        |   '/data/lake/staging/customers','Customers','staging','pii,daily','mart155,audit155'),
        |  ('build155','CustomDataFrameAction','ord155','CsvFileDataObject',
        |   '/data/lake/staging/orders',NULL,'staging','','mart155,audit155'),
        |  ('copy155','CopyAction','cust155','ParquetFileDataObject',
        |   '/data/lake/staging/customers','Customers','staging','pii,daily','audit155')
        |) v(action_id, action_type, input_id, input_type, input_location,
        |    input_name, input_layer, input_tags, output_ids)""".stripMargin,

    // q156: the reflective creator's deterministic output — range with
    // the configured factor and prefix applied
    "q156_custom_df_classname" ->
      """SELECT CAST(id AS BIGINT) AS k, CAST(id * 3 AS BIGINT) AS v,
        |  'row_' || CAST(id AS VARCHAR) AS tag
        |FROM range(0, 200) t(id)""".stripMargin,

    // q157: ids 1..10 land exactly ONCE under the DERIVED key of the first
    // partition (the rerun overwrote its own batch partition); 21..25
    // under the second partition's derived key; 26..30 re-post batch-1
    // texts and are dropped by the store the rerun committed. The token
    // is PartitionDiffMode's canonical partition-values identity.
    "q157_derived_batchkey_partitiondiff" ->
      """SELECT CAST(id AS BIGINT) AS doc_id, '2024-01-01' AS dt,
        |  'dt=2024-01-01' AS ingest_batch FROM range(1, 11) t(id)
        |UNION ALL
        |SELECT CAST(id AS BIGINT), '2024-01-02', 'dt=2024-01-02' FROM range(21, 26) t(id)""".stripMargin,

    // q158: the queue serves nation verbatim; the receive loop must
    // deliver every message exactly once (the run itself asserts the
    // cumulative acks reached the broker)
    "q158_jms_loopback_queue" ->
      """SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS INT) AS n_regionkey FROM nation""".stripMargin,

    // q159: the five region CSVs the two transfer passes landed tile the
    // nation table exactly — a lost or double-landed file breaks the hash
    "q159_sftp_fileref_transfer" ->
      """SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS INT) AS n_regionkey FROM nation""".stripMargin
  )
}

/** q156 fixture: a deterministic synthetic feed resolved BY CLASS NAME
  * through the config surface ([[graft.sources.CustomDfCreator]] — the
  * reference's `CustomDfCreator` reflection contract). Options pass
  * through from HOCON. */
class Q156SyntheticFeed extends graft.sources.CustomDfCreator {
  override def exec(spark: SparkSession,
                    options: Map[String, String]): DataFrame =
    spark.range(options("rows").toLong).select(
      col("id").as("k"),
      (col("id") * options("factor").toLong).as("v"),
      concat(lit(options.getOrElse("prefix", "p")), col("id")).as("tag"))
}
