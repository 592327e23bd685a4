package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions for the properties that make these operators
  * scale: filter pushdown + column pruning into the parquet scan,
  * broadcast of dimension tables, map-side partial aggregation, top-k
  * without a global sort, and broadcast of the benchmark n-gram set.
  * Regressions here change plan SHAPE long before they show in a
  * small-scale benchmark.
  */
class PlanAssertionsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q2 filter+project: predicates pushed to parquet, schema pruned to selected columns") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: ["), "no pushed filters in scan")
    assert("PushedFilters: \\[[^\\]]*GreaterThan".r.findFirstIn(p).isDefined, s"discount/date not pushed: $p")
    // ReadSchema carries only the columns the query needs, not all of lineitem
    val read = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_comment") && !read.contains("l_partkey"), s"scan reads unneeded columns: $read")
  }

  test("q3 revenue join: all dimension tables broadcast, no sort-merge join") {
    val p = plan("q3_revenue_by_nation")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins (orders/customer/nation/region dims), got $broadcasts")
    assert(!p.contains("SortMergeJoin"), "dimension join degraded to sort-merge")
  }

  test("q1 aggregation: map-side partial aggregation before the exchange") {
    val p = plan("q1_pricing_summary")
    val aggs = "HashAggregate".r.findAllIn(p).length
    assert(aggs >= 2, s"expected partial+final HashAggregate, got $aggs")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      "aggregation should shuffle exactly once")
  }

  test("q4 top-k: TakeOrderedAndProject, not a global sort") {
    val p = plan("q4_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), s"top-k compiled to a full sort: $p")
  }

  test("q38 decontamination: benchmark n-gram set broadcast, corpus side not shuffled for the join") {
    val p = plan("q38_decontamination")
    assert(p.contains("BroadcastHashJoin"), "benchmark set should broadcast")
  }

  test("q30 brute-force cosine: single scan, no join, top-k via TakeOrdered") {
    val p = plan("q30_embedding_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Join"), "brute-force top-k must not join")
  }

  test("q40 as-of join: window pass, no join operator at all") {
    val p = plan("q40_asof_join")
    assert(p.contains("Window"), "as-of join should compile to a window pass")
    assert(!p.contains("Join"), s"as-of join must not produce a join operator:\n$p")
  }

  test("q42 range join: equi-join on bucket id, never a nested-loop theta join") {
    val p = plan("q42_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degraded to a theta-join plan:\n$p")
    assert(p.contains("Join"), "bucketed range join should still be a (hash/merge) join")
  }

  test("q41 sessionize: both windows and the aggregation share one shuffle") {
    val p = plan("q41_sessionize")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1,
      s"sessionize should partition once on the key and reuse it, got $exchanges exchanges:\n$p")
  }

  test("q45 weighted sample: no shuffle before the final aggregation, no join for rate lookup") {
    val p = plan("q45_weighted_sample")
    assert(!p.contains("Join"), "stratified rate lookup must compile to CASE, not a join")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      "sampling itself must not shuffle; only the final aggregation may")
  }

  test("q52 vocab coverage: vocab broadcast to the per-doc stage, no sort-merge join") {
    val p = plan("q52_vocab_coverage")
    assert(p.contains("BroadcastHashJoin"), "top-K vocab must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "per-doc coverage join degraded to sort-merge — corpus side would shuffle")
  }

  test("q51 incremental dedup: band join is an equi-join, no cartesian/nested-loop") {
    val p = plan("q51_incremental_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"delta x store candidate generation must stay an equi-join: $p")
  }

  test("whole-suite plan sweep: no cartesian or nested-loop join in any query plan") {
    // every query's physical plan, including ones added later — the two
    // operators banned here are the classic silent 100 TB killers (a theta
    // join or a missing equi-condition compiles fine and runs forever).
    // No exceptions: the failOnCappedBuckets guard used to ride a one-row
    // broadcast carrier (printed as BroadcastNestedLoopJoin); since the
    // eager capped-bucket probe it fails at construction instead, so every
    // plan must be clean.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val p = fn(spark, dir).queryExecution.executedPlan.toString
      Seq("CartesianProduct", "BroadcastNestedLoopJoin").collect {
        case op if p.contains(op) => s"$name: $op"
      }
    }
    assert(offenders.isEmpty, s"quadratic join shapes: ${offenders.mkString("; ")}")
  }

  test("q66 fine-grained merge: ONE full-outer join on the key, no cartesian") {
    // Every merge clause (delete/update/insert conditions, column
    // restrictions, value overrides, the additional predicate) must fold
    // into the single key join's projection — a second join or a
    // nested-loop would multiply the cost of every 100 TB merge.
    val p = plan("q66_merge_fine_grained")
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).length == 1,
      s"merge should be exactly one shuffled key join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"merge degraded to a non-equi plan:\n$p")
    assert(p.contains("FullOuter"), "merge join must be full-outer")
  }

  test("q6 latest-per-key: WindowGroupLimit prunes to rank<=1 BEFORE the shuffle") {
    // Spark's InferWindowGroupLimit turns the rn=1 filter into a partial
    // per-partition top-1 ahead of the exchange — at 100 TB this is the
    // difference between shuffling the events table and shuffling one row
    // per (user, input partition).
    val p = plan("q6_latest_event_per_user")
    assert(p.contains("WindowGroupLimit"),
      s"rank filter not pushed below the window shuffle:\n$p")
  }

  test("q65 keyed top-k: rank<=3 filter prunes via WindowGroupLimit too") {
    val p = plan("q65_topk_per_source")
    assert(p.contains("WindowGroupLimit"),
      s"per-source top-3 should prune before the shuffle:\n$p")
  }

  test("q55 shard assignment: per-shard window, never a single-partition global sort") {
    val p = plan("q55_shard_assignment")
    assert(!p.contains("Exchange SinglePartition"),
      s"shard order degraded to a global row_number through one partition:\n$p")
    assert(p.contains("Exchange hashpartitioning"),
      "within-shard rank should hash-partition on the shard id")
  }

  test("q56 ngram hotspots: top-K via TakeOrdered, count is partially aggregated") {
    val p = plan("q56_ngram_hotspots")
    assert(p.contains("TakeOrderedAndProject"), s"top-K compiled to a full sort:\n$p")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "doc-frequency count should partial-aggregate map-side")
  }

  test("q58 nfc normalize: pure per-row projection — zero exchanges, codegen'd") {
    val p = plan("q58_nfc_normalize")
    assert(!p.contains("Exchange"), s"normalization pass must not shuffle:\n$p")
    // "*(n)" prefixes mark WholeStageCodegen stages in toString form
    assert(p.contains("*(1) Project"), s"nfc expression fell out of codegen:\n$p")
  }

  test("q59 hll union: sketches partial-aggregate before each exchange") {
    val p = plan("q59_hll_union")
    // both aggregation stages (per-source sketch, per-lang union) must show
    // ObjectHashAggregate partial/merge pairs, not a sort-based fallback
    assert(p.contains("ObjectHashAggregate"), s"HLL agg fell back to sort-based:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("banded/blocked incremental store joins: equi-joins only, no nested-loop") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.Dedup
    val docs = spark.range(0, 50).select(col("id").as("doc_id"))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(39)),
          i => concat(lit("w"), pmod(xxhash64(col("doc_id") * 1000 + i), lit(50000L))))))
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 5, 32)
    val banded = Dedup.minhashIncrementalPairsBandedStore(
      sigs, Dedup.minhashBandedStore(sigs, 32, 8), 32, 8)
      .queryExecution.executedPlan.toString
    assert(!banded.contains("BroadcastNestedLoopJoin") && !banded.contains("CartesianProduct"),
      s"banded pair join degraded to a nested loop:\n$banded")
    val fps = spark.range(0, 50).select(col("id"), xxhash64(col("id")).as("simhash"))
    val blocked = Dedup.simhashIncrementalPairsFromBlockedStore(
      fps, Dedup.simhashBlockedStore(fps, maxHamming = 2), maxHamming = 2)
      .queryExecution.executedPlan.toString
    assert(!blocked.contains("BroadcastNestedLoopJoin") && !blocked.contains("CartesianProduct"),
      s"blocked pair join degraded to a nested loop:\n$blocked")
  }
}
