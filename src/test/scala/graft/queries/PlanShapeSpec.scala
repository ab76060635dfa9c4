package graft.queries

import graft.{SparkSpec, Tables}

/** Physical-plan audits (the "explain and iterate" discipline): these pin
  * the plan shapes that matter at 100 TB — pushdown reaching the scan,
  * dimension broadcasts, top-k short-circuits, map-side partial aggregation,
  * and the absence of accidental nested-loop joins. A regression here is a
  * scale bug even when sf0.01 results stay correct.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    Catalog.byName(name).build(spark, sf0001).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q01 — filter and projection reach the parquet reader") {
    val p = plan("q01_scan_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate,"), p)
    // parquet isAdjustedToUTC=false → Spark 4 reads TIMESTAMP_NTZ (UTC
    // session TZ keeps literal comparisons oracle-consistent)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double,l_shipdate:timestamp_ntz>"), p)
  }

  test("q05 — explicit broadcasts produce BroadcastHashJoin, no shuffle of dims") {
    val p = plan("q05_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q13 — hash aggregation with map-side partials") {
    val p = plan("q13_tpch_q1")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
  }

  test("q21 — top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q21_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q07/q08 — semi/anti joins stay semi/anti in the physical plan") {
    assert(plan("q07_semi_join").contains("LeftSemi"), "semi")
    assert(plan("q08_anti_join").contains("LeftAnti"), "anti")
  }

  test("q10/q11 — theta residuals ride the equi join; no nested loop") {
    Seq("q10_theta_join", "q11_range_join").foreach { q =>
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q degenerated to a nested loop:\n$p")
    }
  }

  test("q28 — dedup window partitions by the hash, no global sort before rn") {
    val p = plan("q28_dedup_exact")
    assert(p.contains("row_number"), p)
    // the md5 key is projected to _w0 and the exchange hashes on it
    assert(p.contains("hashpartitioning(_w0"), p)
  }

  test("catalog-wide audit — nested loops and global windows only where declared") {
    // Queries ALLOWED a nested-loop/cartesian node: q22b is the declared
    // guarded cross join; q20b/q29 broadcast a literal single-row frame
    // (quantile boundaries / the probe vector) — a 1-row BNLJ is a scalar
    // attach, not an O(n²) hazard. Everything else joining without an equi
    // key is a scale bug, caught here before any bench regresses.
    val nestedLoopOk = Set("q22b_crossjoin", "q20b_ntile_scalable",
      "q29_ann_topk")
    // q20 is the DECLARED exact global ntile (oracle form; q20b is its
    // scale twin) — the only query allowed an unpartitioned window.
    val globalWindowOk = Set("q20_ntile")
    val offendersNl = scala.collection.mutable.ArrayBuffer.empty[String]
    val offendersWin = scala.collection.mutable.ArrayBuffer.empty[String]
    Catalog.all.foreach { q =>
      val qe = q.build(spark, sf0001).queryExecution
      val physical = qe.executedPlan.toString
      if ((physical.contains("BroadcastNestedLoopJoin") ||
           physical.contains("CartesianProduct")) &&
          !nestedLoopOk(q.name)) offendersNl += q.name
      val hasGlobalWindow = qe.optimizedPlan.collectFirst {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }.nonEmpty
      if (hasGlobalWindow && !globalWindowOk(q.name)) offendersWin += q.name
    }
    assert(offendersNl.isEmpty, s"undeclared nested-loop joins in: $offendersNl")
    assert(offendersWin.isEmpty, s"undeclared global windows in: $offendersWin")
  }

  test("q33 — blocked self-join: equi join on block pairs, no nested loop") {
    val p = plan("q33_embedding_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q33 degenerated to a nested loop:\n$p")
    assert(p.contains("dot_f32"), p)                 // native expression in the plan
  }

  test("q31/q33 — hash-keyed self-joins plan ShuffledHashJoin, not sort-merge") {
    // posting/block keys are hash-derived with no downstream sort order; a
    // sort-merge join would pay two useless O(n log n) sorts (r2 bench: 2×)
    Seq("q31_jaccard_pairs", "q33_embedding_neardup").foreach { q =>
      val p = plan(q)
      assert(p.contains("ShuffledHashJoin"), s"$q lost its hash join:\n$p")
    }
  }

  test("text kernels — q27/q36/q42/q43 are narrow maps: one exchange (final sort), no join") {
    // the per-document text queries must scale with the scan: their only
    // shuffle is the final deterministic ORDER BY (q27 additionally
    // aggregates, giving it one more exchange), and no join appears
    Seq("q36_token_count", "q42_redaction", "q43_repetition").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q grew a join:\n$p")
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges <= 2, s"$q shuffles more than the final sort:\n$p")
    }
    val p27 = plan("q27_json")
    assert(!p27.contains("Join"), s"q27 grew a join:\n$p27")
  }

  test("q44 — the benchmark shingle set broadcasts; corpus side never shuffles whole") {
    val p = plan("q44_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"q44 lost the benchmark broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q20b — scalable ntile has NO window operator (no single-partition stage)") {
    val p = plan("q20b_ntile_scalable")
    assert(!p.contains("Window"), s"q20b still plans a window:\n$p")
  }

  test("q11 — band join carries (user_id, time-bucket) as the equi key") {
    val p = plan("q11_range_join")
    // both the user id and the 5-min bucket must be join keys — the bucket
    // is what spreads a hot user across tasks at scale
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("bkt"), p)
  }
}
