package graft

import java.nio.file.{Files, Paths}

/** Regenerates PLANS.md: formatted physical plans of headline queries, the
  * audit trail for the scale claims (pushed filters, pruned columns,
  * broadcasts, partial aggregation, custom exec nodes).
  * Run: sbt "runMain graft.Plans". */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Engine.local(8, "plans")
    val dir = "/root/testdata/sf0.001"
    val headline = Seq(
      "q_scan_project", "q1_agg", "q_join_multi", "q_anti_join",
      "q_topk_perkey", "d_minhash_lsh", "v_knn_brute",
      "q_bloom_prune", "q_reagg", "t_pack", "q_skew_join", "q_lateral",
      "t_decontaminate",
      // round 5 additions: the fixed t_freq_quality fan-out (explode must
      // appear once), the exchange-free bucketed join, the span-df barrier,
      // one PageRank round's join+agg shape, and the funnel's broadcast
      // per-user gates
      "t_freq_quality", "q_bucketed_join", "t_dup_spans", "g_degree_dist",
      "q_funnel",
      // round 6: the 10 slowest bench queries — the expensive tail is
      // exactly where plan evidence matters most
      "d_ppjoin", "d_incremental", "v_knn_ivf", "v_knn_ivfpq",
      "p_incr_rollup", "d_clusters_stars", "g_pagerank", "t_curate",
      "q_tpch_q3", "q_tpch_q5",
      // round-6 flagships: two-phase top-k family (operator, rewrite,
      // batched ANN, domain quota), triangle census, Q18
      "q_topk_rewrite", "v_knn_batch", "t_source_quota", "g_triangles",
      "q_tpch_q18")

    // per-query "why this is the 100× plan" — rendered above the plan block
    val notes: Map[String, String] = Map(
      "d_ppjoin" -> ("100× plan: the candidate join's keys are each doc's " +
        "RAREST prefix shingles (per-doc window over (df, sh) — no global " +
        "rank, no driver state), so per-key fan-out is bounded by " +
        "construction (measured: ScaleSpec's prefix-key probe); the exact " +
        "verify recomputes intersections only for candidate pairs. The " +
        "repeated shingle subtree below AdaptiveSparkPlan is one exchange " +
        "at runtime (ReusedExchange on the doc_id repartition barrier)."),
      "d_incremental" -> ("100× plan: the arriving batch joins a " +
        "PERSISTENT band-key index — a key-equality join sized by the " +
        "batch, never batch×corpus; the corpus-side index is loaded, not " +
        "recomputed, so incremental admission cost tracks batch size."),
      "v_knn_ivf" -> ("100× plan: assignment = corpus × broadcast(nCells " +
        "seed rows) with map-side-combined max(struct(cos,-cell)) — the " +
        "exchange carries ONE row per vector, not corpus×nCells; probe = " +
        "an nCells-row sort broadcast into a key-equality join. At write " +
        "time `cell` is the bucketing column: a probe scans nprobe/nCells " +
        "of the corpus and Catalyst prunes the rest. Bench ann_split " +
        "separates this rebuild from the steady-state probe."),
      "v_knn_ivfpq" -> ("100× plan: IVF prunes WHICH vectors are scored " +
        "(broadcast probe cells), PQ compresses HOW (m-byte codes + " +
        "broadcast ADC LUT of m·nCodes rows); the code table is the only " +
        "corpus-sized artifact and nothing shuffles at embedding width."),
      "p_incr_rollup" -> ("100× plan: each arriving batch is aggregated " +
        "map-side to day cardinality BEFORE touching the rollup table, and " +
        "the merge is an additive decimal upsert — maintenance cost is " +
        "O(batch), the rollup's history is never re-read. Wall time is " +
        "managed-table write overhead × 3 sequential batches, inherent to " +
        "the incremental-maintenance semantics under test."),
      "d_clusters_stars" -> ("100× plan: Kiveris large/small-star rounds " +
        "are each a key-equality join + min-aggregate (map-side combined); " +
        "localCheckpoint truncates lineage so the plan below is one " +
        "round's shape, not iterations² — memory and plan size stay O(1) " +
        "in round count."),
      "g_pagerank" -> ("100× plan: one iteration = contributions join " +
        "(key-equality on src) + decimal-exact sum by dst + broadcast " +
        "teleport scalar; ranks are localCheckpointed per round (lineage " +
        "O(1)); the plan below is the final iteration's shape."),
      "t_curate" -> ("100× plan: exact-dedup survivors (hash groupBy " +
        "argmin), language vote, and the token-window filter compose into " +
        "ONE declarative plan — every stage shuffles on the same doc key " +
        "or a group key derived from it, no driver-side loop, no collect."),
      "q_tpch_q3" -> ("100× plan: the classic star shape — selective dim " +
        "filters reach the scans (PushedFilters), small sides broadcast, " +
        "the single fact-key shuffle carries partial aggregates " +
        "(partial_sum before Exchange)."),
      "q_tpch_q5" -> ("100× plan: 6-table star — region/nation broadcast, " +
        "the lineitem fact shuffles once on its join key, revenue " +
        "partial-aggregates before the exchange; join order leaves the " +
        "fact table unreplicated."),
      "q_topk_rewrite" -> ("100× plan: written as the STOCK row_number " +
        "window idiom — the WindowTopKRewrite optimizer rule replaces " +
        "Window+Filter (and Spark's sort-based WindowGroupLimit) with the " +
        "two-phase TopKPerKey operator: partial heaps below the exchange, " +
        "no sorts, shuffle ≤ partitions·keys·k rows."),
      "v_knn_batch" -> ("100× plan: N queries answered in ONE corpus pass " +
        "— the query table broadcasts, scoring is one decimal cosine per " +
        "(vector, query) pair, and the per-query top-k runs through " +
        "two-phase TopKPerKey so only scored triples (never embeddings) " +
        "reach the exchange, capped at partitions·queries·k rows."),
      "t_source_quota" -> ("100× plan: the domain cap is enforced with " +
        "bounded heaps (two-phase TopKPerKey) — no source's document list " +
        "is ever sorted, and the exchange carries ≤ sources·k rows per " +
        "partition."),
      "g_triangles" -> ("100× plan: degree orientation bounds out-degree " +
        "at O(√E) regardless of skew (no last-reducer curse), and the " +
        "adjacency-intersection form never materializes wedges — only " +
        "edge-sized key-equality joins with a codegen'd array_intersect " +
        "per row (2× over the wedge-join form at sf0.1); the three " +
        "census scalars compose via 1-row broadcasts."),
      "q_tpch_q18" -> ("100× plan: the HAVING subquery decorrelated into " +
        "one fact-side aggregation (map-side partial sums) whose few " +
        "survivors broadcast into the orders/customer joins — lineitem is " +
        "scanned once, never re-scanned per order."))
    val sb = new StringBuilder
    sb.append("# PLANS — physical plan audit (generated by graft.Plans)\n\n")
    sb.append("What to look for: `PushedFilters`/`ReadSchema` on scans, " +
      "`BroadcastHashJoin` on dims, `partial_` aggregates before exchanges, " +
      "`*(n)` whole-stage-codegen markers, and custom exec nodes " +
      "(`TopKPerKey`).\n\nNB these are PRE-execution plans: under AQE, " +
      "exchange reuse (`ReusedExchange` for the repartition-barrier " +
      "fan-outs in t_freq_quality/t_dup_spans/d_minhash_lsh) appears only " +
      "in the FINAL adaptive plan at runtime, so repeated subtrees below " +
      "an `AdaptiveSparkPlan` do not imply repeated execution.\n")
    headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      sb.append(s"\n## $name\n\n")
      notes.get(name).foreach(n => sb.append(n + "\n\n"))
      sb.append("```\n")
      // elide embedded binary literals (the bloom sketch is ~100 KB of hex;
      // the audit cares about the plan shape, not the sketch bytes)
      sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .replaceAll("0x[0-9A-Fa-f]{64,}", "0x<binary literal elided>"))
      sb.append("```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println("wrote PLANS.md")
    spark.stop()
  }
}
