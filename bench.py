"""Benchmark harness — runs the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized via a count over the result (no
collect of wide rows). A warmup query amortizes JVM/session start so
per-query numbers measure the plan, not the cold start.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parquet_rewriter_spark import catalog
from parquet_rewriter_spark.session import get_spark

# Tiered query set (round-5 VERDICT #1): the TIMED loop runs only
# HEADLINE — one representative per component family from SURVEY §2
# plus the slowest lifecycle queries — so the driver's per-round bench
# stays well inside its time budget. EXTENDED holds the remaining
# registered-and-formerly-benched queries; `python bench.py --full`
# (or SPARK_GRAFT_BENCH_FULL=1) times both tiers, feeding the full
# report in BENCH_FULL.json without growing the default gate.
# Full-tier wall budget (queries + probes): the driver's capture would
# silently lose a run that outgrows its timeout, so the bench flags
# itself loudly first (report["budget_exceeded"] + stderr subtotals).
# Recalibrated round 11: the tier grew 150 (r5) -> 220 (r9) -> 247
# (r10) -> 257 queries and the measured clean wall is 1108 s (~4.3
# s/query incl. the interleaved sf0.001 warmup and the round-11
# settle-to-scratch hygiene writes) — the round-10 constant of 1150 s
# was down to ~4% headroom. The driver's per-round capture runs only
# the HEADLINE tier (~150 s), so this constant guards MANUAL --full
# runs; keep ~20% headroom over the measured wall rather than trimming
# coverage breadth.
FULL_TIER_BUDGET_S = 1350

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "top3_orders_per_customer",
    "q8_market_share",
    "q21_last_shipper",
    "orders_with_big_lineitem",
    "variant_props_stats",
    "status_pivot_by_priority",
    "lineitem_unpivot_measures",
    "revenue_time_rollup",
    "customer_running_total",
    "user_event_type_map",
    "events_json_extract",
    "hourly_value_gapfilled",
    "doc_sentences_udtf",
    "purchase_asof_click_nearest",
    "purchase_error_overlap",
    "hot_key_split_join",
    "merge_then_aggregate",
    "compact_then_scan",
    "wap_publish_scan",
    "table_changes_feed",
    "incremental_matview_refresh",
    "bloom_pointlookup_scan",
    "secondary_zonemap_scan",
    "timestamp_asof_scan",
    "maintained_table_scan",
    "schema_ddl_lifecycle_scan",
    "type_widening_scan",
    "replica_sync_scan",
    "multi_table_txn_scan",
    "update_where_scan",
    "sort_order_evolution_scan",
    "partition_pruned_scan",
    "zorder_then_filter_scan",
    "python_ds_pushdown_scan",
    "routed_scan_report",
    "metadata_only_table_stats",
    "scd2_customer_status_history",
    "dedup_exact_docs",
    "minhash_near_dup_pairs",
    "simhash_portable_near_pairs",
    "ngram_jaccard_pairs",
    "winnow_fingerprint_pairs",
    "substring_dup_token_stats",
    "segment_dedup_docs",
    "near_dup_doc_clusters",
    "incremental_dedup_index",
    "cosine_topk_bruteforce",
    "hybrid_rrf_search",
    "embedding_int8_quantization",
    "ann_ivf_topk",
    "ann_ivf_index_lifecycle",
    "incremental_bm25_search",
    "fuzzy_part_match",
    "doc_token_stats",
    "nb_lang_confusion",
    "gopher_quality_flags",
    "doc_lm_scores",
    "pack_training_sequences",
    "mixture_token_budget_sample",
    "corpus_curation_pipeline",
    "benchmark_containment_scores",
    "multimodal_decode_features",
    "user_purchase_funnel",
    "heavy_hitter_tokens",
    "cms_token_frequency_bounds",
    "tdigest_price_quantiles",
    "distinct_sketch_users",
    "source_length_drift_ks",
    "lineitem_correlations",
    "referential_orphans_report",
    "incremental_embedding_covariance",
    "part_copurchase_pagerank",
    "stream_tumbling_counts",
    "stream_dedup_events",
    "stream_purchase_click_join",
    "stream_user_totals",
    "dsir_importance_resample",
    "bpe_merge_rules",
    "branch_publish_scan",
    # round-9 families
    "bpe_roundtrip_fidelity",
    "stream_packed_assignments",
    "incremental_pack_assignments",
    "cross_source_contamination_matrix",
    "wordpiece_fertility",
    "unigram_corpus_loglik",
    "nation_revenue_holtwinters",
    "hourly_value_seasonal_anomalies",
    # round-10 families
    "unigram_em_vocab",
    "wordpiece_encode_sample",
    "holtwinters_backtest_mape",
    "hourly_event_rate_cusum",
    # round-11 families
    "pretraining_pipeline_end_to_end",
    "bpe_pretok_encode_sample",
    "bpe_packed_windows_eos",
    "token_budget_from_stats",
    # round-12 families
    "pretraining_pipeline_v2_persisted",
    "token_budget_bpe_tokens",
    "packed_shards_versioned_table",
    "unigram_bytelevel_holdout",
    "lm_perplexity_buckets",
    "epoch_mixture_plan",
    "epoch_plan_execution",
    "quality_gated_budget_selection",
]

EXTENDED = [
    # round-12 remainder
    "mixture_budget_sampling",
    "sft_pack_loss_mask",
    "packed_shards_incremental_append",
    "packed_windows_training_order",
    "image_header_dims_patch_grid",
    # round-11 remainder
    "wordpiece_pretok_encode_sample",
    "bpe_bytelevel_roundtrip",
    "bpe_bytelevel_holdout_no_unk",
    "wordpiece_packed_windows_eos",
    "unigram_packed_windows_eos",
    "unigram_encode_unk_holdout",
    "unigram_pretok_encode_sample",
    "token_budget_auto_maintained",
    "bulk_bucketed_merge_scan",
    "rekey_inflight_read_scan",
    "source_length_drift_psi",
    "stream_incremental_drift",
    "source_lang_drift_chi2",
    "source_length_drift_w1",
    "ann_lsh_recall_gate",
    "ann_ivf_recall_gate",
    "ann_pq_recall_gate",
    "ann_lsh_retrieval_metrics",
    "ann_ivfpq_recall_gate",
    "int8_cosine_topk",
    "int8_storage_shrink",
    "ann_ivfpq_index_gate",
    "bpe_token_fertility",
    "bpe_encode_sample",
    "bpe_packed_training_windows",
    "bpe_packed_windows_dense",
    "wordpiece_vocab_pieces",
    "wordpiece_segmentation_sample",
    "unigram_best_segmentations",
    "hourly_value_robust_anomalies",
    "tokenizer_artifact_roundtrip",
    "stream_contamination_scan",
    "stream_holtwinters_fit",
    # round-10 remainder
    "wordpiece_packed_windows",
    "wordpiece_artifact_roundtrip",
    "unigram_encode_sample",
    "unigram_packed_windows",
    "unigram_artifact_roundtrip",
    "unigram_em_encode_sample",
    "unigram_em_corpus_loglik",
    "unigram_em_resume_roundtrip",
    "wordpiece_marked_encode_sample",
    "wordpiece_marked_roundtrip",
    "bpe_encode_holdout_sample",
    "stream_bpe_encoded_ingest",
    "wordpiece_encode_holdout_sample",
    "stream_wordpiece_encoded_ingest",
    "stream_unigram_encoded_ingest",
    "stream_lm_perplexity_scores",
    "lm_artifact_roundtrip",
    "lm_trigram_vs_bigram",
    "lm_quality_cutoff_buckets",
    "lm_per_language_quality",
    "dpo_preference_pairs_report",
    "dpo_tokenized_records",
    "epoch_shuffled_consumption",
    "region_revenue_holt_linear",
    "stream_event_rate_cusum",
    "tokenizer_family_compression",
    "holtwinters_vs_naive_skill",
    "branch_rebase_publish_scan",
    "catalog_branch_publish_scan",
    "refs_metadata_scan",
    "stream_dsir_scored_ingest",
    "priority_customer_overlap_sketch",
    "source_temperature_mixture",
    "length_bucketed_batch_waste",
    "multimodal_letterbox_geometry",
    "top_orders_by_revenue",
    "order_priority_count",
    "revenue_forecast",
    "status_priority_rollup",
    "join_skew_report",
    "monthly_order_stats",
    "event_type_stats",
    "hourly_event_counts",
    "purchase_asof_click",
    "events_within_5min_pairs",
    "lang_id_confusion",
    "ann_lsh_topk",
    "image_patch_grid",
    "order_value_percentiles",
    "weighted_median_price",
    "customer_balance_deciles",
    "customer_rfm_segments",
    "corpus_zipf_slope",
    "approx_distinct_users",
    "hilbert_then_filter_scan",
    "stream_table_changes",
    "bucketed_colocated_join",
    "skew_safe_distinct_users",
    "doc_repetition_scores",
    "bm25_search",
    "quality_weighted_sample",
    "stream_cms_token_frequencies",
    "ann_pq_topk",
    "mor_delete_scan",
    "conditional_merge_scan",
    "canonical_dedup_survivors",
    "stream_heavy_hitter_tokens",
    "u_shape_attribution",
    "event_transition_matrix",
    "hourly_value_ohlc",
    "ship_latency_percentiles",
    "segment_revenue_concentration",
    "segment_revenue_gini",
    "priority_sla_attainment",
    "priority_mix_chi2_monthly",
    "part_supplier_price_spread",
    "contrastive_negative_pairs",
    "leakage_safe_split",
    "curation_survivorship_funnel",
    "rolling_7d_distinct_users",
    "stream_window_approx_users",
    "brand_association_rules",
    "dow_adjusted_revenue_anomalies",
    "region_nation_revenue_shares",
    "ivf_refined_cell_balance",
    "stream_drift_alerts",
    "constrained_merge_scan",
    "cdc_ordered_merge_scan",
    "q7_volume_shipping",
    "q9_profit_by_nation_year",
    "q10_returned_revenue",
    "q11_important_parts",
    "q12_late_shipment_priority",
    "q13_customer_order_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_supplier_part_variety",
    "q17_small_quantity_revenue",
    "q19_bracketed_disjunction_revenue",
    "q20_dominant_shippers",
    "doc_stable_ids",
    "semantic_dedup_survivors",
    "stream_value_anomalies",
    "training_shard_summary",
    "user_decayed_value",
    "incremental_distinct_users",
    "stream_quality_route_summary",
    "scd2_pointintime_status",
    "python_ds_key_range_scan",
    "stream_purchase_click_leftjoin",
    "vacuum_then_scan",
    "badword_filter_summary",
    "corpus_training_order",
    "nation_revenue_trend",
    "order_value_histogram",
    "part_entity_resolution",
    "copurchase_triangle_count",
    "txn_exactly_once_scan",
    "doc_compression_quality",
    "hidden_partition_event_scan",
    "gdpr_forget_customer_scan",
    "stream_purchase_click_fulljoin",
    "source_ngram_novelty",
    "quantity_benford_screen",
    "user_behavior_entropy",
    "order_value_quartile_buckets",
    "stream_matview_user_totals",
    "stream_distinct_sketch_users",
    "stream_bottomk_user_sample",
    "stream_csv_ingest_counts",
    "stream_user_value_ewma",
    "weekly_cohort_retention",
    "signup_to_purchase_latency",
    "source_quality_wilson",
    "per_source_sample_k",
    "order_price_mad_outliers",
    "suppliers_covering_brand",
]



def _reset_session_litter(spark) -> None:
    """Make each measurement self-contained: queries legitimately
    persist intermediates internally (signatures, candidate sets,
    label-propagation checkpoints) and streaming runs leave memory-sink
    tables behind. Left in place across 84 queries, that litter drives
    heap pressure and GC time INTO LATER QUERIES' timings (observed:
    the same query 4× slower at position 60 than standalone). Clearing
    the cache, dropping consumed memory-sink views, and collecting
    Python refs (so the JVM ContextCleaner can reclaim checkpoints and
    broadcasts) between queries removes the cross-query coupling.

    The Python collect alone is NOT enough: ContextCleaner only reclaims
    JVM-side blocks (localCheckpoint RDDs, broadcast relations, shuffle
    state) when the DRIVER JVM garbage-collects, and a 16 GB heap can go
    dozens of queries between full GCs. The accumulated blocks squeeze
    unified memory and inflate exactly the widest hash-aggregation
    plans (measured on an idle box, same tree: ngram_jaccard_pairs
    10.8 s at bench position 42 vs 1.0 s with a JVM GC in this reset;
    winnow 6.7 → 2.4 s, segment_dedup 3.8 → 0.6 s). An explicit
    System.gc() per reset costs ~0.1 s and makes each timing reflect
    the query's plan instead of its predecessors' litter.

    LOCAL-MODE SCOPE: System.gc() collects only the driver JVM, which
    in this bench's local mode IS the executor. On a real cluster the
    same reset would leave executor-side blocks to each executor's own
    GC cadence (trigger a dummy job per executor if an equivalent
    reset is ever needed there); nothing in the timed loop depends on
    that, the reset only exists to decouple LOCAL measurements."""
    import gc

    spark.catalog.clearCache()
    for t in spark.catalog.listTables():
        if t.name.startswith("mem_"):
            spark.catalog.dropTempView(t.name)
    gc.collect()
    spark.sparkContext._jvm.System.gc()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # Contention self-labeling (round-9 verdict: the driver's contended
    # snapshot cost a forensic per-query diff to classify — a recorded
    # load average makes it instant). Captured BEFORE Spark boots so
    # the number reflects the box, not this bench.
    ncpu = os.cpu_count() or 1
    try:
        load_start = os.getloadavg()
    except OSError:
        load_start = (-1.0, -1.0, -1.0)
    try:
        n_procs = sum(1 for p in os.listdir("/proc") if p.isdigit())
    except OSError:
        n_procs = -1
    contended = load_start[0] > ncpu / 4
    if contended:
        print(
            f"BENCH CONTENDED: load1={load_start[0]:.1f} on {ncpu} cores "
            f"(> cores/4) at start — timings will read ~25% slow; prefer "
            f"an idle box for cross-round comparison",
            file=sys.stderr,
        )
    spark = get_spark(app_name="prs-bench")

    # warmup: touch every input table once (OS page cache + JVM warm)
    from parquet_rewriter_spark.sources.readers import TABLE_NAMES, load_table
    for t in TABLE_NAMES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:  # noqa: BLE001 - missing optional fixture
            pass
    # boot the Python worker pool (first Arrow/pandas exchange pays
    # interpreter + import startup; workers are reused afterwards)
    spark.range(spark.sparkContext.defaultParallelism).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # Plan warmup, INTERLEAVED with the timed run: warm each query at
    # the smallest fixture immediately before timing it at sf_dir. Each
    # distinct plan shape pays Janino codegen + JVM JIT on first
    # execution (~5-8 s for the wide minhash/stream plans); steady-state
    # 100 TB throughput — what the timed loop estimates — never includes
    # that one-time cost. Interleaving matters: Spark's codegen class
    # cache holds ~100 entries, so a warm-everything-then-time-everything
    # loop over 90+ queries evicts each query's compiled classes before
    # its timed run (observed: minhash 14.8 s batched vs 3.7 s
    # interleaved — the "timed" number was mostly recompilation).
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir

    import glob
    import tempfile

    def _commits_since(t_start: float) -> int:
        """Manifest snapshots written by scratch (prs_catalog_*) tables
        during a query's timed window — lifecycle queries (create +
        merge + compact + ...) self-report their commit count so a slow
        driver-run number is attributable to cold table-lifecycle cost
        rather than suspected plan regression (the r04 adjudication)."""
        n = 0
        for d in glob.glob(os.path.join(tempfile.gettempdir(), "prs_catalog_*")):
            for f in glob.glob(os.path.join(d, "**", "_manifest.v*.json"),
                               recursive=True):
                try:
                    if os.path.getmtime(f) >= t_start:
                        n += 1
                except OSError:
                    pass
        return n

    timings: dict[str, float] = {}
    commits: dict[str, int] = {}
    errors: dict[str, str] = {}
    full = ("--full" in sys.argv[1:]
            or os.environ.get("SPARK_GRAFT_BENCH_FULL", "") == "1")
    tier = HEADLINE + EXTENDED if full else HEADLINE
    names = [n for n in tier if n in catalog.REGISTRY]
    # Commit-bound lifecycle queries (many manifest commits, little
    # plan execution) swing ~2x with run order after a single warmup —
    # the first timed commit path is still cold on filesystem/JIT state
    # earlier queries would otherwise have warmed (the r6 headline vs
    # full-tier discrepancy on exactly these two). A second sf0.001
    # warm pass (~1-2 s each) damps the swing; applied only where the
    # noise was observed to keep the headline tier inside its budget.
    warm_twice = {
        "schema_ddl_lifecycle_scan",
        "maintained_table_scan",
        # observed 3-4x run-order swings in round-8 full-tier runs
        # (3 s isolated, 11-22 s mid-run) — same commit-bound noise
        "wap_publish_scan",
        "leakage_safe_split",
        # r9→r10 triage: 3.40 s (r8 headline) → 5.62 s (r9 headline)
        # → 3.6-3.7 s steady / 4.9 s first-timed on an idle box, two
        # sessions — a cache-state swinger (composes the wide
        # minhash/dedup plans), not a plan regression; the r9 diff
        # never touched its body
        "corpus_curation_pipeline",
        # r10→r11 triage (verdict r10 item 7): committed headlines
        # bounce 7.5/9.5/8.5/20.2/7.6/8.5/10.0/8.8 s across rounds
        # with NO monotone trend and no body change; idle-box ×3 after
        # double warmup still spreads 8.97-10.21 s — 3 commits +
        # full-probe exactness make it commit-bound by design. Noise
        # class, damped here like its siblings.
        "ann_ivf_index_lifecycle",
    }
    t_run_start = time.perf_counter()
    for name in names:
        fn = catalog.REGISTRY[name].fn
        for _ in range(2 if name in warm_twice else 1):
            try:
                fn(spark, warm_dir).count()
            except Exception:  # noqa: BLE001 - warmup must never fail the bench
                pass
        _reset_session_litter(spark)
        # a failing query records an error line instead of killing the
        # whole bench — the driver must always get its one JSON line
        try:
            t_wall = time.time()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            timings[name] = round(time.perf_counter() - t0, 3)
            nc = _commits_since(t_wall)
            if nc:
                commits[name] = nc
            assert n >= 0
        except Exception as ex:  # noqa: BLE001
            errors[name] = f"{type(ex).__name__}: {str(ex)[:300]}"
        # no reset here: the next query's pre-timing reset (after its
        # warmup) is the one that protects ITS measurement; a second
        # full-gc per query only buys wall time (~150 ms × 190 queries)
    _reset_session_litter(spark)  # probes below start clean
    total = round(sum(timings.values()), 3)

    def _safe(fn, *args):
        try:
            return fn(*args)
        except Exception as ex:  # noqa: BLE001
            return {"error": f"{type(ex).__name__}: {str(ex)[:300]}"}

    # per-family subtotals (first registry tag = family): when the full
    # tier creeps toward its budget, this names the family to trim
    fam: dict[str, float] = {}
    for n, t in timings.items():
        tags = catalog.REGISTRY[n].tags
        f = tags[0] if tags else "untagged"
        fam[f] = round(fam.get(f, 0.0) + t, 3)

    report = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_families": dict(sorted(fam.items(), key=lambda kv: -kv[1])),
        "sf_scaling": _safe(sf_scaling_probe, spark),
        "merge_scaling": _safe(merge_scaling, spark, sf_dir),
        "small_merge": _safe(small_merge_bench, spark, sf_dir),
        "mor_delete": _safe(mor_delete_bench, spark, sf_dir),
        "rowgroup_codec_sweep": _safe(rowgroup_codec_sweep, sf_dir),
        "plan_scaling": _safe(plan_scaling, spark),
        "query_commits": commits,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpu_count": ncpu,
        "load_avg_start": [round(x, 2) for x in load_start],
        "n_processes_start": n_procs,
        "contended_at_start": contended,
    }
    try:
        report["load_avg_end"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        pass
    if errors:
        report["query_errors"] = errors

    # Budget guard (round-5 verdict #4): the full tier silently rotting
    # past the driver's timeout would lose the whole artifact. Record
    # the wall and FAIL LOUDLY (stderr + report flag) past the budget
    # so the next run trims a family instead of timing out.
    wall = round(time.perf_counter() - t_run_start, 1)
    report["bench_wall_s"] = wall
    if full and wall > FULL_TIER_BUDGET_S:
        report["budget_exceeded"] = True
        print(
            f"BENCH BUDGET EXCEEDED: full tier took {wall}s"
            f" > {FULL_TIER_BUDGET_S}s — trim the slowest families: "
            + ", ".join(f"{k}={v}s" for k, v in
                        list(sorted(fam.items(), key=lambda kv: -kv[1]))[:5]),
            file=sys.stderr,
        )
    # The driver's stdout capture is tail-limited (~2 KB): BENCH_r03 ran
    # clean but its 6.8 KB JSON line arrived truncated and unparseable.
    # Ship the full report to a file and print a compact (<1.5 KB)
    # summary as the FINAL stdout line.
    # headline runs must NOT clobber the committed full-tier artifact
    # (the round-5 driver's headline run replaced the 186-query
    # BENCH_FULL with a 76-query one) — each tier gets its own file
    report_name = "BENCH_FULL.json" if full else "BENCH_HEADLINE.json"
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             report_name)
    try:
        with open(full_path, "w") as f:
            json.dump(report, f, indent=1)
    except OSError:
        pass
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    compact = {
        "metric": report["metric"],
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "n_errors": len(errors),
        "queries": slowest,
        "merge_scaling": report["merge_scaling"],
        "small_merge": report["small_merge"],
        "mor_delete": report["mor_delete"],
        "sf": report["sf"],
        "load1": report["load_avg_start"][0],
        "contended": contended,
        "full_report": report_name,
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1500:  # hard guarantee: drop detail until it fits
        for key in ("small_merge", "mor_delete", "queries", "merge_scaling"):
            compact.pop(key, None)
            line = json.dumps(compact, separators=(",", ":"))
            if len(line) <= 1500:
                break
    print(line)
    spark.stop()


def plan_scaling(spark) -> dict:
    """The O(F log K) dirty-planning claim pinned with a number: build
    synthetic manifests (entries only — no data files exist) of 100 /
    1k / 10k entries and time ``plan_dirty_files`` plus the bucket-cut
    derivation against a fixed 10k-key mutation batch. The cost is two
    binary searches per file over the sorted key set, so the curve
    should grow ~linearly in F with a small constant (the 10k-file cell
    exercising the same driver arithmetic a 100 TB manifest would) —
    NOT with the key count or any data volume."""
    import numpy as np

    from parquet_rewriter_spark.operators.merge import (
        _np_bounds,
        plan_dirty_files,
    )
    from parquet_rewriter_spark.table import Manifest, ManifestEntry

    from pyspark.sql import functions as F

    span = 10_000_000
    muts = spark.range(10_000).select(
        ((F.col("id") * 977_777) % span).alias("k")
    )
    muts.persist().count()  # planning cost only, not batch synthesis
    out: dict[str, float] = {}
    try:
        for nf in (100, 1_000, 10_000):
            rows_per = span // nf
            m = Manifest(
                version=0,
                key="k",
                files=[
                    ManifestEntry(
                        name=f"f{i:06d}.parquet", rows=rows_per,
                        bytes=rows_per * 100,
                        key_min=i * rows_per,
                        key_max=(i + 1) * rows_per - 1,
                    )
                    for i in range(nf)
                ],
            )
            el = 0.0
            dirty: list = []
            for timed in (False, True):  # warm the probe's plan shape
                t0 = time.perf_counter()
                dirty, _clean = plan_dirty_files(spark, m, muts)
                el = time.perf_counter() - t0
            out[f"files_{nf}_ms"] = round(el * 1000, 1)
            out[f"files_{nf}_dirty"] = len(dirty)
            t0 = time.perf_counter()
            cuts = np.sort(_np_bounds(spark, [e.key_max for e in dirty]))
            out[f"files_{nf}_cuts_ms"] = round(
                (time.perf_counter() - t0) * 1000, 2
            )
            assert len(cuts) == len(dirty)
    finally:
        muts.unpersist()
    return out


def sf_scaling_probe(spark) -> dict[str, dict[str, float]]:
    """Empirical scale-up curve: representative plan shapes timed at
    every available fixture scale (100× data span). The signal the
    100 TB story rests on: scan-agg and join walls should grow far
    slower than data (fixed job overhead amortizes out), and nothing
    should bend superlinearly. Each (query, sf) cell is warmed once at
    the smallest fixture and measured on its own."""
    shapes = [
        "pricing_summary",        # scan + pushdown filter + hash agg
        "revenue_by_nation",      # broadcast star join
        "top3_orders_per_customer",  # window rank per group
        "dedup_exact_docs",       # corpus-wide dedup shuffle
    ]
    sfs = [d for d in ("sf0.001", "sf0.01", "sf0.1")
           if os.path.isdir(f"/root/testdata/{d}")]
    out: dict[str, dict[str, float]] = {}
    for name in shapes:
        if name not in catalog.REGISTRY:
            continue
        fn = catalog.REGISTRY[name].fn
        row: dict[str, float] = {}
        for sf in sfs:
            path = f"/root/testdata/{sf}"
            try:
                fn(spark, path).count()  # warm plan + page cache
                t0 = time.perf_counter()
                fn(spark, path).count()
                row[sf] = round(time.perf_counter() - t0, 3)
            except Exception:  # noqa: BLE001
                row[sf] = -1.0
        _reset_session_litter(spark)
        out[name] = row
    return out


def merge_scaling(spark, sf_dir: str) -> dict[str, float]:
    """BASELINE.md operative target: merge cost must scale with the
    DIRTY FRACTION of the table, not table size (reference README:109-111
    — 10% dirty ≪ full rewrite, 50% dirty ≈ ½ full rewrite).

    The fixture lineitem alone (~600k rows at sf0.1) rewrites in well
    under a second on 32 cores — every fraction bottoms out on the same
    fixed per-job cost and the contract can't be observed. The bench
    therefore measures over an 8× key-shifted inflation of lineitem
    (~5M rows, ~80 files of 64k rows) so per-file rewrite work, not
    job overhead, dominates; the base table is created ONCE and cloned
    per fraction with a directory copy (a SortedTable is self-contained
    under its path)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from parquet_rewriter_spark.operators.merge import merge_into_table
    from parquet_rewriter_spark.sources.readers import load_table
    from parquet_rewriter_spark.table import SortedTable

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "li_key", F.col("l_orderkey") * 10 + F.col("l_linenumber")
    )
    max_key = int(li.agg(F.max("li_key")).first()[0])
    span = max_key + 10
    # 8 key-shifted copies — same schema/distribution, 8× the rows
    li8 = (
        li.withColumn("__rep", F.explode(F.array(*[F.lit(i) for i in range(8)])))
        .withColumn("li_key", F.col("li_key") + F.col("__rep") * F.lit(span))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__rep") * F.lit((span // 10) + 1))
        .drop("__rep")
    )
    max8 = span * 8

    out: dict[str, float] = {}
    base = tempfile.mkdtemp(prefix="prs_bench_merge_base_")
    try:
        SortedTable.create(spark, base, li8, key="li_key",
                           max_records_per_file=65_536)

        # untimed warmup merge on a throwaway clone: compile the plan
        # shapes (planning probe, union+window merge, range write) so
        # the timed loop measures merge work, not first-run codegen
        wd = tempfile.mkdtemp(prefix="prs_bench_merge_warm_")
        try:
            shutil.rmtree(wd, ignore_errors=True)
            shutil.copytree(base, wd)
            wt = SortedTable(spark, wd)
            # small-key-set merge: warms the driver-side planning path +
            # the union/window/range-write shapes
            merge_into_table(
                wt,
                li8.filter(
                    (F.col("li_key") <= int(max8 * 0.3))
                    & (F.col("l_orderkey") % 40 == 0)
                ).withColumn("l_extendedprice", F.lit(0.0)),
            )
            # large-key-set merge: warms the DISTRIBUTED planning pass
            # (mapInPandas searchsorted), which full_rewrite-scale
            # mutation batches take — without this, the full case pays
            # that plan's one-time codegen inside its timed window
            merge_into_table(
                wt,
                li8.filter(F.col("l_orderkey") % 20 == 0)
                .withColumn("l_extendedprice", F.lit(0.0)),
            )
        finally:
            shutil.rmtree(wd, ignore_errors=True)

        for label, frac in [("dirty_1pct", 0.01), ("dirty_10pct", 0.10),
                            ("dirty_50pct", 0.50), ("full_rewrite", 1.0)]:
            d = tempfile.mkdtemp(prefix=f"prs_bench_merge_{label}_")
            md = tempfile.mkdtemp(prefix=f"prs_bench_merge_muts_{label}_")
            try:
                # mutations: every 20th order within the leading `frac`
                # of the key space — clustered, so ~frac of files go dirty.
                # MATERIALIZED to parquet before the timed window: the
                # reference's merge consumes an already-materialized
                # record stream (ParquetRewriter takes an iterator over
                # concrete records), so timing the synthesis of the
                # mutation batch (a full lineitem scan + 8-way explode
                # re-executed by the planning pass AND the merge itself)
                # would charge the merge for work the caller did — at
                # every fraction it adds the same fixed cost, flattening
                # the dirty-fraction curve the BASELINE contract grades.
                (
                    li8.filter(
                        (F.col("li_key") <= int(max8 * frac))
                        & (F.col("l_orderkey") % 20 == 0)
                    )
                    .withColumn("l_extendedprice", F.lit(0.0))
                    .write.mode("overwrite").parquet(md)
                )
                muts = spark.read.parquet(md)
                # allow_splice=False: the 1%-dirty case would otherwise
                # take the driver-side pyarrow splice fast path — a
                # different code path benchmarked on its own in
                # small_merge. The scaling curve compares the SAME
                # distributed merge across dirty fractions.
                # BEST OF 3 on a fresh clone each rep: single-shot merge
                # walltimes swing ~20% run-to-run on a shared machine,
                # and the dirty-fraction RATIO is the graded contract —
                # min-of-3 keeps the curve a property of the engine, not
                # of scheduler noise.
                best = None
                stats = None
                for _rep in range(3):
                    shutil.rmtree(d, ignore_errors=True)
                    shutil.copytree(base, d)
                    t = SortedTable(spark, d)
                    t0 = time.perf_counter()
                    st = merge_into_table(t, muts, allow_splice=False)
                    el = time.perf_counter() - t0
                    if best is None or el < best:
                        best, stats = el, st
                out[label] = round(best, 3)
                out[f"{label}_files_rewritten"] = stats["files_written"]
                out[f"{label}_files_passthrough"] = stats["files_clean_passthrough"]
                out[f"{label}_plan_s"] = round(stats.get("t_plan_s", 0), 3)
                out[f"{label}_write_s"] = round(stats.get("t_write_s", 0), 3)
            finally:
                shutil.rmtree(d, ignore_errors=True)
                shutil.rmtree(md, ignore_errors=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def mor_delete_bench(spark, sf_dir: str) -> dict[str, float]:
    """Merge-on-read vs copy-on-write delete cost: tombstone 0.5% of
    lineitem's keys (spread across EVERY file, the worst case for
    zone-map pruning — a CoW delete must rewrite the whole table) and
    compare wall time + files rewritten. The DV path's write volume is
    the tombstone keys themselves; the CoW path rewrites every dirty
    file. Also times the read-side overhead the tombstones add, and the
    materialize step that pays the deferred rewrite."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from parquet_rewriter_spark.operators.deletion_vectors import (
        delete_keys_mor,
        materialize_deletes,
    )
    from parquet_rewriter_spark.operators.merge import OP_COLUMN, OP_DELETE, merge_into_table
    from parquet_rewriter_spark.sources.readers import load_table
    from parquet_rewriter_spark.table import SortedTable

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "li_key", F.col("l_orderkey") * 10 + F.col("l_linenumber")
    )
    victims = li.filter(F.col("l_orderkey") % 200 == 0).select("li_key")
    out: dict[str, float] = {}

    for label, timed in [("warm", False), ("timed", True)]:
        d_mor = tempfile.mkdtemp(prefix="prs_bench_mor_")
        d_cow = tempfile.mkdtemp(prefix="prs_bench_cow_")
        try:
            t_mor = SortedTable.create(spark, d_mor, li, key="li_key",
                                       max_records_per_file=8_000)
            t_cow = SortedTable.create(spark, d_cow, li, key="li_key",
                                       max_records_per_file=8_000)

            t0 = time.perf_counter()
            stats = delete_keys_mor(t_mor, victims)
            dv_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            n_live = t_mor.read().count()
            dv_read_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            mat = materialize_deletes(t_mor)
            mat_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            cow = merge_into_table(
                t_cow,
                victims.withColumnRenamed("li_key", "k")
                .join(li, F.col("k") == F.col("li_key"), "inner")
                .drop("k")
                .withColumn(OP_COLUMN, F.lit(OP_DELETE)),
                allow_splice=False,
            )
            cow_s = time.perf_counter() - t0
            if timed:
                out = {
                    "dv_delete": round(dv_s, 3),
                    "dv_rows": stats["dv_rows_added"],
                    "dv_files_rewritten": 0,
                    "dv_read_overhead_scan": round(dv_read_s, 3),
                    "rows_after": n_live,
                    "materialize": round(mat_s, 3),
                    "materialize_files_rewritten": mat["files_rewritten"],
                    "cow_delete": round(cow_s, 3),
                    "cow_files_rewritten": cow["files_written"],
                }
        finally:
            shutil.rmtree(d_mor, ignore_errors=True)
            shutil.rmtree(d_cow, ignore_errors=True)
    return out


def rowgroup_codec_sweep(sf_dir: str) -> dict[str, dict]:
    """Mirror of the reference's published micro-benchmark
    (BASELINE.md rows 3-5; README.md:90-101 + the three
    rowgroup_size/throughput graphs): single Parquet file, row-group
    size × codec swept, reporting file-size overhead and EFFECTIVE
    (uncompressed-bytes/sec) read + write throughput. The reference ran
    this single-threaded on one file; the faithful mirror is a
    driver-side pyarrow sweep, not a Spark job — the numbers answer the
    same storage-format question (where does row-group overhead flatten,
    which codec is CPU-bound) for OUR fixture corpus.

    Expected shape (the reference's findings to reproduce): file size
    flattens approaching ~10k rows/row-group; reads suffer at small row
    groups; gzip is the CPU-bound worst writer."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(sf_dir, "lineitem.parquet"))
    raw_mb = tbl.nbytes / 1e6
    out: dict[str, dict] = {"corpus_rows": tbl.num_rows, "raw_mb": round(raw_mb, 1)}
    d = tempfile.mkdtemp(prefix="prs_bench_rgsweep_")
    try:
        for codec in ("snappy", "zstd", "gzip"):
            for rg in (1_000, 10_000, 100_000):
                path = os.path.join(d, f"{codec}_{rg}.parquet")
                for timed in (False, True):  # first pass warms page cache/JIT
                    t0 = time.perf_counter()
                    pq.write_table(tbl, path, row_group_size=rg, compression=codec)
                    w_s = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    pq.read_table(path)
                    r_s = time.perf_counter() - t0
                out[f"{codec}_rg{rg}"] = {
                    "file_mb": round(os.path.getsize(path) / 1e6, 2),
                    "write_mb_s": round(raw_mb / w_s, 1),
                    "read_mb_s": round(raw_mb / r_s, 1),
                }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def small_merge_bench(spark, sf_dir: str) -> dict[str, float]:
    """The reference's headline trick, measured: a 1-row upsert against
    a multi-row-group file. The row-group splice path (no Spark job,
    only the touched row group merged) vs the distributed path (full
    part-file rewrite through a shuffle job)."""
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_rewriter_spark.operators.merge import merge_into_table
    from parquet_rewriter_spark.table import Manifest, ManifestEntry, SortedTable

    n, rg = 200_000, 10_000  # reference row-group size (README.md:94)
    tbl = pa.table({
        "key": pa.array(range(n), pa.int64()),
        "value": pa.array([i * 3 for i in range(n)], pa.int64()),
    })
    out: dict[str, float] = {}
    for label, allow in [("splice_1row", True), ("distributed_1row", False)]:
        for timed in (False, True):  # first pass warms the plan shapes
            d = tempfile.mkdtemp(prefix=f"prs_bench_{label}_")
            try:
                fname = "part-base.parquet"
                pq.write_table(tbl, os.path.join(d, fname), row_group_size=rg)
                t = SortedTable(spark, d)
                t._commit_manifest(Manifest(
                    version=0, key="key",
                    files=[ManifestEntry(
                        name=fname, rows=n,
                        bytes=os.path.getsize(os.path.join(d, fname)),
                        key_min=0, key_max=n - 1,
                    )],
                    schema_json=spark.read.parquet(os.path.join(d, fname)).schema.json(),
                ))
                muts = spark.createDataFrame(
                    [(n // 2, -1, "UPSERT")], "key long, value long, op string"
                )
                t0 = time.perf_counter()
                stats = merge_into_table(t, muts, allow_splice=allow)
                if timed:
                    out[label] = round(time.perf_counter() - t0, 3)
                    if allow:
                        out["splice_rgs_rewritten"] = stats.get("rgs_rewritten", -1)
                        out["splice_rgs_copied"] = stats.get("rgs_copied", -1)
                        out["splice_raw_files"] = stats.get("files_raw_appended", 0)
                        assert stats["path"] == "rowgroup_splice", stats
            finally:
                shutil.rmtree(d, ignore_errors=True)
    return out


if __name__ == "__main__":
    main()
