"""Benchmark harness: runs the headline query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a count() (forces the full plan without
driver-side collect overhead skewing results toward small outputs).

Each headline query runs twice: ``queries``/``value`` report the second
(steady-state) run — the component that scales with data volume — while
``cold_queries``/``cold_total`` report the first run, which at sf0.1 is
dominated by per-plan Catalyst analysis + whole-stage-codegen compilation
(a fixed ~1-3 s per distinct plan that is identical at sf0.1 and at
100 TB, where it amortizes to noise). Ingest probes run once, cold —
that IS the number BASELINE.md publishes for the reference.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The headline suite: one representative per operator family, weighted
# toward the fact-table (lineitem/orders/events) queries that dominate at
# 100 TB. Bounded-window pair queries (q53/q57) and the ANN probe are
# excluded: their cost is fixed by design, not SF-dependent.
HEADLINE = [
    "q01_pricing_summary",
    "q02_brand_revenue",
    "q03_shipping_priority",
    "q04_order_priority_semi",
    "q05_nation_volume",
    "q06_revenue_forecast",
    "q07_customer_order_stats",
    "q09_repeat_orders_30d",
    "q10_asof_prev_purchase",
    "q11_distinct_suppliers",
    "q20_top3_orders_per_customer",
    "q22_running_customer_spend",
    "q40_props_json_extract",
    "q42_hourly_event_rollup",
    "q43_user_sessions",
    "q50_exact_dedup",
    "q51_text_stats",
    "q54_minhash_near_dup",
    "q56_topk_cosine",
    "q61_promo_revenue_share",
    "q77_pii_redaction",
    "q79_repetition_signals",
    "q80_boilerplate_line_dedup",
    "q81_bpe_token_counts",
    "q85_tfidf_top_terms",
    "q88_image_resize",
    "q96_curation_funnel",
    "q132_curation_prefix",
    "q133_exact_percentiles",
    "q134_epoch_shuffle",
    "q97_retention_cohorts",
    "q62_customer_distribution",
    "q63_small_qty_revenue",
    "q65_returned_item_customers",
    "q105_json_export",
    "q106_balanced_lang_sample",
    "q107_winsorized_values",
    "q109_mad_outliers",
    "q120_inverted_index",
    "q121_weighted_sample",
    "q122_column_profile",
    "q124_lang_drift",
    "q139_bmp_decode_twin",
    "q144_leakage_safe_split",
    "q146_bm25_topk",
    "q147_duplicate_spans",
    "q149_bigram_surprisal",
    "q152_daily_gap_fill",
    "q154_dau_wau_stickiness",
    "q155_token_entropy",
    "q156_nation_trade_pagerank",
    "q158_event_transition_matrix",
    "q159_trade_clustering_coeff",
    "q166_prefix_filter_neardup",
    "q167_groups_frame_rolling",
    "q168_activity_streaks",
    "q169_basket_brand_lift",
    "q170_pmi_collocations",
    "q171_weighted_median",
    "q173_expectations_report",
    "q174_funnel_time_percentiles",
    "q177_ranking_metrics",
    "q179_table_diff",
    "q180_merged_activity_spans",
    "q181_attribution_linear",
    # r6 additions (fact-sized inputs only; dim-sized rows like q183/
    # q184/q191/q196 are excluded — their cost is fixed by design)
    "q185_global_busy_spans",
    "q186_packing_offsets",
    "q187_scd2_user_state",
    "q188_fuzzy_part_names",
    "q193_decontamination",
    "q194_point_in_time_state",
    "q197_partition_checksums",
    # super-linear-risk tail: iterative / join-heavy pipelines whose cost
    # could regress quietly if left unbenched
    "q75_dedup_groups",
    "q87_incremental_dedup",
    "q93_fuzzy_type_pairs",
    "q99_recursive_hierarchy",
    # r7 additions (corpus-sized: gram-position stream / corpus word
    # explode; q210's vocab encode and q212's planted window are
    # fixed-size by design and excluded)
    "q209_duplicate_span_cuts",
    "q211_bpe_token_counts",
    # r8 additions: lakehouse row-level verbs — each builds, mutates and
    # re-reads a real versioned table at SF scale, so the copy-on-write
    # write path itself is under the bench clock
    "q222_versioned_upsert_changes",
    "q223_versioned_delete_rows",
    "q224_versioned_partition_read",
    "q225_short_span_hot_cuts",
    "q226_seasonal_dow_profile",
    "q227_mann_whitney_u",
    "q228_chi_square_independence",
    "q229_versioned_apply_cdc_state",
    "q230_versioned_history_audit",
    # r8 wave 3: merge-on-read + bucket-layout verbs (again full
    # build→mutate→read pipelines at SF scale) and the fact-sized
    # analytics rows (orders/lineitem groupBys, corpus word explode)
    "q231_versioned_dv_delete",
    "q232_rfm_segments",
    "q233_grouped_ols",
    "q234_source_js_divergence",
    "q235_dataset_split",
    "q236_versioned_bucket_lookup",
    "q237_revenue_acf",
    "q238_wilson_ci",
    "q239_versioned_bloom_lookup",
    "q240_psi_price_drift",
    "q241_versioned_clone_upsert",
    "q243_sprt_sequential",
    "q244_versioned_conditional_merge",
    "q245_versioned_bloom_multi_lookup",
    "q246_versioned_compact_dv_zorder",
    "q247_versioned_rollback_append",
    "q248_versioned_branch_isolation",
    "q249_versioned_constraint_gate",
    "q250_versioned_deep_clone_export",
    "q251_versioned_tag_retention",
    "q252_versioned_timetravel_asof",
    "q253_versioned_update_rows",
    "q254_versioned_partition_evolution",
    "q255_versioned_type_widening",
    "q256_versioned_generated_partition",
    "q257_versioned_merge_by_source",
    "q258_versioned_column_rename",
    "q259_versioned_drop_readd_column",
    "q260_versioned_identity_column",
    "q261_versioned_merge_schema_evolution",
    "q262_versioned_zorder_multidim_prune",
    "q263_versioned_null_count_prune",
    "q264_versioned_incremental_compact",
    "q265_versioned_concurrent_append_delete",
    "q266_versioned_stream_rate_limited",
    "q267_versioned_metadata_aggregates",
    "q268_versioned_branch_merge_back",
    "q269_versioned_generated_pruning",
    "q270_versioned_clustered_table",
    "q271_versioned_parquet_checkpoint",
    "q272_versioned_branch_merge_diverged",
    "q273_versioned_add_column_default",
    "q274_versioned_not_null",
    "q275_versioned_stream_drain",
    "q276_versioned_change_feed",
    "q277_versioned_stream_change_feed",
    "q278_versioned_ndv_registers",
    "q279_versioned_row_tracking",
    "q280_versioned_merge_cdf_row_tracking",
    "q281_versioned_feed_time_bounds",
    "q282_versioned_concurrent_disjoint_upserts",
    "q283_versioned_point_in_time_merge",
    "q284_versioned_named_merge",
    "q285_versioned_cdc_replication",
    "q286_versioned_branch_feed",
    "q287_versioned_database_replication",
    "q288_versioned_named_stream_landing",
    "q289_versioned_batch_drain",
]


def _ingest_benchmarks(spark) -> dict[str, float]:
    """Generate the reference's benchmark workloads (BASELINE.md: 25 MB /
    50k-row / 4450-col CSV ~15s; multi-line JSON ~2s; 5 MB / 100k-row
    parquet ~3s; 1 MB / 10k-line text ~1s) and time our readers on them."""
    import csv
    import json as jsonlib
    import shutil
    import tempfile
    from pathlib import Path

    from _spark_multi_format_data_lake_pipeline_spark.sources import readers

    base = Path(tempfile.mkdtemp(prefix="bench_ingest_"))
    out: dict[str, float] = {}
    try:
        # wide CSV: 4450 cols x enough rows for ~25 MB
        wide = base / "wide.csv"
        n_cols, n_rows = 4450, 1000
        header = [f"c{i}" for i in range(n_cols)]
        with open(wide, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(header)
            row = [f"v{i % 97}" for i in range(n_cols)]
            for _ in range(n_rows):
                w.writerow(row)
        # scale rows until ~25 MB
        sz = wide.stat().st_size
        reps = max(1, int(25_000_000 / sz))
        with open(wide, "a", newline="") as f:
            w = csv.writer(f)
            for _ in range((reps - 1) * n_rows):
                w.writerow(row)
        t0 = time.time()
        h = readers.read_csv(spark, wide)
        assert h is not None and h.col_count == n_cols
        out["ingest_csv_wide_25mb"] = round(time.time() - t0, 3)

        # multi-line JSON (array of nested objects)
        j = base / "nested.json"
        j.write_text(
            jsonlib.dumps(
                [
                    {
                        "id": i,
                        "name": f"row{i}",
                        "tags": ["a", "b", "c"],
                        "details": [{"name": "x", "url": f"u{i}"}],
                    }
                    for i in range(2000)
                ]
            )
        )
        t0 = time.time()
        h = readers.read_json(spark, j)
        assert h is not None
        out["ingest_json_multiline"] = round(time.time() - t0, 3)

        # typed parquet: 100k rows x 20 cols
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq
        import pyarrow as pa

        rng = np.random.default_rng(42)
        pdf = pd.DataFrame(
            {f"d{i}": rng.random(100_000) for i in range(18)}
            | {"k": rng.integers(0, 1000, 100_000), "s": ["x"] * 100_000}
        )
        pfile = base / "typed.parquet"
        pq.write_table(pa.Table.from_pandas(pdf), pfile)
        t0 = time.time()
        h = readers.read_parquet(spark, pfile)
        assert h is not None and h.row_count == 100_000
        out["ingest_parquet_100k"] = round(time.time() - t0, 3)

        # line text ~1 MB / 10k lines
        txt = base / "lines.txt"
        txt.write_text("\n".join(f"line {i} " + "x" * 90 for i in range(10_000)))
        t0 = time.time()
        h = readers.read_text(spark, txt)
        assert h is not None and h.row_count == 10_000
        out["ingest_text_10k_lines"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def _host_probe() -> dict[str, float]:
    """Fixed deterministic CPU workloads timed on the bare host.

    The recorded suite totals stepped ~1.2x between two rounds with
    byte-identical code, data, and plans; an A/B rerun of the old
    checkout on the new host state reproduced the inflation exactly
    (SCALING.md "Bench host variance, root-caused"). These two numbers
    — single-thread interpreter speed and threaded BLAS throughput —
    let any consumer of BENCH_r{N}.json normalize suite totals across
    rounds instead of re-litigating host drift per query.
    """
    import numpy as np

    t0 = time.time()
    acc = 0
    for i in range(5_000_000):
        acc += i * i
    py_ms = (time.time() - t0) * 1e3
    a = np.full((1024, 1024), 1.0002)
    t0 = time.time()
    for _ in range(5):
        a = np.clip(a @ a, 0.5, 1.5)
    np_ms = (time.time() - t0) * 1e3
    return {"py_loop_ms": round(py_ms, 1), "np_matmul_ms": round(np_ms, 1)}


def _spark_probe(spark) -> dict[str, float]:
    """Fixed Spark workload timed in the SAME session as the suite — a
    codegen scan + hash-aggregate shuffle over synthetic range data
    (no files, no catalog queries).  The r13 post-round run showed the
    bare-host probe can move OPPOSITE to Spark throughput (the probe
    measures Python/BLAS, the suite measures JVM+shuffle+disk), turning
    host weather into fake normalized regressions.  This probe shares
    the suite's whole execution stack, so its ratio across rounds is
    the better deflator; both are recorded, consumers can compare."""
    from pyspark.sql import functions as F

    def run(n):
        (
            spark.range(0, n, 1, 32)
            .select(
                (F.col("id") % 9973).alias("k"),
                (F.col("id") * 2654435761 % 2147483647).alias("v"),
            )
            .groupBy("k")
            .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
            .agg(F.sum("s"), F.sum("c"))
            .collect()
        )

    run(5_000_000)  # warm the specific codegen paths
    t0 = time.time()
    run(50_000_000)
    return {"spark_shuffle_ms": round((time.time() - t0) * 1e3, 1)}


def _round_number(repo: str) -> int:
    """This run's round: one past the newest driver-recorded BENCH_r{N}
    file (the driver writes BENCH_r{N}.json at round END, so during
    round N only r1..N-1 exist)."""
    import glob
    import re

    rs = [
        int(m.group(1))
        for f in glob.glob(os.path.join(repo, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", f))
    ]
    return (max(rs) + 1) if rs else 1


def _prev_round_detail(repo: str, rnd: int) -> dict | None:
    """The drift-triage baseline: the newest archived per-round detail
    (``BENCH_DETAIL_r{K}.json``, K < rnd).  Archives are written by this
    script stamped with their round, so a mid-round rerun can only
    overwrite ITS OWN round's archive — never the baseline — which is
    the bug BENCH_r12's vs_prev_round had (it compared against whatever
    mutable BENCH_DETAIL.json a loaded-host rerun left on disk and
    published a phantom 1.433x regression; the true r12-vs-r11 ratio
    was 0.927).  Falls back to the committed BENCH_DETAIL.json for
    pre-archive history, refusing same-round copies by their stamp."""
    import glob
    import re
    import subprocess

    best: tuple[int, str] | None = None
    for f in glob.glob(os.path.join(repo, "BENCH_DETAIL_r*.json")):
        m = re.search(r"BENCH_DETAIL_r(\d+)\.json$", f)
        if m and int(m.group(1)) < rnd:
            if best is None or int(m.group(1)) > best[0]:
                best = (int(m.group(1)), f)
    if best is not None:
        with open(best[1]) as fh:
            return json.load(fh)
    try:
        out = subprocess.run(
            ["git", "-C", repo, "show", "HEAD:BENCH_DETAIL.json"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        prev = json.loads(out)
        if prev.get("round") is None or int(prev["round"]) < rnd:
            return prev
    except Exception:  # noqa: BLE001 - baseline is best-effort
        pass
    return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from _spark_multi_format_data_lake_pipeline_spark.session import get_spark
    from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES

    spark = get_spark("bench")
    # JVM/codegen warm-up on a tiny SF so headline timings measure the
    # queries, not classloading
    QUERIES["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        # A failing query must not kill the whole bench run: record the
        # error and keep going so the JSON line always gets printed.
        try:
            t0 = time.time()
            QUERIES[name].fn(spark, sf_dir).count()
            cold[name] = round(time.time() - t0, 3)
            t0 = time.time()
            QUERIES[name].fn(spark, sf_dir).count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            # drop the cold timing too: cold_total and total must always
            # cover the same query set or partial runs read as speedups
            cold.pop(name, None)
            errors[name] = str(e).split("\n")[0][:200]

    # Ingest-throughput probes mirroring BASELINE.md's workloads (25 MB
    # wide CSV, multi-line JSON, typed parquet, line text) so the numbers
    # are directly comparable to the reference's published figures.
    try:
        timings.update(_ingest_benchmarks(spark))
    except Exception as e:  # noqa: BLE001
        errors["_ingest"] = str(e).split("\n")[0][:200]

    total = round(sum(timings.values()), 3)
    cold_total = round(sum(cold.values()), 3)
    ingest = {k: v for k, v in timings.items() if k.startswith("ingest_")}
    try:
        host_probe = _host_probe()
    except Exception:  # noqa: BLE001
        host_probe = {}
    try:
        host_probe.update(_spark_probe(spark))
    except Exception:  # noqa: BLE001
        pass
    # Round-over-round drift triage, automated: the baseline is the
    # newest PREVIOUS-round archived detail (never the mutable on-disk
    # copy a mid-round rerun may have overwritten).  The common-set
    # median ratio divided by the host-probe speed ratio separates code
    # regressions from host drift (the r8→r9 ~1.4x step was pure host —
    # SCALING.md "Bench host variance, root-caused"); a normalized
    # ratio near 1.0 means "same code speed, different host weather".
    repo = os.path.dirname(os.path.abspath(__file__))
    rnd = _round_number(repo)
    drift = {}
    try:
        prev = _prev_round_detail(repo, rnd)
        if prev is None:
            raise ValueError("no previous-round detail to compare against")
        if str(prev.get("sf")) != str(sf):
            raise ValueError("previous detail is a different SF")
        prev_q = prev.get("queries") or {}
        common = sorted(
            n
            for n, t in timings.items()
            if n in prev_q and prev_q[n] and t
        )
        if common:
            ratios = sorted(timings[n] / prev_q[n] for n in common)
            mid = len(ratios) // 2
            med = (
                ratios[mid]
                if len(ratios) % 2
                else (ratios[mid - 1] + ratios[mid]) / 2
            )
            pp = prev.get("host_probe") or {}
            probe_factor = None
            fs = [
                host_probe[k] / pp[k]
                for k in ("py_loop_ms", "np_matmul_ms")
                if host_probe.get(k) and pp.get(k)
            ]
            if fs:
                probe_factor = sum(fs) / len(fs)
            spark_factor = None
            if host_probe.get("spark_shuffle_ms") and pp.get(
                "spark_shuffle_ms"
            ):
                spark_factor = (
                    host_probe["spark_shuffle_ms"] / pp["spark_shuffle_ms"]
                )
            drift = {
                "baseline_round": prev.get("round"),
                "n_common": len(common),
                "common_set_median_ratio": round(med, 3),
                "host_probe_factor": (
                    round(probe_factor, 3) if probe_factor else None
                ),
                "normalized_ratio": (
                    round(med / probe_factor, 3) if probe_factor else None
                ),
                # the in-suite Spark calibration (shares the suite's JVM
                # + shuffle stack — see _spark_probe); preferred when
                # present, absent for pre-r14 baselines
                "spark_probe_factor": (
                    round(spark_factor, 3) if spark_factor else None
                ),
                "normalized_ratio_spark": (
                    round(med / spark_factor, 3) if spark_factor else None
                ),
            }
    except Exception:  # noqa: BLE001 - drift triage is best-effort
        drift = {}
    detail = {
        "round": rnd,
        "host_probe": host_probe,
        "vs_prev_round": drift,
        "metric": "headline_suite_seconds_detail",
        "value": total if not errors else None,
        "unit": "sec",
        "complete": not errors,
        "queries": timings,
        "cold_queries": cold,
        "cold_total": cold_total if not errors else None,
        "errors": errors,
        "sf": sf,
    }
    # Per-query dicts go to a side file + an EARLIER stdout line; the
    # LAST line stays compact. The driver's tail capture truncated the
    # single giant JSON line two rounds running (BENCH_r04/r05 both
    # recorded "parsed": null, silently dropping the steady timings and
    # every ingest number the BASELINE comparison needs — r5 VERDICT).
    # `queries` on the final line carries only the 4 ingest probes, so
    # the driver contract shape ({"metric", "value", "unit", "queries",
    # "sf"}) still holds while the line stays a few hundred bytes.
    try:
        side = os.path.join(repo, "BENCH_DETAIL.json")
        with open(side, "w") as fh:
            json.dump(detail, fh, indent=1)
        # per-round archive: next round's drift baseline.  A mid-round
        # rerun overwrites only its OWN round's archive, so the
        # baseline (round < rnd) can never be poisoned by one.
        with open(
            os.path.join(repo, f"BENCH_DETAIL_r{rnd:02d}.json"), "w"
        ) as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        side = None
    print(json.dumps(detail))
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                # a partial total is not comparable to BASELINE — null it
                # out and let consumers look at `queries`/`errors` instead
                "value": total if not errors else None,
                "unit": "sec",
                "complete": not errors,
                "queries": ingest,
                "n_headline": len(timings) - len(ingest),
                "cold_total": cold_total if not errors else None,
                "n_errors": len(errors),
                "detail_file": side,
                "host_probe": host_probe,
                "vs_prev_round": drift,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
