"""Catalog-wide single-partition funnel audit.

Builds every registered query's physical plan at sf0.001 and flags
``Exchange SinglePartition`` occurrences. Every flagged query must be on
the SANCTIONED list below — each entry names WHY its single-partition
exchange is not a data funnel (a 1-row scalar reduce, a dim-bounded
window, a bounded top-k). A query appearing here that is NOT sanctioned
(or a sanctioned query whose count grew) exits nonzero — the same
contract as the per-query shuffle budgets in tests/test_plans.py, but
catalog-wide, so a future query can't reintroduce the r5 vocab-sort /
q177-harness class of funnel unnoticed.

Run:  python tools/funnel_audit.py          (~3-4 min; not a unit test
because it compiles 195 plans — wire it into round-end validation next
to tools/plans.py)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# query -> (max SinglePartition exchanges, reason)
SANCTIONED: dict[str, tuple[int, str]] = {
    "q06_revenue_forecast": (1, "1-row scalar forecast reduce"),
    "q15_above_avg_parts": (2, "1-row global avg, twice (subquery + oracle-shaped reuse)"),
    "q21_customer_balance_ranks": (1, "dim-sized ranking window, documented 'NOT for fact tables'"),
    "q36_cume_nth": (1, "dim-sized window, same note as q21"),
    "q44_intersect_except_all": (2, "set-op result is segment-bounded; final 1-row-ish reduces"),
    "q61_promo_revenue_share": (1, "1-row global share denominator"),
    "q63_small_qty_revenue": (1, "1-row scalar"),
    "q64_disjunctive_filter": (1, "1-row scalar"),
    "q67_dormant_rich_customers": (1, "1-row scalar threshold"),
    "q76_quality_report": (1, "1-row corpus report"),
    "q98_event_funnel": (1, "funnel-stage counts: |stages| rows"),
    "q101_hll_partial_union": (1, "register-merge reduce: 2^p rows"),
    "q104_referential_integrity": (3, "per-constraint 1-row verdicts"),
    "q18_approx_distinct": (1, "1-row approx-distinct reduce"),
    "q126_token_budget": (1, "|sources|-row Pareto window"),
    "q146_bm25_topk": (1, "corpus-stats 1-row scalar"),
    "q148_domain_mixture": (1, "O(#domains) normalizing window"),
    "q149_bigram_surprisal": (1, "1-row vocab scalar"),
    "q156_nation_trade_pagerank": (5, "per-iteration 1-row node-count scalars (4 iters + init)"),
    "q169_basket_brand_lift": (1, "1-row n_orders broadcast"),
    "q170_pmi_collocations": (2, "1-row unigram/bigram totals"),
    "q173_expectations_report": (3, "per-rule-family 1-row verdicts"),
    "q174_funnel_time_percentiles": (2, "1-row percentile reduces"),
    "q177_ranking_metrics": (1, "final 1-row metrics reduce (k-row input)"),
    "q196_target_encoding": (1, "1-row global-mean broadcast"),
    "q205_cuped_ab_lift": (1, "1-row pooled theta broadcast"),
    "q206_neyman_allocation": (1, "1-row denominator broadcast"),
    "q207_waterfill_budget": (3, "|domains|-row waterfill windows + 1-row level/total reduces"),
    "q208_vocab_growth": (1, "|batches|-row cumulative window"),
    "q214_cusum_changepoint": (2, "|days|-row CUSUM walk + |days|-row peak window, both over the bounded day table"),
    "q216_ewma_daily_value": (1, "|days|-row truncated-weight EWMA window"),
    "q217_dsir_scores": (1, "1-row corpus-totals broadcast (vocab size + token counts)"),
    "q218_rrf_hybrid_search": (1, "two 20-row rerank-head ranking windows (q176 economics) sharing one exchange"),
    "q219_theil_sen_trend": (6, "|days|-grain min window + days^2 bounded pair join + three 1-row median/count reduces"),
    "q226_seasonal_dow_profile": (1, "1-row grand-mean reduce broadcast over the 7-row dow table"),
    "q227_mann_whitney_u": (1, "1-row test-statistic reduce; the rank prefix itself is the q171 range-partition recipe, never a global window"),
    "q228_chi_square_independence": (2, "1-row grand-total reduce + 1-row statistic reduce over <= 18 contingency cells"),
    "q220_benford_audit": (1, "9-row digit-table share/chi2 windows"),
    "q221_kaplan_meier": (2, "1-row cutoff reduce + bounded distinct-duration table windows"),
    "q232_rfm_segments": (3, "1-row max-date reduce + 1-row 9-value exact-percentile reduce over the customer-grain table (broadcast back; deliberately NOT a global NTILE sort)"),
    "q234_source_js_divergence": (1, "1-row corpus-token-total reduce (q217's shape)"),
    "q237_revenue_acf": (2, "1-row mean + 1-row denominator reduces over the bounded |days| table"),
    "q240_psi_price_drift": (3, "1-row reference-decile reduce + 1-row totals reduce over the 10-bin table (+1 plan-shared)"),
    "q243_sprt_sequential": (1, "|days|-row cumulative-LLR window over the bounded day grain"),
}


def main() -> int:
    from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES
    from _spark_multi_format_data_lake_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("funnel_audit")
    em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    bad: list[str] = []
    for name, q in QUERIES.items():
        try:
            plan = q.fn(spark, sf_dir)._jdf.queryExecution().explainString(em)
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: plan build failed: {str(e)[:80]}")
            continue
        n = plan.count("Exchange SinglePartition")
        if n == 0:
            continue
        cap = SANCTIONED.get(name)
        if cap is None:
            bad.append(f"{name}: {n} UNSANCTIONED single-partition exchange(s)")
        elif n > cap[0]:
            bad.append(f"{name}: grew to {n} (sanctioned {cap[0]}: {cap[1]})")
    spark.stop()
    if bad:
        print("FUNNEL AUDIT FAILED")
        for b in bad:
            print(" ", b)
        return 1
    print(f"funnel audit clean: {len(SANCTIONED)} sanctioned, 0 unsanctioned")
    return 0


if __name__ == "__main__":
    sys.exit(main())
