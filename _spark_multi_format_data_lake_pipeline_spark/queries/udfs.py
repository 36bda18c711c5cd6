"""The Python-UDF surface (SURVEY.md §2 Part B 'UDF/UDAF/UDTF'): scalar
pandas UDF, grouped-aggregate pandas UDF, and a Python UDTF — each with a
deterministic contract so the DuckDB oracle can check the Arrow round-trip
value-exactly. Plus the remaining join/sort variants (right join, nulls
first/last)."""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..sources.lake import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q38 — right outer join + NULLS FIRST/LAST ordering
# ---------------------------------------------------------------------------

@register(
    "q38_right_join_nulls_order",
    oracle="""
    SELECT o.o_orderkey, c.c_name,
           ROUND(o.o_totalprice, 2) AS totalprice
    FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
    RIGHT JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_orderkey % 100 = 0
    ORDER BY c.c_name NULLS FIRST, o.o_orderkey
    """,
    doc="Right outer join (nulls on the left side) + explicit NULLS FIRST "
        "sort. Order-insensitive hash can't see the sort; the nulls are the "
        "point — non-rich customers' orders keep c_name NULL.",
)
def q38_right_join_nulls_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    od = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "right")
        .select(
            "o_orderkey",
            "c_name",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .orderBy(F.col("c_name").asc_nulls_first(), F.col("o_orderkey"))
    )


# ---------------------------------------------------------------------------
# q70 — scalar pandas UDF (Arrow-vectorized), deterministic math contract
# ---------------------------------------------------------------------------

@register(
    "q70_pandas_udf_quality",
    oracle="""
    SELECT doc_id,
           ROUND(1.0 / (1.0 + EXP(-(0.002 * n_chars - 3.0))), 6) AS quality
    FROM documents
    """,
    doc="Scalar pandas_udf: logistic quality score. Arrow-batched numpy on "
        "the Python side, EXP() on the oracle side — equal to 6 decimals "
        "because both are IEEE double.",
)
def q70_pandas_udf_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def quality(n_chars: pd.Series) -> pd.Series:
        import numpy as np

        return 1.0 / (1.0 + np.exp(-(0.002 * n_chars.astype("float64") - 3.0)))

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.round(quality("n_chars"), 6).alias("quality"))


# ---------------------------------------------------------------------------
# q71 — grouped-aggregate pandas UDF
# ---------------------------------------------------------------------------

@register(
    "q71_grouped_agg_pandas_udf",
    oracle="""
    SELECT lang,
           ROUND(SUM(n_chars * doc_id) / SUM(doc_id), 4) AS weighted_mean_chars
    FROM documents
    WHERE doc_id > 0
    GROUP BY lang
    """,
    doc="Grouped-aggregate pandas_udf (weighted mean) — a UDAF the built-in "
        "aggregates can't express directly as one function.",
)
def q71_grouped_agg_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def weighted_mean(chars: pd.Series, weights: pd.Series) -> float:
        return float((chars * weights).sum() / weights.sum())

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") > 0)
    return docs.groupBy("lang").agg(
        F.round(
            weighted_mean(
                F.col("n_chars").cast("double"), F.col("doc_id").cast("double")
            ),
            4,
        ).alias("weighted_mean_chars")
    )


# ---------------------------------------------------------------------------
# q72 — Python UDTF (table function)
# ---------------------------------------------------------------------------

@register(
    "q72_udtf_token_positions",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE doc_id < 20),
         flat AS (SELECT doc_id, unnest(toks) AS token,
                         unnest(range(0, len(toks)))::INT AS pos
                  FROM d)
    SELECT doc_id, token, pos FROM flat WHERE token <> ''
    """,
    doc="Python UDTF exploding text into (token, position) rows — the "
        "lateral-join table-function surface. Oracle: DuckDB parallel unnest "
        "(zips co-selected unnests).",
)
def q72_udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, pos int")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                if tok:
                    yield tok, i

    spark.udtf.register("tokenize", Tokenize)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM documents d, LATERAL tokenize(d.text) t
        WHERE d.doc_id < 20
        """
    )


# ---------------------------------------------------------------------------
# q127 — cogrouped applyInPandas (two-table grouped Arrow computation)
# ---------------------------------------------------------------------------

@register(
    "q127_cogroup_user_activity",
    oracle="""
    WITH e AS (SELECT user_id, COUNT(*) AS n_events
               FROM events GROUP BY user_id),
         o AS (SELECT o_custkey AS user_id, COUNT(*) AS n_orders
               FROM orders GROUP BY o_custkey)
    SELECT COALESCE(e.user_id, o.user_id) AS user_id,
           CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders
    FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
    """,
    doc="Cogroup surface: events and orders are co-shuffled by user key "
        "and each user's two Arrow batches meet in ONE pandas call — the "
        "primitive for per-entity cross-table Python logic that has no "
        "relational form (sequence alignment, per-user DTW, custom "
        "attribution). Here the per-group body is deliberately trivial "
        "(row counts) so the DuckDB oracle — a full outer join of two "
        "group-bys, exactly cogroup's join semantics — can value-check "
        "the Arrow round-trip. When the logic IS relationally "
        "expressible, prefer the join: cogroup pays two shuffles plus a "
        "per-group Python dispatch that no optimizer can fuse.",
)
def q127_cogroup_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id")
    )

    def stats(key, evs: pd.DataFrame, ords: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": [key[0]], "n_events": [len(evs)], "n_orders": [len(ords)]}
        )

    return (
        ev.groupBy("user_id")
        .cogroup(orders.groupBy("user_id"))
        .applyInPandas(
            stats, schema="user_id bigint, n_events bigint, n_orders bigint"
        )
    )


# ---------------------------------------------------------------------------
# q164 — mapInArrow (RecordBatch-level Python, no pandas materialization)
# ---------------------------------------------------------------------------

@register(
    "q164_mapinarrow_norms",
    oracle="""
    SELECT vec_id,
           label,
           ROUND(SQRT(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                              x -> x * x))), 4) AS l2_norm
    FROM embeddings
    """,
    doc="mapInArrow: the lowest-overhead Python hook — the UDF receives "
        "pyarrow RecordBatches directly (no pandas conversion, no index "
        "allocation, zero-copy into numpy) and computes per-vector L2 "
        "norms with one vectorized einsum per batch. Same Arrow transfer "
        "as mapInPandas (q60/q88) minus the pandas layer: the right API "
        "when the Python side is pure-numpy math over columnar data. "
        "Oracle recomputes the norm with DuckDB list lambdas at double "
        "precision, rounded to 4.",
)
def q164_mapinarrow_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    def norms(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import numpy as np

        for batch in batches:
            emb = batch.column("embedding")
            # FixedSizeList/List of float -> (n, dim) numpy without pandas.
            # flatten() (not .values) so a sliced batch's list offset is
            # honored — .values returns the UNsliced child buffer.
            flat = np.asarray(emb.flatten().to_numpy(zero_copy_only=False))
            n = len(batch)
            mat = flat.reshape(n, -1).astype("float64")
            l2 = np.sqrt(np.einsum("ij,ij->i", mat, mat))
            # parquet often hands label over dictionary-encoded; cast to
            # the plain types the declared schema promises
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("vec_id").cast(pa.int64()),
                    batch.column("label").cast(pa.int32()),
                    pa.array(np.round(l2, 4), type=pa.float64()),
                ],
                names=["vec_id", "label", "l2_norm"],
            )

    emb = _t(spark, sf_dir, "embeddings")
    return emb.mapInArrow(norms, schema="vec_id bigint, label int, l2_norm double")


# ---------------------------------------------------------------------------
# q165 — applyInArrow (grouped-map at the RecordBatch level)
# ---------------------------------------------------------------------------

@register(
    "q165_applyinarrow_label_stats",
    oracle="""
    WITH n AS (
        SELECT label,
               SQRT(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                            x -> x * x))) AS l2
        FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG(l2), 4) AS avg_norm,
           ROUND(MAX(l2) - MIN(l2), 4) AS norm_range
    FROM n GROUP BY label
    """,
    doc="applyInArrow: grouped-map where each label's vectors arrive as "
        "one pyarrow Table — the Arrow-native sibling of applyInPandas "
        "(q59). Per-group numpy reduces norms to (count, mean, range); "
        "only k rows return. Group sizes must fit an executor (same "
        "contract as every grouped-map); the label key here is "
        "low-cardinality with uniform sizes.",
)
def q165_applyinarrow_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    def stats(table: "pa.Table") -> "pa.Table":
        import numpy as np

        flat = np.asarray(
            table.column("embedding").combine_chunks().flatten().to_numpy(zero_copy_only=False)
        )
        n = table.num_rows
        mat = flat.reshape(n, -1).astype("float64")
        l2 = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        return pa.table(
            {
                "label": pa.array([table.column("label")[0].as_py()], type=pa.int32()),
                "n_vecs": pa.array([n], type=pa.int64()),
                "avg_norm": pa.array([round(float(l2.mean()), 4)], type=pa.float64()),
                "norm_range": pa.array(
                    [round(float(l2.max() - l2.min()), 4)], type=pa.float64()
                ),
            }
        )

    emb = _t(spark, sf_dir, "embeddings")
    return emb.groupBy("label").applyInArrow(
        stats, schema="label int, n_vecs bigint, avg_norm double, norm_range double"
    )
