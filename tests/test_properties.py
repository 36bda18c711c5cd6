"""Property-based spot checks (SURVEY.md §5 item 4) with hypothesis:
merge idempotency, union-by-name alignment, dedup count conservation."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from _spark_multi_format_data_lake_pipeline_spark.llm.dedup import exact_dedup_keepers

TEXTS = st.lists(
    st.text(alphabet="abcde ", min_size=0, max_size=12), min_size=1, max_size=25
)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(texts=TEXTS)
@_SETTINGS
def test_dedup_conserves_counts(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    out = exact_dedup_keepers(df, "doc_id", "text").collect()
    # copies sum to input size; keepers are distinct; keeper ids exist
    assert sum(r.n_copies for r in out) == len(texts)
    assert len({r.content_sha256 for r in out}) == len(out)
    assert len(out) == len(set(texts))
    ids = set(range(len(texts)))
    assert all(r.doc_id in ids for r in out)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 100), st.text(alphabet="xyz", max_size=4)),
        min_size=0,
        max_size=10,
    )
)
@_SETTINGS
def test_union_by_name_alignment(spark, rows):
    a = spark.createDataFrame(rows or [(0, "")], "num int, s string")
    # same data, columns swapped — unionByName must realign
    b = a.select("s", "num")
    u = a.unionByName(b)
    assert u.count() == 2 * a.count()
    assert sorted(map(tuple, u.collect())) == sorted(
        list(map(tuple, a.collect())) + [(r.num, r.s) for r in b.collect()]
    )


@given(
    base=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=1, max_size=8
    ),
    update=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=1, max_size=8
    ),
)
@_SETTINGS
def test_merge_upsert_idempotent_antijoin(spark, base, update):
    """merge(merge(t, u), u) == merge(t, u) for the anti-join upsert,
    expressed on DataFrames directly (no catalog round-trip per example)."""
    from pyspark.sql import functions as F

    # dedup keys within each batch (merge semantics assume unique source keys)
    def mk(rows):
        df = spark.createDataFrame(rows, "id int, v int")
        return df.groupBy("id").agg(F.max("v").alias("v"))

    t, u = mk(base), mk(update)
    once = t.join(u, "id", "left_anti").unionByName(u)
    twice = once.join(u, "id", "left_anti").unionByName(u)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
