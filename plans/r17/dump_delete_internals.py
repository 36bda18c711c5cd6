"""Dump the cow+CDF delete's internal plans (survivor write + feed) to
show how many candidate scans the commit runs: before r17 both frames
scan the candidate parquet files; after, a small-candidate delete pins
the candidate read and both frames show InMemoryTableScan over ONE
underlying scan.

Usage: python plans/r17/dump_delete_internals.py <repo> <tag>
"""

from __future__ import annotations

import io
import sys
import tempfile
from contextlib import redirect_stdout
from pathlib import Path

OUT = Path("/root/repo/plans/r17")


def main() -> None:
    repo, tag = sys.argv[1], sys.argv[2]
    sys.path.insert(0, repo)
    from _spark_multi_format_data_lake_pipeline_spark.session import get_spark
    import _spark_multi_format_data_lake_pipeline_spark.sinks.versioned as V

    spark = get_spark(f"delete_internals_{tag}")
    from pyspark.sql import functions as F

    buf = io.StringIO()
    real_snap, real_cdf = V._write_snapshot, V._write_cdf

    def snap_spy(df, *a, **kw):
        buf.write("== survivor/snapshot frame ==\n")
        with redirect_stdout(buf):
            df.explain("formatted")
        feed = kw.get("cdf_feed")
        if feed is not None and hasattr(feed, "explain"):
            buf.write("== cdf feed frame ==\n")
            with redirect_stdout(buf):
                feed.explain("formatted")
        return real_snap(df, *a, **kw)

    def cdf_spy(feed, *a, **kw):
        if not buf.getvalue().count("== cdf feed frame =="):
            buf.write("== cdf feed frame ==\n")
            with redirect_stdout(buf):
                feed.explain("formatted")
        return real_cdf(feed, *a, **kw)

    V._write_snapshot, V._write_cdf = snap_spy, cdf_spy

    t = tempfile.mkdtemp(prefix=f"del_int_{tag}_") + "/t"
    od = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_orderkey", "o_totalprice")
    )
    V._write_snapshot = real_snap  # table build: no spying
    V.versioned_write(od.repartitionByRange(4, "o_orderkey"), t)
    V.enable_change_data_feed(t)
    V._write_snapshot = snap_spy
    V.versioned_delete(spark, t, "o_orderkey % 7 = 0", strategy="cow")
    (OUT / f"delete_cow_internals_{tag}.txt").write_text(buf.getvalue())
    n_mem = buf.getvalue().count("InMemoryTableScan")
    n_scan = buf.getvalue().count("Scan parquet")
    print(f"{tag}: InMemoryTableScan={n_mem} parquet-scans={n_scan}")
    spark.stop()


if __name__ == "__main__":
    main()
