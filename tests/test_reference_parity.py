"""Golden parity against the reference's OWN inputs and committed outputs.

The reference repo ships both its raw input files (``data/``) and the
warehouse its one successful run produced (``warehouse/iceberg_db/*`` —
SURVEY.md §5 calls this the de-facto golden output). Sweeping the same
inputs through this engine's readers must reproduce the same table names,
row counts, and column counts — except the documented DOCX divergence
(the reference read .docx bytes as mojibake lines; we extract real
paragraphs, SURVEY.md §2 S4)."""

from __future__ import annotations

import glob
from pathlib import Path

import duckdb
import pytest

from _spark_multi_format_data_lake_pipeline_spark.sources.readers import load_all_sources

REF_DATA = Path("/root/reference/data")
REF_WAREHOUSE = Path("/root/reference/warehouse/iceberg_db")

pytestmark = pytest.mark.skipif(
    not REF_DATA.exists() or not REF_WAREHOUSE.exists(),
    reason="reference repo not mounted",
)

# (rows, cols) per table from the reference's committed warehouse output
GOLDEN = {
    "csv_anime": (4449, 18),
    "csv_economy_indicators": (306, 6),
    "json_Walmart_Scrape": (1, 9),
    "json_nhatkyxem": (6081, 9),
    "parquet_house_price": (545, 13),
    "parquet_weather": (366, 22),
    # text_ADTechAnalyticAnnoymous: documented divergence (real DOCX
    # extraction vs the reference's 3223 mojibake "lines")
}


@pytest.fixture(scope="module")
def handles(spark):
    hs = load_all_sources(spark, REF_DATA)
    return {h.name: h for h in hs}


def test_table_names_match_reference_warehouse(handles):
    expected = {p.name for p in REF_WAREHOUSE.iterdir() if p.is_dir()}
    assert set(handles) == expected


def test_row_and_column_counts_match_golden(handles):
    got = {name: (h.row_count, h.col_count) for name, h in handles.items()}
    for name, want in GOLDEN.items():
        assert got[name] == want, f"{name}: got {got[name]}, golden {want}"


def test_csv_all_string_schema_like_reference(handles):
    # inferSchema=false: every CSV column must be string (SURVEY.md §1.2,
    # verified against the reference's csv_anime metadata)
    assert all(t == "string" for _, t in handles["csv_anime"].df.dtypes)


def test_json_nested_inference_like_reference(handles):
    # nhatkyxem: nested arrays of structs survived inference in the
    # reference warehouse (subtitles/details/products fields)
    dtypes = dict(handles["json_nhatkyxem"].df.dtypes)
    assert dtypes["subtitles"].startswith("array<struct")
    assert dtypes["products"].startswith("array<")
    assert dtypes["time"] == "string"  # reference never parsed timestamps


def test_parquet_native_types_like_reference(handles):
    dtypes = dict(handles["parquet_weather"].df.dtypes)
    assert dtypes["MinTemp"] == "double"
    assert dtypes["RainToday"] == "string"


def test_docx_divergence_is_real_text(handles):
    h = handles["text_ADTechAnalyticAnnoymous"]
    assert h.df.columns == ["value"]
    assert h.row_count > 0
    sample = " ".join(r.value for r in h.df.limit(5).collect())
    # real extraction yields readable ASCII-dominant text, not zip bytes
    printable = sum(c.isprintable() for c in sample) / max(1, len(sample))
    assert printable > 0.95
