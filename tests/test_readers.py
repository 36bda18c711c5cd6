"""Golden ingestion fixtures (SURVEY.md §5 item 2): table naming,
all-string CSV schemas, corrupt-row filtering, nested JSON inference,
per-file error isolation, DOCX extraction."""

from __future__ import annotations

import zipfile

import pytest

from _spark_multi_format_data_lake_pipeline_spark.sources.readers import (
    load_all_sources,
    read_csv,
    read_json,
    read_parquet,
    read_text,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("sources")
    (base / "json").mkdir()
    (base / "csv").mkdir()
    (base / "parquet").mkdir()
    (base / "docx").mkdir()

    # nested multi-line JSON (array-of-objects, like the reference's inputs)
    (base / "json" / "products.json").write_text(
        """[
          {"id": 1, "name": "widget", "tags": ["a", "b"],
           "details": [{"name": "color"}, {"name": "size"}]},
          {"id": 2, "name": "bolt", "tags": [], "details": []}
        ]"""
    )
    # JSON with a corrupt row (line-JSON must be single-line records when
    # multiLine=true reads it as one doc — use a broken array instead)
    (base / "json" / "broken.json").write_text('{"id": 1, "x": ]]]')
    # empty file
    (base / "json" / "empty.json").write_text("")

    # CSV with header + quoted multi-line field + short (corrupt-ish) row
    (base / "csv" / "anime.csv").write_text(
        'id,title,notes\n1,"Cowboy Bebop","space\njazz"\n2,"Akira","neo tokyo"\n'
    )

    # parquet via Spark later (written in test via fixture param) — instead
    # write with pyarrow here so the reader is exercised standalone
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"id": [1, 2, 3], "temp": [20.5, 21.0, 19.8]}),
        base / "parquet" / "weather.parquet",
    )

    # plain text
    (base / "docx" / "notes.txt").write_text("line one\nline two\nline three\n")

    # minimal real DOCX (a zip with word/document.xml)
    doc_xml = (
        '<?xml version="1.0"?><w:document xmlns:w="http://x"><w:body>'
        "<w:p><w:r><w:t>Hello paragraph one</w:t></w:r></w:p>"
        "<w:p><w:r><w:t>Second &amp; final</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    with zipfile.ZipFile(base / "docx" / "report.docx", "w") as z:
        z.writestr("word/document.xml", doc_xml)

    return base


def test_json_nested_inference(spark, data_dir):
    h = read_json(spark, data_dir / "json" / "products.json")
    assert h is not None
    assert h.name == "json_products"
    assert h.source_type == "JSON"
    assert h.row_count == 2
    dtypes = dict(h.df.dtypes)
    assert dtypes["tags"] == "array<string>"
    assert dtypes["details"].startswith("array<struct")
    assert "_corrupt_record" not in h.df.columns


def test_json_corrupt_rows_filtered(spark, data_dir):
    # the whole file is one corrupt document -> zero clean rows -> None
    assert read_json(spark, data_dir / "json" / "broken.json") is None


def test_json_empty_file(spark, data_dir):
    assert read_json(spark, data_dir / "json" / "empty.json") is None


def test_csv_all_strings(spark, data_dir):
    h = read_csv(spark, data_dir / "csv" / "anime.csv")
    assert h is not None
    assert h.name == "csv_anime"
    assert all(t == "string" for _, t in h.df.dtypes)  # inferSchema=false
    assert h.row_count == 2  # multiLine keeps the embedded newline row whole
    notes = {r.notes for r in h.df.collect()}
    assert "space\njazz" in notes


def test_parquet_native_types(spark, data_dir):
    h = read_parquet(spark, data_dir / "parquet" / "weather.parquet")
    assert h is not None
    assert h.name == "parquet_weather"
    assert dict(h.df.dtypes)["temp"] == "double"


def test_text_lines(spark, data_dir):
    h = read_text(spark, data_dir / "docx" / "notes.txt")
    assert h is not None
    assert h.name == "text_notes"
    assert h.df.columns == ["value"]
    assert h.row_count == 3


def test_docx_real_extraction(spark, data_dir):
    h = read_text(spark, data_dir / "docx" / "report.docx")
    assert h is not None
    assert h.name == "text_report"
    vals = [r.value for r in h.df.collect()]
    assert vals == ["Hello paragraph one", "Second & final"]


def test_sweep_isolates_failures(spark, data_dir):
    handles = load_all_sources(spark, data_dir)
    names = sorted(h.name for h in handles)
    # broken.json and empty.json skipped, everything else present
    assert names == [
        "csv_anime",
        "json_products",
        "parquet_weather",
        "text_notes",
        "text_report",
    ]


def test_csv_corrupt_row_captured_and_filtered(spark, tmp_path):
    # an unclosed quote makes an unparseable record -> PERMISSIVE captures
    # it in _corrupt_record; the reader counts+filters+drops (S2 semantics)
    f = tmp_path / "broken.csv"
    f.write_text('id,name\n1,ok\n2,"unclosed\n3,fine\n')
    h = read_csv(spark, f)
    assert h is not None
    assert "_corrupt_record" not in h.df.columns
    ids = sorted(r.id for r in h.df.collect())
    assert "1" in ids  # clean rows survive
    assert h.row_count == len(ids)


def test_csv_short_rows_are_null_padded_not_corrupt(spark, tmp_path):
    f = tmp_path / "short.csv"
    f.write_text("a,b,c\n1,2,3\n4,5\n")
    h = read_csv(spark, f)
    assert h is not None
    assert h.row_count == 2  # short row padded with nulls, kept
    rows = {r.a: (r.b, r.c) for r in h.df.collect()}
    assert rows["4"] == ("5", None)


def test_wide_csv_maxcolumns(spark, tmp_path):
    n = 5000
    f = tmp_path / "wide.csv"
    header = ",".join(f"c{i}" for i in range(n))
    row = ",".join(str(i) for i in range(n))
    f.write_text(header + "\n" + row + "\n")
    h = read_csv(spark, f)
    assert h is not None
    assert h.col_count == n
    assert h.row_count == 1


def test_orc_roundtrip(spark, tmp_path):
    src = spark.range(50).selectExpr("id", "cast(id * 2 as double) d")
    path = tmp_path / "t.orc"
    src.write.orc(str(path))
    from _spark_multi_format_data_lake_pipeline_spark.sources.readers import read_orc

    h = read_orc(spark, path)
    assert h is not None
    assert h.source_type == "ORC"
    assert h.row_count == 50
    assert dict(h.df.dtypes) == {"id": "bigint", "d": "double"}


def test_avro_degrades_gracefully_without_jar(spark, tmp_path):
    # spark-avro is an external module; without it the reader must return
    # None (per-file isolation) rather than raise. With the jar present
    # this test would need a real .avro file instead.
    from _spark_multi_format_data_lake_pipeline_spark.sources.readers import read_avro

    f = tmp_path / "x.avro"
    f.write_bytes(b"Obj\x01not really avro")
    assert read_avro(spark, f) is None


def test_sweep_picks_up_orc_dir(spark, tmp_path):
    orc_dir = tmp_path / "orc"
    orc_dir.mkdir()
    spark.range(5).coalesce(1).write.orc(str(orc_dir / "five.orc"))
    from _spark_multi_format_data_lake_pipeline_spark.sources.readers import load_all_sources

    handles = load_all_sources(spark, tmp_path)
    assert [h.source_type for h in handles] == ["ORC"]
    assert handles[0].row_count == 5


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A lake directory accretes columns over time; mergeSchema reads the
    union schema with nulls for files written before a column existed."""
    d = tmp_path / "evolving"
    spark.createDataFrame([(1, "a")], "id bigint, v1 string").write.parquet(
        str(d), mode="append"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, v1 string, v2 double"
    ).write.parquet(str(d), mode="append")
    df = spark.read.option("mergeSchema", "true").parquet(str(d))
    assert set(df.columns) == {"id", "v1", "v2"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["v2"] is None and rows[2]["v2"] == 9.5


def test_xml_native_read(spark, tmp_path):
    f = tmp_path / "books.xml"
    f.write_text(
        "<catalog>"
        "<row><id>1</id><title>Spark</title><price>9.5</price></row>"
        "<row><id>2</id><title>Lake</title><price>3.25</price></row>"
        "</catalog>"
    )
    from _spark_multi_format_data_lake_pipeline_spark.sources.readers import read_xml

    h = read_xml(spark, f)
    assert h is not None
    assert h.source_type == "XML"
    assert h.name == "xml_books"
    assert h.row_count == 2
    got = {r["id"]: (r["title"], r["price"]) for r in h.df.collect()}
    assert got == {1: ("Spark", 9.5), 2: ("Lake", 3.25)}


def test_binaryfile_read(spark, tmp_path):
    payload = b"\x89PNG\r\nfake-image-bytes"
    f = tmp_path / "img.png"
    f.write_bytes(payload)
    from _spark_multi_format_data_lake_pipeline_spark.sources.readers import read_binary

    h = read_binary(spark, f)
    assert h is not None
    assert h.source_type == "BINARY"
    row = h.df.collect()[0]
    assert bytes(row["content"]) == payload
    assert row["length"] == len(payload)
    assert row["path"].endswith("img.png")


def test_sweep_picks_up_xml_and_binary(spark, tmp_path):
    (tmp_path / "xml").mkdir()
    (tmp_path / "binary").mkdir()
    (tmp_path / "xml" / "a.xml").write_text("<r><row><x>1</x></row></r>")
    (tmp_path / "binary" / "b.bin").write_bytes(b"\x00\x01\x02")
    from _spark_multi_format_data_lake_pipeline_spark.sources.readers import load_all_sources

    names = {h.name for h in load_all_sources(spark, tmp_path)}
    assert {"xml_a", "binary_b"} <= names


def test_schema_diff_detects_nested_drift(spark):
    from _spark_multi_format_data_lake_pipeline_spark.sources.evolution import (
        compatible_for_merge,
        schema_diff,
        schema_diff_report,
    )

    old = spark.createDataFrame(
        [], schema="id bigint, price double, meta struct<os:string,v:int>"
    )
    new = spark.createDataFrame(
        [],
        schema="id bigint, price string, extra boolean, "
        "meta struct<os:string,region:string>",
    )
    diff = schema_diff(old, new)
    by_path = {c["path"]: c for c in diff}
    assert by_path["price"]["kind"] == "type_changed"
    assert by_path["price"]["old_type"] == "double"
    assert by_path["meta.v"]["kind"] == "removed"
    assert by_path["meta.region"]["kind"] == "added"
    assert by_path["extra"]["kind"] == "added"
    # severity ordering: type changes first, additions last
    kinds = [c["kind"] for c in diff]
    assert kinds == sorted(kinds, key=["type_changed", "removed", "added"].index)

    rep = schema_diff_report(spark, old, new)
    assert rep.count() == len(diff)
    assert rep.columns == ["path", "kind", "old_type", "new_type"]

    assert not compatible_for_merge(old, new)
    added_only = spark.createDataFrame(
        [], schema="id bigint, price double, meta struct<os:string,v:int>, x int"
    )
    assert compatible_for_merge(old, added_only)
    assert not compatible_for_merge(old, added_only, allow_added=False)
    assert schema_diff(old, old) == []


def test_python_datasource_partition_planning(spark):
    """Custom Python Data Source (sources/pydatasource.py): ceil-div range
    splits lose no rows at the tail, honor the requested parallelism, and
    produce identical content under any partitioning."""
    from _spark_multi_format_data_lake_pipeline_spark.sources import pydatasource

    pydatasource.register(spark)

    def load(n, parts):
        return (
            spark.read.format("synthetic_docs")
            .option("n", n)
            .option("partitions", parts)
            .load()
        )

    df = load(101, 7)  # 101 % 7 != 0 -> tail split is short, not dropped
    assert df.count() == 101
    assert df.rdd.getNumPartitions() == 7
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    a = sorted((r.doc_id, r.text) for r in df.collect())
    b = sorted((r.doc_id, r.text) for r in load(101, 3).collect())
    assert a == b  # partitioning never changes content
    assert [i for i, _ in a] == list(range(101))  # every id exactly once
    # generation matches the driver-side formula executors also run
    assert a[0][1] == " ".join(
        pydatasource.make_doc(0)[1].split()
    )


def test_python_datasource_jsonl_writer_two_phase_commit(spark, tmp_path):
    """Writer side of the Python Data Source API: task outputs stage as
    .tmp files and only become visible on job commit; rows round-trip."""
    import json as jsonlib
    import os

    from _spark_multi_format_data_lake_pipeline_spark.sources import pydatasource

    pydatasource.register_sink(spark)
    out = str(tmp_path / "jsonl")
    df = spark.range(0, 57).selectExpr("id", "concat('row', id) AS name")
    df.repartition(4).write.format("jsonl_sink").option("path", out).mode(
        "append"
    ).save()
    files = sorted(os.listdir(out))
    assert "_SUCCESS" in files  # commit marker written last
    data = [f for f in files if f != "_SUCCESS"]
    assert data and all(
        f.startswith("part-") and f.endswith(".json") for f in data
    )  # visible names — no .tmp, no hidden dot-prefix Spark would skip
    rows = []
    for f in data:
        with open(os.path.join(out, f)) as fh:
            rows += [jsonlib.loads(line) for line in fh]
    assert sorted(r["id"] for r in rows) == list(range(57))
    assert {r["name"] for r in rows} == {f"row{i}" for i in range(57)}
    # and the engine that wrote it can read it back (the real contract)
    back = spark.read.json(out)
    assert back.count() == 57
    assert sorted(r.id for r in back.collect()) == list(range(57))
