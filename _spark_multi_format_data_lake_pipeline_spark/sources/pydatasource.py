"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API) —
a deterministic synthetic-documents connector.

The reference ingests fixed file formats (SURVEY.md §2 A.1); this is the
"bring your own source" extension point a 100 TB pipeline eventually
needs (internal APIs, proprietary formats, synthetic data). The connector
demonstrates the full surface: schema declaration, option handling, and
PARTITION PLANNING — ``n`` rows split across ``partitions`` input splits
that executors read independently, so generation parallelizes exactly
like a parquet scan.

Every value derives from sha256(doc_id), making the output reproducible
across any partitioning AND recomputable by an ANSI oracle (q163 puts
this connector under the driver's hash gate — a wrong split boundary,
dropped row, or generation drift breaks the hash).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

VOCAB = (
    "spark table hash join scan merge batch stream row value "
    "sort window part key agg line"
).split()  # 16 words — one hex digit pair mod 16 picks each token

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars int"

_LANGS = ("en", "de", "fr", "es")


def make_doc(doc_id: int) -> tuple[int, str, str, str, int]:
    """The generation formula — deliberately hex-slice-simple so a SQL
    oracle can recompute it verbatim (see q163)."""
    hx = hashlib.sha256(str(doc_id).encode()).hexdigest()
    lang = _LANGS[int(hx[0], 16) % len(_LANGS)]
    source = f"src{int(hx[1], 16) % 3}"
    n_words = 8 + int(hx[2], 16) % 8
    words = [
        VOCAB[int(hx[2 * i : 2 * i + 2], 16) % len(VOCAB)]
        for i in range(1, n_words + 1)
    ]
    text = " ".join(words)
    return doc_id, text, lang, source, len(text)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.n_parts = max(1, int(options.get("partitions", 8)))

    def partitions(self):
        if self.n <= 0:  # legitimately empty source, not a crash
            return [_RangePartition(0, 0)]
        step = -(-self.n // self.n_parts)  # ceil-div: no row lost at the tail
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield make_doc(doc_id)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n", 2000).load()``"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticDocsStreamReader":
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is safe)."""
    spark.dataSource.register(SyntheticDocsDataSource)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Offset-based streaming read of the same deterministic corpus:
    each micro-batch advances the doc_id cursor by ``rows_per_batch``.
    Offsets are plain dicts checkpointed by the engine — replaying
    (start, end) regenerates identical rows, which is exactly the
    replayability contract Structured Streaming sources must honor
    (tested: restart-from-checkpoint continuity, no dupes, no gaps)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 50))
        self.max_rows = int(options.get("max_rows", 10**6))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        # lists, not generators: Spark's prefetch cache copy.copy()s the
        # returned iterator, and generators are not copyable
        return [make_doc(i) for i in range(lo, hi)], {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery — same formula, same rows
        return [make_doc(i) for i in range(start["next"], end["next"])]

    def commit(self, end: dict) -> None:
        pass  # nothing external to clean up: the source is a formula


class JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_file: str, rows: int):
        self.tmp_file = tmp_file
        self.rows = rows


class JsonlWriter(DataSourceWriter):
    """Write side of the Python Data Source API with two-phase commit:
    every task writes to a dot-prefixed ``.{uuid}.tmp`` staging file
    (hidden from Hadoop-style readers) and reports it in its commit
    message; ``commit()`` renames files to visible ``part-{uuid}.json``
    names ONLY once every task succeeded, then drops a ``_SUCCESS``
    marker; ``abort()`` deletes the orphans. A job that dies during the
    WRITE phase leaves no visible output. The rename loop itself is not
    atomic across files — a driver crash mid-commit can leave a visible
    subset, which is why ``_SUCCESS`` is written last: consumers that
    gate on the marker (the Hadoop convention) never read a partial
    commit."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires .option('path', ...)")

    def write(self, iterator) -> "JsonlCommit":
        import json as jsonlib
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".{uuid.uuid4().hex}.tmp")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(jsonlib.dumps(row.asDict()) + "\n")
                n += 1
        return JsonlCommit(tmp, n)

    def commit(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and m.rows > 0:
                base = os.path.basename(m.tmp_file)[1 : -len(".tmp")]
                os.rename(
                    m.tmp_file,
                    os.path.join(self.path, f"part-{base}.json"),
                )
            elif m is not None:
                os.remove(m.tmp_file)  # empty partition: no file
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass  # marker last: its presence certifies a complete commit

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp_file):
                os.remove(m.tmp_file)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", d).mode("append").save()``"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(self.options)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
