"""PySpark-native analytics engine with the query/data-processing surface of
the reference multi-format data-lake pipeline (VNonTOP-DE/-Spark-Multi-Format-Data-Lake-Pipeline).

Architecture (Spark-first, NOT a port):

- Everything is declared through the DataFrame / Spark SQL API so Catalyst
  performs predicate pushdown, column pruning, join selection, AQE skew
  handling and whole-stage codegen for free.
- No custom IR, no custom Catalyst rules (SURVEY.md §4: the reference has
  none either).
- Python UDFs only where built-ins genuinely can't express the semantics,
  and then always Arrow-batched (pandas_udf / applyInPandas / mapInPandas).

Layout:
    session.py    -- SparkSession factory (local test + cluster-scale confs)
    sources/      -- multi-format readers (JSON/CSV/Parquet/text) with the
                     reference's corrupt-record semantics + lake table loader
    sinks/        -- table writer + merge engine (MERGE INTO or jar-free
                     anti-join emulation)
    operators/    -- relational building blocks (as-of join, top-k, dedup
                     windows) expressed as DataFrame compositions
    functions/    -- scalar helpers (text stats, vector math, json)
    llm/          -- training-data pipeline ops: dedup (exact/minhash/simhash),
                     ANN similarity search, text quality, multimodal plumbing
    streaming/    -- Structured Streaming over the events table
    queries/      -- the registered query catalog exposed via __spark_entry__
"""

__version__ = "0.1.0"
