"""Sequence packing: map documents to fixed-length training-sequence
offsets (SURVEY.md §2 Part B LLM-data extensions).

Pretraining pipelines don't feed one document per sequence — they
concatenate each shard's token stream and chop it into fixed
``seq_len``-token sequences, letting documents straddle sequence
boundaries (the GPT/Llama "packed" data layout). The index that makes
that layout random-accessible is per-document: which global token
offset a document starts at, and which sequences it touches. That is a
pure prefix-sum per shard:

    start_off  = SUM(n_tokens) OVER (shard ORDER BY doc) - n_tokens
    first_seq  = floor(start_off / seq_len)
    last_seq   = floor((start_off + n_tokens - 1) / seq_len)

Scale shape: ONE shuffle to the shard grain; the running sum is a JVM
window per shard, so parallelism equals the shard count — and the shard
count is a free parameter of the layout (pick 10^4-10^5 shards at
100 TB; each shard is an independent token stream, which is exactly how
packed pretraining data is sharded on disk anyway). This is the
opposite regime from ``operators/prefix.py``'s few-groups running sum,
so the plain window IS the right plan; use the prefix recipe only if
you genuinely need ONE global token stream.

Determinism: the (shard, order) pair must be a total order per shard —
callers order by the document id. Empty documents (0 tokens) are
excluded: they occupy no tokens, so they have no place in the packed
stream (the curation funnel upstream should have dropped them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count


def sequence_offsets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int,
    shard: Column,
    shard_col: str = "shard",
) -> DataFrame:
    """Per-document packed-layout index: (shard, id, n_tokens, start_off,
    first_seq, last_seq, n_seqs, straddles). ``shard`` is the caller's
    shard-assignment expression (deterministic — e.g. ``doc_id % n``);
    docs are packed per shard in ascending ``id_col`` order."""
    if seq_len <= 0:
        raise ValueError(f"sequence_offsets: seq_len must be positive, got {seq_len}")
    toks = df.select(
        shard.cast("long").alias(shard_col),
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = Window.partitionBy(shard_col).orderBy(id_col)
    end_off = F.sum("n_tokens").over(w)
    start_off = (end_off - F.col("n_tokens")).alias("start_off")
    first_seq = F.floor((end_off - F.col("n_tokens")) / seq_len).cast("long")
    last_seq = F.floor((end_off - 1) / seq_len).cast("long")
    return toks.select(
        shard_col,
        id_col,
        "n_tokens",
        start_off,
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + 1).alias("n_seqs"),
        (last_seq > first_seq).alias("straddles"),
    )
