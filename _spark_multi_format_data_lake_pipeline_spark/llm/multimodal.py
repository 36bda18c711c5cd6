"""Multimodal column handling (SURVEY.md §2 Part B "Multimodal columns").

Images/audio/video are carried as opaque ``binary`` columns plus a typed
metadata struct. The Spark-side plumbing — schema, Arrow batching through
``mapInPandas``, partition sizing — is real and tested; the actual codec
step is stubbed (no image/audio libraries in this container) behind
``decode_media``, exactly as flagged in the build brief.

At 100 TB: binary payloads dominate partition size, so feature extraction
uses ``mapInPandas`` (streaming Arrow batches, bounded memory) rather than
``collect``-style paths, and ``maxRecordsPerBatch`` caps batch bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, "
    "n_bytes bigint, payload_sha256 string"
)


def attach_fake_media(documents: DataFrame, media_type: str = "image/fake") -> DataFrame:
    """Deterministic fake media: the UTF-8 bytes of the document text stand
    in for an image payload. Gives the pipeline a real binary column with
    realistic size variance, fully reproducibly."""
    return documents.select(
        "doc_id",
        F.lit(media_type).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def decode_media(payload: bytes, media_type: str):
    """Codec stub — image/audio libs are not in this container."""
    raise NotImplementedError(
        "media decoding requires an image/audio codec library; "
        "wire PIL/torchaudio here on a real cluster"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The features computed here (byte length, sha256) are deterministic
    stand-ins for embedding/resize/frame-sample outputs, but the execution
    shape — mapInPandas over an Arrow stream of binary columns — is exactly
    what a real decoder would use.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": pdf["payload"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "payload_sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                }
            )
            yield out

    return media.mapInPandas(_extract, schema=MEDIA_SCHEMA)
