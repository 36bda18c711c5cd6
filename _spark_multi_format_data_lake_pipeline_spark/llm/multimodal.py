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
    in for an image payload, plus a typed metadata struct (``meta.width``,
    ``meta.height``, ``meta.duration_ms``, ``meta.sample_rate``) derived
    from sha256(doc_id) so any engine can recompute it. Gives the pipeline
    a real binary column with realistic size variance, fully reproducibly.

    DuckDB twin for a meta field (hex-slice-of-sha pattern, same as
    ``functions.text.hash_bucket``): ``64 + CAST(('0x' ||
    substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1857``.
    """
    sha = F.sha2(F.col("doc_id").cast("string"), 256)

    def _field(offset: int, base: int, mod: int):
        h = F.conv(F.substring(sha, offset, 8), 16, 10).cast("bigint")
        return (F.lit(base) + F.pmod(h, F.lit(mod))).cast("int")

    meta = F.struct(
        _field(1, 64, 1857).alias("width"),
        _field(9, 64, 1017).alias("height"),
        _field(17, 1000, 600_000).alias("duration_ms"),
        _field(25, 8000, 40_000).alias("sample_rate"),
    )
    return documents.select(
        "doc_id",
        F.lit(media_type).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def _load_codec():
    """Optional codec autodetection: returns a PIL-backed image decoder when
    Pillow is importable, else None. On a real cluster with Pillow installed
    the exact same code path goes live; in this container it stays stubbed."""
    try:
        import io

        from PIL import Image  # noqa: PLC0415
    except ImportError:
        return None

    def _decode(payload: bytes, media_type: str):
        if media_type.startswith("image/"):
            return Image.open(io.BytesIO(bytes(payload)))
        raise NotImplementedError(f"no codec wired for {media_type}")

    return _decode


_CODEC = _load_codec()


def decode_media(payload: bytes, media_type: str, codec=None):
    """Decode a binary media payload. Uses the autodetected codec (PIL for
    images, when installed), an explicitly supplied ``codec`` callable, or
    raises — audio/video libs are never present in this container."""
    codec = codec or _CODEC
    if codec is not None:
        return codec(payload, media_type)
    raise NotImplementedError(
        "media decoding requires an image/audio codec library; "
        "install Pillow (images) or wire torchaudio/pyav via the codec arg"
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


RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, out_width int, out_height int, "
    "out_bytes int, thumbnail binary"
)


def resize_media(media: DataFrame, max_dim: int = 256) -> DataFrame:
    """Aspect-preserving image resize plumbing over Arrow batches.

    A real deployment decodes ``payload`` (PIL/libvips slots in where
    ``decode_media`` is stubbed), resizes so the longer edge is
    ``max_dim``, and re-encodes. Here the geometry math is real and the
    pixel step is a deterministic fake: the "thumbnail" is the payload
    prefix scaled by the area ratio, so output size tracks resolution
    exactly as a constant-quality re-encode would. All arithmetic is
    IEEE-double on both engines, so the geometry columns oracle-match.
    """

    flat = media.select(
        "doc_id", "payload", "meta.width", "meta.height"
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].astype("float64")
            h = pdf["height"].astype("float64")
            scale = (max_dim / w.combine(h, max)).clip(upper=1.0)
            out_w = (w * scale).apply(int).clip(lower=1)
            out_h = (h * scale).apply(int).clip(lower=1)
            n_bytes = pdf["payload"].map(len)
            out_bytes = (
                (n_bytes * (out_w * out_h) / (w * h)).apply(int).clip(lower=1)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_width": out_w.astype("int32"),
                    "out_height": out_h.astype("int32"),
                    "out_bytes": out_bytes.astype("int32"),
                    "thumbnail": [
                        bytes(p)[:n] for p, n in zip(pdf["payload"], out_bytes)
                    ],
                }
            )

    return flat.mapInPandas(_resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_len int, frame binary"


def sample_frames(
    media: DataFrame, frame_bytes: int = 256, every: int = 4
) -> DataFrame:
    """Video/audio frame sampling plumbing: treat the payload as a stream
    of fixed-size frames and keep every ``every``-th one, emitting one row
    per sampled frame (row-expanding ``mapInPandas`` — the shape a real
    ffmpeg keyframe sampler produces). Zero-byte payloads yield no frames.

    At scale this is the step that turns a 100 TB video corpus into a
    bounded training set; because each input row expands independently,
    it needs no shuffle and parallelizes per Arrow batch.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, frames = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = -(-len(raw) // frame_bytes)
                for fi in range(0, n_frames, every):
                    chunk = raw[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(fi)
                    lens.append(len(chunk))
                    frames.append(chunk)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return media.mapInPandas(_sample, schema=FRAME_SCHEMA)
