"""Multimodal column handling (SURVEY.md §2 Part B "Multimodal columns").

Images/audio/video are carried as opaque ``binary`` columns plus a typed
metadata struct. The Spark-side plumbing — schema, Arrow batching through
``mapInPandas``, partition sizing — is real and tested. The codec layer
behind ``decode_media`` resolves to PIL when installed; in this container
a stdlib ``struct``-based decoder handles 24bpp BMP and P6 PPM for real
(q139 hash-checks an actual header decode end-to-end), and other formats
stay stubbed exactly as flagged in the build brief.

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
    the exact same code path goes live; in this container the stdlib
    BMP/PPM decoder below covers those two formats and everything else
    stays stubbed."""
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


class DecodedImage:
    """Minimal decoded-image surface (duck-typed subset of PIL.Image):
    width/height/mode plus the raw pixel array."""

    __slots__ = ("width", "height", "mode", "pixels")

    def __init__(self, width: int, height: int, mode: str, pixels: bytes):
        self.width = width
        self.height = height
        self.mode = mode
        self.pixels = pixels


def encode_bmp(width: int, height: int, pixel_bytes: bytes) -> bytes:
    """Minimal 24bpp uncompressed BMP (BITMAPINFOHEADER) encoder —
    stdlib-only, used to generate real image fixtures in-sandbox.
    ``pixel_bytes`` supplies ``3*width*height`` BGR bytes (short input is
    zero-padded); rows are 4-byte aligned per the format."""
    import struct

    row = width * 3
    pad = (4 - row % 4) % 4
    stride = row + pad
    img_size = stride * height
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for r in range(height):
        chunk = pixel_bytes[r * row : (r + 1) * row]
        rows.append(chunk + b"\x00" * (stride - len(chunk)))
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes) -> DecodedImage:
    """Stdlib 24bpp-uncompressed BMP decoder: parses the real header
    (magic, pixel-array offset, BITMAPINFOHEADER dims/bpp/compression)
    with ``struct`` — no image library involved."""
    import struct

    data = bytes(payload)
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    offset = struct.unpack_from("<I", data, 10)[0]
    _, width, height = struct.unpack_from("<Iii", data, 14)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"builtin BMP codec handles 24bpp uncompressed only (got "
            f"bpp={bpp}, compression={compression})"
        )
    return DecodedImage(width, abs(height), "BGR", data[offset:])


def encode_ppm(width: int, height: int, pixel_bytes: bytes) -> bytes:
    """Minimal binary PPM (P6, maxval 255) encoder — stdlib-only."""
    need = width * height * 3
    body = pixel_bytes[:need] + b"\x00" * max(0, need - len(pixel_bytes))
    return f"P6\n{width} {height}\n255\n".encode("ascii") + body


def decode_ppm(payload: bytes) -> DecodedImage:
    """Stdlib P6 PPM decoder: parses the ASCII header, returns RGB pixels."""
    data = bytes(payload)
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields: list[bytes] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment line
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(data[start:pos])
    width, height, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise NotImplementedError("builtin PPM codec handles maxval 255 only")
    return DecodedImage(width, height, "RGB", data[pos + 1 :])


def _builtin_codec(payload: bytes, media_type: str):
    """Magic-byte dispatch for the formats the stdlib decoder covers."""
    data = bytes(payload)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    raise NotImplementedError(
        f"builtin codec covers BMP/PPM only; {media_type} payloads need "
        "Pillow (images) or torchaudio/pyav via the codec arg"
    )


def decode_media(payload: bytes, media_type: str, codec=None):
    """Decode a binary media payload. Resolution order: an explicitly
    supplied ``codec`` callable, the autodetected PIL codec (when
    installed), then the stdlib BMP/PPM decoder — so in this container
    BMP/PPM decode for real while other formats raise until a codec
    library is present."""
    codec = codec or _CODEC
    if codec is not None:
        return codec(payload, media_type)
    return _builtin_codec(payload, media_type)


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


GEN_BMP_SCHEMA = "doc_id bigint, media_type string, payload binary"


def attach_generated_bmp(documents: DataFrame) -> DataFrame:
    """Real (not fake) image payloads: one valid 24bpp BMP per document,
    dimensions derived from sha256(doc_id) hex slices — width in [4, 64],
    height in [4, 48] — and deterministic pixel bytes. Because the dims
    come from the same hex-slice-of-sha pattern as attach_fake_media, an
    oracle can predict what a correct decoder must read back out of the
    binary header, which is what lets q139 hash-check an actual decode."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        payloads = []
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                hx = hashlib.sha256(str(d).encode()).hexdigest()
                w = 4 + int(hx[0:8], 16) % 61
                h = 4 + int(hx[8:16], 16) % 45
                need = w * 3 * h
                seed = hashlib.sha256(f"{d}:px".encode()).digest()
                pix = (seed * (need // len(seed) + 1))[:need]
                payloads.append(encode_bmp(w, h, pix))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image/bmp",
                    "payload": payloads,
                }
            )

    return documents.select("doc_id").mapInPandas(_gen, schema=GEN_BMP_SCHEMA)


DECODE_DIMS_SCHEMA = (
    "doc_id bigint, width int, height int, mode string, n_pixel_bytes int"
)


def decode_image_dims(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode: runs decode_media on every payload and
    emits the dimensions/mode/pixel-array size read from the binary
    header. Same mapInPandas shape as extract_features, but the decode
    step is no longer a stand-in for BMP/PPM payloads."""

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, m, nb = [], [], [], []
            for mt, p in zip(pdf["media_type"], pdf["payload"]):
                img = decode_media(bytes(p), mt)
                w.append(img.width)
                h.append(img.height)
                m.append(img.mode)
                # PIL images expose tobytes(), the stdlib DecodedImage .pixels
                raw = img.pixels if hasattr(img, "pixels") else img.tobytes()
                nb.append(len(raw))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series(w, dtype="int32"),
                    "height": pd.Series(h, dtype="int32"),
                    "mode": m,
                    "n_pixel_bytes": pd.Series(nb, dtype="int32"),
                }
            )

    return media.mapInPandas(_dec, schema=DECODE_DIMS_SCHEMA)


PIXEL_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, n_pixels int, "
    "n_channel_bytes int, pixel_byte_sum bigint"
)


def decode_pixel_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL pixel decode: parses each payload with the
    codec, strips the format's row padding (BMP rows are 4-byte aligned;
    PPM P6 is contiguous), and reduces the TRUE channel bytes to an exact
    integer sum. Unlike decode_image_dims (header-only), a bug anywhere in
    the pixel path breaks q153's oracle hash: a wrong offset or truncated
    row shifts ``pixel_byte_sum``; padding kept (pads are zero bytes, so
    the SUM alone would not notice) inflates ``n_channel_bytes`` past
    ``3*width*height``.

    Python-side by necessity (this IS the media-decode hook); the stats
    reduction keeps the emitted row at five scalars, so no pixel data
    ever crosses back out of the Arrow batch."""

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, np_, nc, ps = [], [], [], [], []
            for mt, p in zip(pdf["media_type"], pdf["payload"]):
                img = decode_media(bytes(p), mt)
                raw = img.pixels if hasattr(img, "pixels") else img.tobytes()
                row = img.width * 3
                if img.mode == "BGR":  # BMP pixel array: stride-aligned rows
                    stride = (row + 3) // 4 * 4
                    body = b"".join(
                        raw[r * stride : r * stride + row] for r in range(img.height)
                    )
                else:  # RGB (PPM / PIL): contiguous
                    body = raw[: row * img.height]
                w.append(img.width)
                h.append(img.height)
                np_.append(img.width * img.height)
                nc.append(len(body))
                ps.append(sum(body))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series(w, dtype="int32"),
                    "height": pd.Series(h, dtype="int32"),
                    "n_pixels": pd.Series(np_, dtype="int32"),
                    "n_channel_bytes": pd.Series(nc, dtype="int32"),
                    "pixel_byte_sum": pd.Series(ps, dtype="int64"),
                }
            )

    return media.mapInPandas(_dec, schema=PIXEL_STATS_SCHEMA)
