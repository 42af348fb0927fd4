"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Design for a 100-TB training-data pipeline: media payloads are
``binary`` columns with a typed metadata struct alongside; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through per-row Python.

The decode step itself requires codec libraries (PIL / libav) that are
NOT in this container, so it is stubbed exactly as the task spec asks:
``decode_images(..., allow_fake=False)`` raises ``NotImplementedError``
unless PIL is importable; ``allow_fake=True`` substitutes a
DETERMINISTIC fake decode (dimensions derived from the payload hash) so
the Spark-side plumbing — schema, batch shape, partitioning — is real
and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# --- magic-number sniffing (real logic, works on any bytes) ---------------

_MAGICS = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav-or-avi"),
    (b"ID3", "audio/mp3"),
    (b"\x00\x00\x00", "video/mp4-maybe"),
]


def sniff_media_type(payload: bytes | None) -> str:
    if not payload:
        return "empty"
    for magic, mtype in _MAGICS:
        if payload.startswith(magic):
            return mtype
    return "application/octet-stream"


def attach_blob_metadata(df: DataFrame, binary_col: str) -> DataFrame:
    """Adds (blob_size long, blob_sha string) as JVM-side expressions and
    ``media_type`` via a vectorized sniff over mapInPandas-free pandas UDF."""
    sniff = F.pandas_udf(
        lambda s: s.map(lambda b: sniff_media_type(bytes(b) if b is not None else None)),
        "string",
    )
    return (
        df.withColumn("blob_size", F.octet_length(F.col(binary_col)).cast("long"))
        .withColumn("blob_sha", F.sha2(F.col(binary_col), 256))
        .withColumn("media_type", sniff(F.col(binary_col)))
    )


# --- header-only dimension parse (REAL logic, no codec needed) ------------

def parse_image_header(payload: bytes | None) -> tuple[int, int] | None:
    """Width/height from the container header alone — no codec library:

    - PNG: the IHDR chunk is mandatory and FIRST (PNG spec 11.2.2), so
      width/height are big-endian uint32 at bytes 16..24;
    - JPEG: scan marker segments for SOFn (0xC0-0xCF excluding
      C4/C8/CC); height/width are big-endian uint16 at segment offset
      +5/+7 (ITU T.81 B.2.2).

    Returns None when the bytes aren't a parseable PNG/JPEG — callers
    decide whether to fall back (fake) or fail (honest guard)."""
    if not payload:
        return None
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) >= 24 and payload[12:16] == b"IHDR":
            return (int.from_bytes(payload[16:20], "big"),
                    int.from_bytes(payload[20:24], "big"))
        return None
    if payload[:2] == b"\xff\xd8":
        i, n = 2, len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone
                i += 2
                continue
            seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
            if seg_len < 2:
                return None
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= n:
                    return (int.from_bytes(payload[i + 7:i + 9], "big"),
                            int.from_bytes(payload[i + 5:i + 7], "big"))
                return None
            i += 2 + seg_len
        return None
    return None


def png_bytes(width: int, height: int) -> bytes:
    """Minimal valid PNG prefix (signature + IHDR) — fixture builder for
    testing the header parser without codec libraries."""
    ihdr = width.to_bytes(4, "big") + height.to_bytes(4, "big") + bytes(
        [8, 2, 0, 0, 0])  # bit depth 8, truecolor
    return (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR" + ihdr
            + b"\x00\x00\x00\x00")  # CRC not validated by the parser


def jpeg_bytes(width: int, height: int) -> bytes:
    """Minimal JPEG prefix: SOI + APP0(JFIF) + SOF0 carrying the dims."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" + bytes(6)
    sof0 = (b"\xff\xc0" + (11).to_bytes(2, "big") + bytes([8])
            + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([1, 0x11, 0]))
    return b"\xff\xd8" + app0 + sof0


def image_header_dims(
    df: DataFrame, id_col: str = "media_id", binary_col: str = "payload"
) -> DataFrame:
    """-> (media_id, width int|null, height int|null): REAL header-only
    dimensions for PNG/JPEG payloads (null for unparseable bytes) —
    Arrow-batched, no codec dependency, no fake.  The metadata pass a
    100-TB media pipeline runs BEFORE deciding what to decode."""
    def dims(s):  # unannotated: future-annotations would stringify hints
        parsed = s.map(lambda b: parse_image_header(bytes(b) if b is not None else None))
        return pd.DataFrame({
            "width": parsed.map(lambda t: t[0] if t else None),
            "height": parsed.map(lambda t: t[1] if t else None),
        })

    udf = F.pandas_udf(dims, "width int, height int")
    return df.select(id_col, udf(F.col(binary_col)).alias("_d")).select(
        id_col, F.col("_d.width").alias("width"), F.col("_d.height").alias("height"))


# --- decode (stubbed codec, real plumbing) --------------------------------

DECODED_SCHEMA = (
    "media_id long, width int, height int, n_channels int, decoder string"
)


def _try_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def _fake_dims(payload: bytes) -> tuple[int, int]:
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240  # deterministic 16..255


def decode_images(
    df: DataFrame,
    id_col: str = "media_id",
    binary_col: str = "payload",
    allow_fake: bool = False,
) -> DataFrame:
    """-> (media_id, width, height, n_channels, decoder).

    Real path requires PIL (absent in this container); ``allow_fake``
    uses the deterministic stand-in so pipelines/tests exercise the full
    distributed plumbing.  Batches stream through mapInPandas (Arrow),
    one decode call per row INSIDE the batch loop — the per-image work is
    inherently per-item; the distribution and IO are what Spark owns.
    """
    pil = _try_pil()
    if pil is None and not allow_fake:
        raise NotImplementedError(
            "image decode requires PIL, which is not installed in this "
            "environment; pass allow_fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            ids, ws, hs, cs, dec = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(payload) if payload is not None else b""
                if pil is not None:
                    with pil.open(io.BytesIO(data)) as im:  # pragma: no cover
                        w, h = im.size
                        c = len(im.getbands())
                        d = "pil"
                else:
                    hd = parse_image_header(data)
                    if hd is not None:  # REAL header-only dimensions
                        (w, h), c, d = hd, 3, "header"
                    else:
                        w, h = _fake_dims(data)
                        c, d = 3, "fake"
                ids.append(int(mid)); ws.append(w); hs.append(h); cs.append(c); dec.append(d)
            yield pd.DataFrame({"media_id": ids, "width": ws, "height": hs,
                                "n_channels": cs, "decoder": dec})

    return df.select(id_col, binary_col).mapInPandas(batches, DECODED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
    binary_col: str = "payload",
) -> DataFrame:
    """Video frame sampling stub: emits (media_id, frame_idx, frame_sha)
    for frames 0, n, 2n … of a DETERMINISTIC fake frame count derived
    from the payload (real decoder would use libav).  The fan-out shape
    (one row in -> many rows out via mapInPandas) is the real pattern."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "frame_sha": []}
            for mid, payload in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(payload) if payload is not None else b""
                n_frames = 1 + hashlib.sha256(data).digest()[2] % 64
                for fi in range(0, n_frames, every_n):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(fi)
                    # textual index suffix: cross-engine reproducible
                    # (sha256 over payload || ':' || decimal index)
                    out["frame_sha"].append(
                        hashlib.sha256(data + b":" + str(fi).encode()).hexdigest()[:16]
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, binary_col).mapInPandas(
        batches, "media_id long, frame_idx int, frame_sha string"
    )
