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
