"""Delta + variable-byte posting blocks with block-max metadata.

North-star addition over the reference (whose postings.idx stores flat
16-byte records, Index.java:230-235): docID gaps and tfs are VByte-packed
into ``BinaryType`` columns, one row per (term, block), with ``max_tf`` /
``first_doc`` / ``last_doc`` metadata for block-max WAND pruning
(SURVEY.md §4 items 1-2).

Block alignment: ``block_id = doc_int // block_span`` with one GLOBAL span
for all terms.  This has two scale properties:

1. no per-term ``row_number`` window is needed (a per-term window would
   funnel each hot term through one task); block assignment is a pure
   column expression and the groupBy(term, block_id) keys are bounded by
   ``block_span`` postings — skew is capped by construction;
2. blocks of different terms cover the SAME doc ranges, so the WAND
   kernel can process one doc-range at a time via a cogroup on block_id —
   doc-at-a-time scoring without a global posting sort.

Encode/decode are vectorized numpy inside Arrow-batched pandas UDFs —
no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import DEFAULT_CONFIG, EngineConfig

#: docs per aligned block range (power of two keeps div/mod cheap)
DEFAULT_BLOCK_SPAN = 1024


# ---------------------------------------------------------------------------
# VByte codec (vectorized numpy)
# ---------------------------------------------------------------------------

def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array: 7 data bits per byte, high bit set on the
    LAST byte of each value (classic VByte)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value = number of 7-bit chunks (min 1); computed
    # with a shift loop over chunks — float log2 is unsafe at the 64-bit
    # edge and this loop runs at most 9 times regardless of array size.
    lens = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        lens += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    total = int(lens.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(lens)          # index AFTER each value's last byte
    starts = ends - lens
    # fill bytes least-significant-first
    maxlen = int(lens.max())
    work = v.copy()
    for i in range(maxlen):
        mask = lens > i
        idx = starts[mask] + i
        out[idx] = (work[mask] & np.uint64(0x7F)).astype(np.uint8)
        work[mask] >>= np.uint64(7)
    out[ends - 1] |= 0x80           # terminator bit on last byte
    return out.tobytes()


def vbyte_decode(buf: bytes) -> np.ndarray:
    """Decode back to uint64. Vectorized: terminator bits mark value ends."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = np.nonzero(b & 0x80)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    lens = ends - starts + 1
    data = (b & 0x7F).astype(np.uint64)
    vals = np.zeros(ends.size, dtype=np.uint64)
    maxlen = int(lens.max())
    for i in range(maxlen):
        mask = lens > i
        vals[mask] |= data[starts[mask] + i] << np.uint64(7 * i)
    return vals


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    d = np.asarray(sorted_vals, dtype=np.uint64).copy()
    d[1:] = d[1:] - d[:-1]
    return d


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=np.uint64), dtype=np.uint64)


# ---------------------------------------------------------------------------
# block builders
# ---------------------------------------------------------------------------

BLOCK_SCHEMA = (
    "term string, block_id long, n int, first_doc long, last_doc long, "
    "max_tf int, docs_vb binary, tfs_vb binary"
)

DL_BLOCK_SCHEMA = "block_id long, n int, docs_vb binary, dls_vb binary"


def _encode_term_block(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_int")
    docs = pdf["doc_int"].to_numpy(dtype=np.uint64)
    tfs = pdf["tf"].to_numpy(dtype=np.uint64)
    return pd.DataFrame(
        {
            "term": [pdf["term"].iloc[0]],
            "block_id": [int(pdf["block_id"].iloc[0])],
            "n": [len(docs)],
            "first_doc": [int(docs[0])],
            "last_doc": [int(docs[-1])],
            "max_tf": [int(tfs.max())],
            "docs_vb": [vbyte_encode(delta_encode(docs))],
            "tfs_vb": [vbyte_encode(tfs)],
        }
    )


def build_block_postings(
    postings: DataFrame,
    block_span: int = DEFAULT_BLOCK_SPAN,
) -> DataFrame:
    """postings(term, doc_int, tf) -> one row per (term, block)."""
    with_block = postings.withColumn(
        "block_id", (F.col("doc_int") / F.lit(block_span)).cast("long")
    )
    return with_block.select("term", "block_id", "doc_int", "tf").groupBy(
        "term", "block_id"
    ).applyInPandas(_encode_term_block, BLOCK_SCHEMA)


def _encode_dl_block(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_int")
    docs = pdf["doc_int"].to_numpy(dtype=np.uint64)
    dls = pdf["length"].to_numpy(dtype=np.uint64)
    return pd.DataFrame(
        {
            "block_id": [int(pdf["block_id"].iloc[0])],
            "n": [len(docs)],
            "docs_vb": [vbyte_encode(delta_encode(docs))],
            "dls_vb": [vbyte_encode(dls)],
        }
    )


def build_dl_blocks(docs: DataFrame, block_span: int = DEFAULT_BLOCK_SPAN) -> DataFrame:
    """docs(doc_int, length) -> aligned doc-length blocks for the WAND
    kernel's dl lookups (avoids a postings⋈docs shuffle at query time)."""
    with_block = docs.withColumn(
        "block_id", (F.col("doc_int") / F.lit(block_span)).cast("long")
    )
    return with_block.select("block_id", "doc_int", "length").groupBy(
        "block_id"
    ).applyInPandas(_encode_dl_block, DL_BLOCK_SCHEMA)


def decode_block(docs_vb: bytes, tfs_vb: bytes) -> tuple[np.ndarray, np.ndarray]:
    return delta_decode(vbyte_decode(docs_vb)), vbyte_decode(tfs_vb)


# ---------------------------------------------------------------------------
# persistence (the compressed serving layout)
# ---------------------------------------------------------------------------

def write_block_index(
    blocks: DataFrame,
    dl_blocks: DataFrame,
    out_dir: str,
    term_buckets: int = 32,
) -> None:
    """Persist the compressed serving index.

    Blocks are partitioned by ``tbucket = hash(term) % term_buckets`` so a
    query touching T terms scans at most T buckets (partition pruning —
    the columnar analog of the reference's vocabulary offset pointers),
    and sorted within partitions by (term, block_id) for row-group
    locality."""
    import os

    (
        blocks.withColumn("tbucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int"))
        .repartition(term_buckets, "tbucket")
        .sortWithinPartitions("term", "block_id")
        .write.mode("overwrite")
        .partitionBy("tbucket")
        .parquet(os.path.join(out_dir, "blocks"))
    )
    dl_blocks.write.mode("overwrite").parquet(os.path.join(out_dir, "dl_blocks"))


def read_block_index(spark, out_dir: str) -> tuple[DataFrame, DataFrame]:
    import os

    blocks = spark.read.parquet(os.path.join(out_dir, "blocks")).drop("tbucket")
    dl_blocks = spark.read.parquet(os.path.join(out_dir, "dl_blocks"))
    return blocks, dl_blocks
