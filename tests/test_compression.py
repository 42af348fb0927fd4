"""VByte/delta codec: roundtrip properties (hypothesis) + block builders."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from information_retrieval_system_spark.index.compression import (
    delta_decode,
    delta_encode,
    vbyte_decode,
    vbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_vbyte_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    assert np.array_equal(vbyte_decode(vbyte_encode(a)), a)


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_delta_vbyte_roundtrip_sorted(vals):
    a = np.array(sorted(vals), dtype=np.uint64)
    enc = vbyte_encode(delta_encode(a))
    assert np.array_equal(delta_decode(vbyte_decode(enc)), a)


def test_small_values_one_byte_each():
    a = np.arange(128, dtype=np.uint64)
    assert len(vbyte_encode(a)) == 128


def test_compression_beats_fixed_width():
    # 1024 sorted doc ints with small gaps: delta+vbyte must beat 8B/doc
    rng = np.random.default_rng(42)
    docs = np.cumsum(rng.integers(1, 30, size=1024)).astype(np.uint64)
    enc = vbyte_encode(delta_encode(docs))
    assert len(enc) < docs.size * 2.1  # ~1-2 bytes per gap vs 8 fixed


def test_empty():
    assert vbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert vbyte_decode(b"").size == 0
