"""Posting codec: varbyte/delta round-trip, block-max metadata, run concat
(FIXTURES.md §3 codec_cases)."""

import numpy as np
import pytest

from stocksight_ray.index.codec import (
    BLOCK_SIZE,
    block_upper_bounds,
    concat_runs,
    decode_meta,
    decode_postings,
    encode_postings,
    tf_norm,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_edges():
    v = np.array([0, 1, 127, 128, 16383, 16384, 2**31, 2**63 - 1], dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(v)), v)
    assert varbyte_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 1000])
def test_postings_roundtrip(n):
    rng = np.random.default_rng(n)
    ids = np.sort(rng.choice(2**31, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 300, n).astype(np.int64)
    dls = rng.integers(5, 500, n).astype(np.int64)
    meta_b, payload = encode_postings(ids, tfs, dls)
    di, ti = decode_postings(meta_b, payload)
    assert np.array_equal(di, ids)
    assert np.array_equal(ti, tfs)
    meta = decode_meta(meta_b)
    assert meta.size == (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert int(meta[0]["first"]) == ids[0]
    assert int(meta[-1]["last"]) == ids[-1]


def test_blockmax_is_upper_bound():
    rng = np.random.default_rng(7)
    n = 500
    ids = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, n).astype(np.int64)
    dls = rng.integers(5, 500, n).astype(np.int64)
    avgdl = 100.0
    meta_b, payload = encode_postings(ids, tfs, dls)
    meta = decode_meta(meta_b)
    norms = tf_norm(tfs, dls, avgdl)
    bounds = block_upper_bounds(meta, avgdl)
    for bi, row in enumerate(meta):
        lo, hi = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, n)
        assert bounds[bi] >= norms[lo:hi].max() - 1e-12


def test_concat_runs_equals_single_encode_decode():
    rng = np.random.default_rng(3)
    n = 700
    ids = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 9, n).astype(np.int64)
    dls = rng.integers(10, 200, n).astype(np.int64)
    cuts = [0, 100, 355, 700]
    runs = [
        encode_postings(ids[a:b], tfs[a:b], dls[a:b])
        for a, b in zip(cuts[:-1], cuts[1:])
    ]
    m, p = concat_runs(runs)
    di, ti = decode_postings(m, p)
    assert np.array_equal(di, ids)
    assert np.array_equal(ti, tfs)
