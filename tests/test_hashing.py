"""hash_strings kernel contract (ADVICE r3 medium): the pandas fallback must
actually work (pandas requires a 16-byte hash_key — the round-3 15-byte key
raised ValueError on every call whenever polars was absent), and the kernel
choice is pinned per process via STOCKSIGHT_HASH_KERNEL rather than silently
varying with library availability."""

import numpy as np
import pyarrow as pa

from stocksight_ray import hashing


def test_kernel_pinned_and_named():
    assert hashing.kernel_name() in ("polars", "pandas")
    # 16-byte key constant — pandas hash_array hard-requires exactly 16 bytes
    assert len(hashing._PD_HASH_KEY.encode()) == 16


def _exercise(kernel, monkeypatch):
    monkeypatch.setattr(hashing, "_KERNEL", kernel)
    arr = pa.array(["a", None, "", "https://x.test/p?q=1", "a"], pa.string())
    h = hashing.hash_strings(arr)
    assert h.dtype == np.uint64 and len(h) == 5
    # nulls hash like '' (documented contract), equal keys collide
    assert h[1] == h[2]
    assert h[0] == h[4]
    assert h[0] != h[3]
    # deterministic across calls and across input container types
    h2 = hashing.hash_strings(["a", None, "", "https://x.test/p?q=1", "a"])
    assert (h == h2).all()
    # chunked arrays accepted
    ch = pa.chunked_array([arr[:2], arr[2:]])
    assert (hashing.hash_strings(ch) == h).all()
    return h


def test_pandas_fallback_works(monkeypatch):
    _exercise("pandas", monkeypatch)


def test_polars_kernel_works(monkeypatch):
    if not hashing._HAVE_POLARS:  # pragma: no cover
        import pytest

        pytest.skip("polars absent in this environment")
    _exercise("polars", monkeypatch)


def test_rk_batch_null_vs_empty_text_distinct():
    """ADVICE r3: a null text must NOT produce the same row key as an empty
    string for the same (key, ts) — they are different rows, not byte-dups."""
    import pyarrow as pa

    from stocksight_ray.pipelines.ingest import _rk_batch

    batch = pa.table({
        "url": pa.array(["u", "u"]),
        "warc_ts": pa.array([1, 1], pa.int64()).cast(pa.timestamp("s")),
        "text": pa.array(["", None], pa.string()),
    })
    out = _rk_batch(batch, "url", "warc_ts")
    rks = out["rk"].to_pylist()
    assert rks[0] != rks[1]


def test_custom_seed_decorrelates_pandas(monkeypatch):
    monkeypatch.setattr(hashing, "_KERNEL", "pandas")
    a = hashing.hash_strings(["x", "y"], seed=1)
    b = hashing.hash_strings(["x", "y"], seed=2)
    assert not (a == b).all()
    # equal keys still collide under any one seed
    c = hashing.hash_strings(["x", "x"], seed=7)
    assert c[0] == c[1]


def test_band_keys_validates_config():
    """bands x rows_per_band must fit the signature width, and zero-row
    bands (bands > num_perm) are a config error, not a degenerate
    all-collide band key."""
    import pytest

    from stocksight_ray.pipelines.dedup import _band_keys

    sig = np.zeros((8, 3), np.uint64)
    assert _band_keys(sig, bands=4, rows_per_band=2).shape == (3, 4)
    with pytest.raises(ValueError):
        _band_keys(sig, bands=16, rows_per_band=1)
    with pytest.raises(ValueError):
        _band_keys(sig, bands=4, rows_per_band=0)
