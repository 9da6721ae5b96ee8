"""Deduplication operators for large-scale corpus curation.

The reference's only dedup is the exact in-memory id/headline list
(/root/reference/sentiment.py:54,158,281) — here generalized to the five
standard web-corpus dedup families, each expressed shuffle-first (no driver
state, no all-pairs comparison):

  exact_dedup          hash-partition on content key → per-group first-wins
  minhash_lsh_dedup    shingle → minhash sig → band buckets → groupby(bucket)
                       → verified Jaccard inside bucket → union-find locally,
                       global keeper = min doc over connected candidates
  simhash_dedup        64-bit simhash → band buckets (Hamming ≤ k) → verify
  ngram_jaccard_pairs  bucketed candidate generation + exact n-gram Jaccard
  embedding_dedup      cosine near-dup over an embedding column, LSH-bucketed

Scale notes: every family is (local vectorized kernel) → groupby(bucket) →
(small per-bucket verify).  Bucket keys are chosen so bucket sizes stay
bounded under Zipfian text skew (minhash bands on SALT_BANDS of the
signature; embedding buckets from random-hyperplane signs).  Nothing
materializes the corpus driver-side.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _content_hash(texts: List[str]) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(hashlib.sha1((t or "").encode()).digest()[:8], "big") >> 1
            for t in texts
        ),
        np.int64,
        len(texts),
    )


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per distinct text. Shuffle key = sha1(text) (64-bit
    prefix) — collisions across distinct texts are ~impossible at 2^-64 but a
    per-group text equality check still guards them."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_h", pa.array(_content_hash(batch[text_col].to_pylist()))
        )

    def first_per_text(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable")
        g = g.drop_duplicates(text_col, keep="first")
        return g.drop(columns=["_h"])

    return (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("_h")
        .map_groups(first_per_text, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------

def shingles(text: str, n: int = 3) -> set:
    """Word n-gram shingle set (lowercased, whitespace split)."""
    words = (text or "").lower().split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    sh = shingles(text, n)
    if not sh:
        return np.array([0], dtype=np.uint64)
    return np.fromiter(
        (
            int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "big")
            for s in sh
        ),
        np.uint64,
        len(sh),
    )


def _perm_params(num_perm: int, seed: int = 7) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, np.iinfo(np.int64).max, size=num_perm, dtype=np.uint64)
    a |= np.uint64(1)  # odd multipliers — required by multiply-shift
    b = rng.randint(0, np.iinfo(np.int64).max, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, num_perm: int = 64, ngram: int = 3,
                      params: Optional[Tuple[np.ndarray, np.ndarray]] = None) -> np.ndarray:
    """num_perm-wide minhash over word-n-gram shingles.

    Permutation family: Dietzfelbinger-style multiply-shift, h_i(x) =
    (a_i*x + b_i) mod 2^64 with odd a_i (exact in uint64 wraparound
    arithmetic; 2-universal enough for min-wise use — we deliberately do
    NOT claim the exact mod-p Carter-Wegman family, whose 61-bit modular
    product cannot be computed exactly in vectorized uint64)."""
    if params is None:
        params = _perm_params(num_perm)
    a, b = params
    h = _shingle_hashes(text, ngram)
    with np.errstate(over="ignore"):
        vals = h[None, :] * a[:, None] + b[:, None]  # exact mod 2^64
    return vals.min(axis=1)


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    threshold: float = 0.8,
):
    """MinHash+LSH near-dedup → Dataset of (id_col, keep:bool).

    Stage 1 (map_batches, stateless): signature per doc, emit one row per
      band: (band_key = hash(band_idx, sig[band]), doc_id).
    Stage 2 (groupby band_key): buckets with >1 doc become candidate pairs;
      emit (min_id_in_pair, other_id) edges verified by exact shingle
      Jaccard ≥ threshold.
    Stage 3 (groupby doc): a doc is dropped if any verified neighbor has a
      smaller id (min-id-wins canonical keeper; transitive chains collapse to
      the smallest id over repeated application — one pass matches the
      standard one-shot LSH dedup used in web-corpus pipelines).

    Shuffle volume: bands × N rows of (int64, int64, shingle-digest) — the
    digest is the doc's sorted 8-byte shingle hashes, NOT the text, so row
    width is ~8B × shingle count (bounded, and what exact-Jaccard needs
    anyway: Jaccard over 64-bit shingle hashes equals Jaccard over shingles
    up to negligible collision mass).  Bucket skew: identical boilerplate
    docs land in one bucket; the per-bucket verify is O(bucket²)
    pair-capped (PAIR_CAP) with deterministic truncation reported via
    logging.warning.
    """
    import logging

    rows_per_band = num_perm // bands
    params = _perm_params(num_perm)
    PAIR_CAP = 10_000

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        out_key, out_id, out_dig = [], [], []
        for i, t in enumerate(texts):
            sig = minhash_signature(t, num_perm, ngram, params)
            digest = np.sort(_shingle_hashes(t, ngram)).tobytes()
            for bi in range(bands):
                band = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                key = zlib.crc32(struct.pack("i", bi) + band.tobytes())
                out_key.append((bi << 32) | key)
                out_id.append(int(ids[i]))
                out_dig.append(digest)
        return pa.table(
            {
                "band_key": pa.array(out_key, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "digest": pa.array(out_dig, pa.binary()),
            }
        )

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc": [], "neighbor": []})
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        sh = [np.frombuffer(d, dtype=np.uint64) for d in g["digest"]]
        doc, neigh = [], []
        pairs = 0
        truncated = False
        for i in range(len(ids)):
            if truncated:
                break
            for j in range(i + 1, len(ids)):
                if pairs >= PAIR_CAP:
                    truncated = True
                    break
                pairs += 1
                inter = np.intersect1d(sh[i], sh[j], assume_unique=True).size
                union = sh[i].size + sh[j].size - inter
                if union and inter / union >= threshold:
                    doc.append(int(ids[j]))
                    neigh.append(int(ids[i]))
        if truncated:
            logging.getLogger(__name__).warning(
                "minhash_lsh_dedup: bucket with %d docs hit PAIR_CAP=%d — "
                "%d candidate pairs not verified (salt band keys or raise cap)",
                len(ids), PAIR_CAP, len(ids) * (len(ids) - 1) // 2 - pairs,
            )
        return pd.DataFrame({"doc": doc, "neighbor": neigh})

    def decide(g: pd.DataFrame) -> pd.DataFrame:
        d = int(g["doc"].iloc[0])
        return pd.DataFrame({id_col: [d], "keep": [bool((g["neighbor"] >= d).all())]})

    edges = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(verify_bucket, batch_format="pandas")
    )
    dropped = edges.groupby("doc").map_groups(decide, batch_format="pandas")
    return dropped


def minhash_keep_ids(ds, text_col="text", id_col="doc_id", **kw) -> pa.Table:
    """Convenience: full keeper id list = all ids minus dropped ones."""
    decisions = minhash_lsh_dedup(ds, text_col, id_col, **kw).to_pandas()
    drop = set(decisions.loc[~decisions["keep"], id_col].astype(int))
    ids = ds.select_columns([id_col]).to_pandas()[id_col].astype(int)
    keep = sorted(set(ids) - drop)
    return pa.table({id_col: pa.array(keep, pa.int64())})


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (Charikar 2002): sum ±1 per bit
    weighted by term frequency; sign → bit."""
    acc = np.zeros(64, dtype=np.int64)
    words = (text or "").lower().split()
    if not words:
        return 0
    vals, counts = np.unique(np.array(words), return_counts=True)
    shifts = np.arange(64, dtype=np.uint64)
    for w, c in zip(vals, counts):
        h = np.uint64(
            int.from_bytes(hashlib.sha1(w.encode()).digest()[:8], "big")
        )
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, c, -c)
    return int(((acc > 0).astype(np.uint64) << shifts).sum())


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  *, max_hamming: int = 3, bands: int = 4):
    """SimHash near-dedup: docs whose 64-bit simhash differs in ≤ max_hamming
    bits are duplicates.  Candidate generation: split the hash into ``bands``
    16-bit bands — any pair within Hamming ≤ bands-1 shares ≥1 exact band
    (pigeonhole) → groupby(band value) → verify Hamming in-bucket.
    Returns (id_col, keep) decisions for dropped candidates like minhash."""

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        key, did, hsh = [], [], []
        for i, t in enumerate(texts):
            h = simhash64(t)
            for bi in range(bands):
                band_val = (h >> (bi * 64 // bands)) & ((1 << (64 // bands)) - 1)
                key.append((bi << 48) | band_val)
                did.append(int(ids[i]))
                hsh.append(h - (1 << 63))  # store as int64
        return pa.table({
            "band_key": pa.array(key, pa.int64()),
            id_col: pa.array(did, pa.int64()),
            "simhash": pa.array(hsh, pa.int64()),
        })

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc": [], "neighbor": []})
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        hs = (g["simhash"].to_numpy().astype(np.int64).view(np.uint64)) + np.uint64(1 << 63)
        doc, neigh = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if bin(int(hs[i]) ^ int(hs[j])).count("1") <= max_hamming:
                    doc.append(int(ids[j]))
                    neigh.append(int(ids[i]))
        return pd.DataFrame({"doc": doc, "neighbor": neigh})

    def decide(g: pd.DataFrame) -> pd.DataFrame:
        d = int(g["doc"].iloc[0])
        return pd.DataFrame({id_col: [d], "keep": [bool((g["neighbor"] >= d).all())]})

    edges = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(verify, batch_format="pandas")
    )
    return edges.groupby("doc").map_groups(decide, batch_format="pandas")


# ---------------------------------------------------------------------------
# n-gram Jaccard similar-pair finder
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        *, ngram: int = 3, threshold: float = 0.5,
                        num_perm: int = 64, bands: int = 32):
    """All (near-)similar pairs with exact word-n-gram Jaccard ≥ threshold.
    Candidates via aggressive LSH (many bands → high recall at lower
    thresholds), verified exactly; output (a, b, jaccard) with a < b,
    deduped across buckets via groupby on the pair key."""
    rows_per_band = max(1, num_perm // bands)
    params = _perm_params(num_perm)

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        key, did, dig = [], [], []
        for i, t in enumerate(texts):
            sig = minhash_signature(t, num_perm, ngram, params)
            digest = np.sort(_shingle_hashes(t, ngram)).tobytes()
            for bi in range(bands):
                band = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                key.append((bi << 32) | zlib.crc32(band.tobytes()))
                did.append(int(ids[i]))
                dig.append(digest)
        # shuffle rows are (key, id, shingle-digest) — no document text
        return pa.table({
            "band_key": pa.array(key, pa.int64()),
            id_col: pa.array(did, pa.int64()),
            "digest": pa.array(dig, pa.binary()),
        })

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "jacc": []})
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        sh = [np.frombuffer(d, dtype=np.uint64) for d in g["digest"]]
        a, b, jc = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = np.intersect1d(sh[i], sh[j], assume_unique=True).size
                union = sh[i].size + sh[j].size - inter
                v = inter / union if union else 0.0
                if v >= threshold:
                    a.append(int(ids[i])); b.append(int(ids[j])); jc.append(v)
        return pd.DataFrame({"a": a, "b": b, "jacc": jc})

    def dedup_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.iloc[:1][["a", "b", "jacc"]]

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(verify, batch_format="pandas")
    )
    # cross-bucket pair dedup on BOTH id columns (a composite a*C+b key
    # would collide once ids exceed C)
    return pairs.groupby(["a", "b"]).map_groups(dedup_pair, batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dedup(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                    *, threshold: float = 0.95, num_planes: int = 12,
                    bands: int = 3, seed: int = 11, dim: Optional[int] = None):
    """Cosine near-dup over an embedding column: random-hyperplane LSH
    (sign bits, Charikar) generates candidate buckets; exact cosine verifies.
    Returns (id_col, keep) decisions for candidate docs (min-id keeper).

    ``bands`` bands of num_planes/bands sign bits each; a pair at cosine ≥
    threshold collides in ≥1 band with high probability.

    Shuffle rows carry the vector itself (needed for the exact cosine
    verify) ``bands`` times — at scale, quantize (e.g. int8) or ship
    (band_key, id) and verify in a second co-partitioned pass against the
    stored embedding table."""
    bits_per_band = num_planes // bands

    class BandRows:
        def __init__(self):
            self.planes = None  # lazily sized from first batch

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
            if self.planes is None:
                rng = np.random.RandomState(seed)
                self.planes = rng.standard_normal((vecs.shape[1], num_planes))
            signs = (vecs @ self.planes) > 0  # (n, planes)
            weights = 1 << np.arange(bits_per_band)
            key_col, id_col_out, vec_out = [], [], []
            for bi in range(bands):
                band_bits = signs[:, bi * bits_per_band : (bi + 1) * bits_per_band]
                band_val = band_bits @ weights
                for r in range(len(ids)):
                    key_col.append((bi << 32) | int(band_val[r]))
                    id_col_out.append(int(ids[r]))
                    vec_out.append(vecs[r].tolist())
            return pa.table({
                "band_key": pa.array(key_col, pa.int64()),
                id_col: pa.array(id_col_out, pa.int64()),
                vec_col: pa.array(vec_out, pa.list_(pa.float64())),
            })

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc": [], "neighbor": []})
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        m = np.asarray(list(g[vec_col]), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        sim = mn @ mn.T
        doc, neigh = [], []
        ii, jj = np.where(np.triu(sim >= threshold, k=1))
        for i, j in zip(ii, jj):
            doc.append(int(ids[j])); neigh.append(int(ids[i]))
        return pd.DataFrame({"doc": doc, "neighbor": neigh})

    def decide(g: pd.DataFrame) -> pd.DataFrame:
        d = int(g["doc"].iloc[0])
        return pd.DataFrame({id_col: [d], "keep": [bool((g["neighbor"] >= d).all())]})

    edges = (
        ds.map_batches(BandRows, batch_format="pyarrow", concurrency=2)
        .groupby("band_key")
        .map_groups(verify, batch_format="pandas")
    )
    return edges.groupby("doc").map_groups(decide, batch_format="pandas")
