"""Deterministic synthetic Common-Crawl-style webtext corpus (FIXTURES.md §1).

Schema (BASELINE.json input_hint):
    url:     string         unique, ~5% duplicated verbatim with differing warc_ts
    warc_ts: timestamp[us]  deterministic 30-day spread derived from row index
    html:    binary         UTF-8 page from a seeded Zipfian vocabulary
    text:    string         ground-truth extractor output, computed INDEPENDENTLY
                            of stocksight_ray.functions.htmlx (the extractor must
                            reproduce it byte-identically per url)
    lang:    string         "en" ~90%, "de"/"ja" tail

Pages include every extractor edge case from FIXTURES.md: >10 <p> (cap), <p>
with nested markup (skipped), single-child-tag <p><em>..</em></p> (kept via
recursive .string), empty <p></p> (skipped), &amp;-entities, inline
https:// urls, literal "RT" substrings, "…" ellipses, trailing malformed
markup (must not crash), 0-3 Yahoo-shaped <h3> headline blocks.

Generation is per-row seeded (hash of (seed, row_index)) so any row range can
be generated independently → embarrassingly parallel via Ray for big scales.

No wall-clock, no network, no randomness outside the seeded RNG.
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta
from typing import Dict, List

import numpy as np
import pyarrow as pa

BASE_TS = datetime(2021, 1, 1, 0, 0, 0)
WINDOW_SECONDS = 30 * 24 * 3600

# Real-word head of the vocabulary: stopword-adjacent head terms to skew the
# groupby(term) shuffle, sentiment-bearing words, stemming-sensitive families,
# and the reference's required-token flavor (stock/market/shares).
_REAL_WORDS = (
    "stock stocks market markets trading trader shares share price prices "
    "earnings revenue profit profits loss losses growth investor investors "
    "company companies quarter quarterly report reports analyst analysts "
    "great good excellent amazing strong positive gains winning success "
    "bad terrible weak negative decline falling crash fears worry failure "
    "running runs runner connection connected connecting traditional "
    "nationally rational relational happiness happily generously generous "
    "buy sell hold upgrade downgrade target forecast guidance outlook "
    "technology energy finance banking retail consumer industrial chip "
    "billion million percent points index fund funds bond bonds yield "
    "news update announcement statement release conference call meeting "
    "computer computing computed computation argue argues arguing argued "
    "economy economic recession inflation rates federal reserve policy"
).split()

_DE_WORDS = "aktie markt gewinn verlust bericht anleger kurs zahlen prognose handel".split()
_JA_WORDS = "kabushiki shijou rieki sonshitsu houkoku toushika kakaku yosou torihiki keizai".split()


def _vocab(size: int = 5000) -> List[str]:
    vocab = list(_REAL_WORDS)
    i = 0
    while len(vocab) < size:
        vocab.append(f"zq{i}x{(i * 7919) % 97}")
        i += 1
    return vocab[:size]


_VOCAB = _vocab()
# Zipf weights over the vocabulary (rank-frequency ~ 1/rank).
_ZIPF_W = np.array([1.0 / (r + 1) for r in range(len(_VOCAB))])
_ZIPF_CUM = np.cumsum(_ZIPF_W / _ZIPF_W.sum())


def _row_rng(seed: int, idx: int) -> random.Random:
    h = hashlib.sha256(f"{seed}:{idx}".encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def _zipf_words(rng: random.Random, n: int, vocab: List[str]) -> List[str]:
    if vocab is _VOCAB:
        return [
            _VOCAB[int(np.searchsorted(_ZIPF_CUM, rng.random()))] for _ in range(n)
        ]
    return [vocab[min(int(rng.paretovariate(1.2)) - 1, len(vocab) - 1)] for _ in range(n)]


def _sentence(rng: random.Random, vocab: List[str], quirks: bool) -> str:
    words = _zipf_words(rng, rng.randint(4, 14), vocab)
    if quirks:
        roll = rng.random()
        if roll < 0.06:
            words.insert(rng.randrange(len(words)), "RT")
        elif roll < 0.10:
            words.insert(rng.randrange(len(words)), f"https://x{rng.randint(0,99)}.example/t")
        elif roll < 0.13:
            words.append("…")
        elif roll < 0.16:
            words[rng.randrange(len(words))] = f"#{words[0]}"
        elif roll < 0.18:
            words[rng.randrange(len(words))] = f"@user{rng.randint(0,50)}"
    return " ".join(words) + "."


def generate_rows(start: int, stop: int, seed: int = 42, dup_frac: float = 0.05) -> Dict[str, list]:
    """Generate rows [start, stop). Independent per row → parallelizable."""
    urls: List[str] = []
    tss: List[int] = []
    htmls: List[bytes] = []
    texts: List[str] = []
    langs: List[str] = []

    base_us = int((BASE_TS - datetime(1970, 1, 1)) / timedelta(microseconds=1))

    for i in range(start, stop):
        rng = _row_rng(seed, i)

        # ~dup_frac of rows duplicate the url of an earlier row (i - k) with a
        # later warc_ts (newest-wins dedup exercise). Content differs.
        dup_of = None
        if i > 10 and rng.random() < dup_frac:
            dup_of = i - rng.randint(1, 10)
        url_idx = dup_of if dup_of is not None else i
        url_rng = _row_rng(seed, url_idx)
        category = url_rng.choice(["news", "markets", "tech", "energy", "world"])
        slug = "-".join(_zipf_words(url_rng, 3, _VOCAB))
        url = f"https://site{url_idx % 50}.example/{category}/{slug}-{url_idx}"

        ts_us = base_us + (i * 1_000_003 % WINDOW_SECONDS) * 1_000_000 + (i % 1000)
        if dup_of is not None:
            ts_us += 86_400 * 1_000_000  # strictly later than the original

        lang_roll = rng.random()
        if lang_roll < 0.90:
            lang, vocab = "en", _VOCAB
        elif lang_roll < 0.95:
            lang, vocab = "de", _DE_WORDS
        else:
            lang, vocab = "ja", _JA_WORDS

        parts: List[str] = ["<html><head><title>", " ".join(_zipf_words(rng, 4, vocab)), "</title></head><body>"]
        kept: List[str] = []

        for _ in range(rng.randint(0, 3)):
            head = " ".join(w.capitalize() for w in _zipf_words(rng, rng.randint(3, 7), vocab))
            parts.append(
                f'<h3 class="Mb(5px)"><a href="/news/{rng.randint(0, 9999)}.html">'
                f'<u class="StretchedBox"><b>{head}</b></u></a></h3>'
            )

        n_para = rng.randint(1, 25)
        for p_i in range(n_para):
            roll = rng.random()
            within_cap = p_i < 10
            if roll < 0.55:  # plain single-text-node paragraph → kept (within cap)
                s = _sentence(rng, vocab, quirks=True)
                parts.append(f"<p>{s}</p>")
                if within_cap:
                    kept.append(s)
            elif roll < 0.68:  # nested markup → .string is None → skipped
                a = _sentence(rng, vocab, False)
                b = rng.choice(vocab)
                parts.append(f"<p>{a} <b>{b}</b> tail.</p>")
            elif roll < 0.78:  # single child tag → recursive .string → kept
                s = _sentence(rng, vocab, False)
                tag = rng.choice(["em", "i", "span"])
                parts.append(f"<p><{tag}>{s}</{tag}></p>")
                if within_cap:
                    kept.append(s)
            elif roll < 0.85:  # entity paragraph → kept, entities unescaped
                w1, w2 = _zipf_words(rng, 2, vocab)
                ent = rng.choice(["&amp;", "&lt;", "&gt;", "&quot;"])
                s_raw = f"{w1} {ent} {w2} profits."
                s_txt = f"{w1} {_unescape(ent)} {w2} profits."
                parts.append(f"<p>{s_raw}</p>")
                if within_cap:
                    kept.append(s_txt)
            elif roll < 0.92:  # empty paragraph → skipped
                parts.append("<p></p>")
            else:  # attribute-bearing plain paragraph → kept
                s = _sentence(rng, vocab, False)
                parts.append(f'<p class="body-{p_i}">{s}</p>')
                if within_cap:
                    kept.append(s)

        parts.append("</body></html>")
        if rng.random() < 0.03:  # trailing malformed markup; must not crash
            parts.append('<div class="unterminated')
        if rng.random() < 0.02:  # stray end tag
            parts.append("</section>")

        html = "".join(parts)
        urls.append(url)
        tss.append(ts_us)
        htmls.append(html.encode("utf-8"))
        texts.append("\n".join(kept))
        langs.append(lang)

    return {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}


def _unescape(ent: str) -> str:
    return {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"'}[ent]


_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def rows_to_table(rows: Dict[str, list]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "warc_ts": pa.array(rows["warc_ts"], pa.timestamp("us")),
            "html": pa.array(rows["html"], pa.binary()),
            "text": pa.array(rows["text"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
        },
        schema=_SCHEMA,
    )


def generate_table(num_pages: int, seed: int = 42) -> pa.Table:
    return rows_to_table(generate_rows(0, num_pages, seed))


def write_webtext_parquet(
    out_dir: str, num_pages: int, seed: int = 42, rows_per_file: int = 20_000
) -> str:
    """Write the corpus as partitioned parquet using Ray for parallelism when
    a session exists (per-row seeding → any shard generated independently)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    n_files = max(1, (num_pages + rows_per_file - 1) // rows_per_file)

    import ray

    if ray.is_initialized() and num_pages >= 4 * rows_per_file:
        import ray.data as rd

        shards = [
            (f * rows_per_file, min((f + 1) * rows_per_file, num_pages))
            for f in range(n_files)
        ]
        (
            rd.from_items([{"start": s, "stop": e} for s, e in shards])
            .map_batches(
                lambda b: rows_to_table(
                    generate_rows(int(b["start"][0]), int(b["stop"][0]), seed)
                ),
                batch_format="pandas",
                batch_size=1,
            )
            .write_parquet(out_dir)
        )
    else:
        for f in range(n_files):
            start, stop = f * rows_per_file, min((f + 1) * rows_per_file, num_pages)
            pq.write_table(
                rows_to_table(generate_rows(start, stop, seed)),
                os.path.join(out_dir, f"webtext-{f:05d}.parquet"),
            )
    return out_dir
