"""S5: track-id file source/cache (one id per line).

Reference behavior (``/root/reference/sentiment.py:612-626`` read,
``sentiment.py:939-951`` write): a plain UTF-8 text file with one tracked
user id per line feeds the stream's track filter; the resolver loop writes
ids back to the same file as a cache.  The webtext analogue maps the loaded
ids onto the ingest admission filter (F3 ``tokens_required`` — admit only
pages mentioning a tracked id), mirroring how the reference tracks only the
listed users' posts.

The file is config-sized (thousands of lines, not corpus-scale), so the
loader reads via ``ray.data.read_text`` when a Ray session is active —
exercising the same source machinery a sharded id list would use — and
falls back to a plain local read otherwise.  S6 (scraping ids out of a
live web page) remains a documented non-goal: it requires network access
and a credential-era service with no webtext analogue.
"""

from __future__ import annotations

import os
from typing import Iterable, Tuple


def load_track_ids(path: str) -> Tuple[str, ...]:
    """Read one id per line (stripped, blanks dropped), preserving file
    order like the reference's readlines loop.  Missing file → empty tuple
    (the reference logs-and-continues on IOError)."""
    if not os.path.exists(path):
        return ()
    try:
        import ray

        if ray.is_initialized():
            import ray.data as rd

            rows = rd.read_text(path).take_all()
            ids = [r["text"].strip() for r in rows]
            return tuple(i for i in ids if i)
    except Exception:
        pass  # fall through to the local read
    with open(path, "rt", encoding="utf-8") as f:
        return tuple(u for u in (line.strip() for line in f) if u)


def save_track_ids(path: str, ids: Iterable[str]) -> int:
    """Write ids one per line (the reference's cache-write loop,
    ``sentiment.py:939-951``).  Returns the number written."""
    ids = [str(i) for i in ids]
    with open(path, "wt", encoding="utf-8") as f:
        for i in ids:
            f.write(i + "\n")
    return len(ids)


def track_filter_kwargs(path: str, min_required: int = 1) -> dict:
    """Ingest admission kwargs for a track-id file: pages must mention at
    least ``min_required`` tracked ids (F3 semantics).  An empty/missing
    file imposes no constraint, like the reference running with no
    user list."""
    ids = load_track_ids(path)
    if not ids:
        return {}
    return {"tokens_required": ids, "min_required": min_required}
