"""HTTP REST ingestion shim (S1/S2/T6) — the reference's daily fetch.

Reference: ``lambda/app.py:15-36`` — GET the upstream JSON (30 s
timeout, raise on non-2xx), keep the bytes VERBATIM, land them under a
timestamped key ``dolar-{epoch}.json``.

Spark has no native HTTP source; per SURVEY.md §2.1 this stays a thin
out-of-engine shim that lands files into the directory the (streaming)
file source watches.  The fetcher is injectable so tests run hermetic
and ``requests`` stays an optional dependency.  For PARALLEL fetching of
many URLs, ``fetch_many`` distributes over a URL DataFrame with
mapInPandas (each partition fetches its slice) — the idiomatic way to
fan out I/O without driver loops.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

Fetcher = Callable[[str], bytes]


def _default_fetcher(url: str, timeout: int = 30) -> bytes:
    try:
        import requests
    except ImportError as e:  # pragma: no cover - requests is optional
        raise NotImplementedError(
            "HTTP fetch requires the 'requests' package; pass fetcher= instead"
        ) from e
    resp = requests.get(url, timeout=timeout)
    resp.raise_for_status()
    return resp.content  # verbatim bytes, reference lambda/app.py:19


def landing_key(prefix: str = "dolar", epoch: int | None = None) -> str:
    """Timestamped landing key (T6): ``dolar-{epoch}.json``."""
    ts = int(time.time()) if epoch is None else epoch
    return f"{prefix}-{ts}.json"


def fetch_to_landing(
    url: str,
    landing_dir: str,
    prefix: str = "dolar",
    fetcher: Fetcher = _default_fetcher,
    epoch: int | None = None,
) -> dict:
    """One fetch → one verbatim bronze object (S2).  Returns the same
    summary envelope as the reference handler (``lambda/app.py:31-36``)."""
    raw = fetcher(url)
    key = landing_key(prefix, epoch)
    os.makedirs(landing_dir, exist_ok=True)
    path = os.path.join(landing_dir, key)
    # Atomic publish: a streaming file source watching this directory
    # must never list a half-written object (it would read truncated
    # bytes once, mark the path seen, and lose the fetch forever).  The
    # temp name starts with '.' so it can never match the bronze glob;
    # rename within one directory is atomic on POSIX.
    tmp = os.path.join(landing_dir, f".{key}.tmp")
    with open(tmp, "wb") as f:
        f.write(raw)
    os.replace(tmp, path)
    return {"dir": landing_dir, "key": key, "size_bytes": len(raw), "message": "stored"}


def fetch_many(urls: DataFrame, fetcher: Fetcher = _default_fetcher) -> DataFrame:
    """Distributed fetch of a URL table → (url, payload binary, error).

    mapInPandas: each executor partition fetches its URLs; failures are
    rows, not exceptions (permissive, like the reference's bad-row
    policy).  Repartition upstream to bound per-task fan-out."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for url in pdf["url"]:
                try:
                    out.append((url, fetcher(url), None))
                except Exception as e:  # permissive: error as data
                    out.append((url, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(out, columns=["url", "payload", "error"])

    return urls.mapInPandas(batches, schema="url string, payload binary, error string")
