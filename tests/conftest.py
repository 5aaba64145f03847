"""Shared Spark fixture for the test suite.

One session for the whole run (session-scoped): local[4], UTC,
AQE on — the same knobs as production (session.get_spark), sized down
for test latency.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parcial_bigdata_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("pytest", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def documents(spark):
    """Tiny documents corpus with known structure: an exact dup pair, a
    near-dup pair (one word changed), and unrelated docs."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    rows = [
        (1, base, "en", "web", len(base)),
        (2, base, "en", "web", len(base)),  # exact dup of 1
        (3, near, "en", "book", len(near)),  # near dup of 1 (9/11 jaccard)
        (4, "uno dos tres cuatro cinco seis siete ocho nueve diez", "es", "web", 52),
        (5, "completely different words entirely unrelated content here now", "en", "book", 62),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
