"""Local simulation of the driver's DuckDB-oracle differential check.

Runs every queries() entry at the given sf_dir on Spark AND its
oracle_sql() twin on DuckDB; compares row count, column names, and
order-insensitively sorted values (with exact match on rendered cells).

Usage: python tools/check_correctness.py [--py-oracle] [sf_dir] [query ...]

The three connected-component queries switch from their recursive-CTE
SQL oracle to a bounded Python union-find oracle (PY_ORACLES) when the
corpus is larger than the closure can handle (or with --py-oracle);
see the PY_ORACLES block below.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from parcial_bigdata_spark.catalog import TABLES  # noqa: E402
from parcial_bigdata_spark.session import get_spark  # noqa: E402


def _canon(df):
    """Canonical rendering: sort columns by name, then sort rows."""
    df = df[sorted(df.columns)]
    rendered = df.map(_cell)
    return rendered.sort_values(by=list(rendered.columns)).reset_index(drop=True)


def _cell(v):
    import datetime
    import math

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        # Render integral floats WITH the trailing .0 — the driver's
        # compare distinguishes int64 1791 from float64 1791.0, so a
        # DuckDB HUGEINT aggregate (→ pandas float64) vs a Spark bigint
        # must FAIL here too (round-3 q12 was masked by int-collapsing).
        return repr(v)
    if isinstance(v, (datetime.datetime,)):
        return v.isoformat()
    return str(v)


# ---------------------------------------------------------------------------
# Bounded Python oracles for the connected-component queries.
#
# The registry's SQL oracles for dedup_components / dedup_component_survivors
# / sample_leakage_safe_split use a recursive-CTE transitive closure that
# materializes SUM(|comp|^2) rows — exactly right for the sf0.01 driver gate,
# infeasible on the 622k-edge sf0.1 near-dup graph (DESIGN.md).  These twins
# compute the same answers with the non-recursive pair query (DuckDB) plus a
# Python union-find over the edge list — O(E α(E)) instead of O(Σ|comp|²) —
# so the full-registry sweep is oracle-checked at every SF.  The SQL oracles
# remain what the driver runs; the checker switches to these only when the
# corpus is past _PY_ORACLE_DOCS (or --py-oracle forces them, used by a pytest
# case that pins py-oracle == SQL-oracle at small SF).

# The pair definition is IMPORTED from the registry (the single source
# of truth the SQL oracles build on) so the checker's union-find truth
# can never drift from the oracles' pair semantics.
from parcial_bigdata_spark.plans.registry import _WS_PAIRS_SQL  # noqa: E402

_PAIRS_SQL = f"WITH {_WS_PAIRS_SQL} SELECT doc_a, doc_b FROM pairs"
_PY_ORACLE_DOCS = 2_000  # above this, the recursive closure is infeasible

# the O(n²) pair self-join is the most expensive query in the sweep and
# three py-oracles need the same labels — compute once per connection.
# Single-entry cache (most-recent connection only): the CLI flow uses one
# connection, and a bounded cache can't accumulate connections/labels if
# the module is reused long-lived.  The strong connection reference makes
# identity checks safe (a GC'd connection can't be replaced at the same
# address and silently serve another dataset's labels).
_CC_CACHE: tuple[object, dict[int, int]] | None = None


def _cc_labels(con) -> dict[int, int]:
    """Union-find (union-by-min, path compression) over the exact
    near-dup pair graph; labels every vertex IN THE GRAPH with its
    component's minimum doc_id (singletons are absent, as in the SQL
    oracle's comps CTE).  Cached per connection — the three CC-family
    py-oracles share one pair-join execution."""
    global _CC_CACHE
    if _CC_CACHE is not None and _CC_CACHE[0] is con:
        return _CC_CACHE[1]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in con.execute(_PAIRS_SQL).fetchall():
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    labels = {v: find(v) for v in parent}
    _CC_CACHE = (con, labels)
    return labels


def _assigned(con):
    """(doc_id, n_chars, comp) over the WHOLE corpus — singletons keep
    their own doc_id, mirroring the oracle's COALESCE."""
    import pandas as pd

    labels = _cc_labels(con)
    docs = con.execute("SELECT doc_id, n_chars FROM documents").df()
    comp = docs["doc_id"].map(lambda d: labels.get(d, d)).astype("int64")
    return pd.DataFrame(
        {"doc_id": docs["doc_id"], "n_chars": docs["n_chars"], "comp": comp}
    )


def _py_dedup_components(con):
    import pandas as pd

    labels = _cc_labels(con)
    items = sorted(labels.items())
    return pd.DataFrame(
        {
            "doc_id": pd.Series([k for k, _ in items], dtype="int64"),
            "comp": pd.Series([v for _, v in items], dtype="int64"),
        }
    )


def _py_component_survivors(con):
    df = _assigned(con)
    # survivor = longest text, doc_id ASC tiebreak — idxmin over the
    # (-n_chars, doc_id) lexical order, same as the SQL row_number
    df = df.sort_values(["comp", "n_chars", "doc_id"], ascending=[True, False, True])
    surv = df.groupby("comp", as_index=False).agg(
        survivor_doc_id=("doc_id", "first"),
        survivor_chars=("n_chars", "first"),
        n_members=("doc_id", "size"),
    )
    surv["n_members"] = surv["n_members"].astype("int64")
    return surv


def _py_leakage_safe_split(con):
    import hashlib

    df = _assigned(con)
    b = df["comp"].map(
        lambda c: int(hashlib.md5(str(c).encode()).hexdigest()[:4], 16) % 100
    )
    df["split"] = b.map(lambda x: "train" if x < 80 else ("val" if x < 90 else "test"))
    out = df.groupby("split", as_index=False).agg(
        n_docs=("doc_id", "size"),
        n_components=("comp", "nunique"),
        total_chars=("n_chars", "sum"),
    )
    for c in ("n_docs", "n_components", "total_chars"):
        out[c] = out[c].astype("int64")
    return out.sort_values("split").reset_index(drop=True)


def _py_component_size_hist(con):
    import pandas as pd

    df = _assigned(con)
    sizes = df.groupby("comp").size()
    hist = sizes.value_counts().sort_index()
    out = pd.DataFrame(
        {
            "component_size": hist.index.astype("int64"),
            "n_components": hist.values.astype("int64"),
        }
    )
    out["n_docs"] = (out["component_size"] * out["n_components"]).astype(
        "int64"
    )
    out["n_removable"] = (
        (out["component_size"] - 1) * out["n_components"]
    ).astype("int64")
    return out.reset_index(drop=True)


PY_ORACLES = {
    "dedup_components": _py_dedup_components,
    "dedup_component_survivors": _py_component_survivors,
    "sample_leakage_safe_split": _py_leakage_safe_split,
    "dedup_component_size_hist": _py_component_size_hist,
}


def main() -> int:
    argv = [a for a in sys.argv[1:] if a not in ("--py-oracle", "--ansi")]
    force_py = "--py-oracle" in sys.argv[1:]
    force_ansi = "--ansi" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("check-correctness")
    if force_ansi:
        # Spark 4 defaults ANSI on, but the driver may hand queries a
        # session with any conf — force it so the sweep certifies the
        # strict-mode posture explicitly (SURVEY.md §11).
        spark.conf.set("spark.sql.ansi.enabled", "true")
        print(f"ansi forced: spark.sql.ansi.enabled="
              f"{spark.conf.get('spark.sql.ansi.enabled')}")
    unknown = only - set(entrymod.queries())
    if unknown:
        # a typo'd filter must not produce a false-green '0 failures'
        print(f"unknown query name(s): {sorted(unknown)}")
        return 2
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    use_py = force_py or n_docs > _PY_ORACLE_DOCS

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(sdf)} rows, {el:.1f}s) [no oracle]")
            continue
        try:
            if use_py and name in PY_ORACLES:
                odf = PY_ORACLES[name](con)
                tag = " [py-oracle]"
            else:
                odf = con.execute(oracles[name]).df()
                tag = ""
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, odf.columns)):
            failures.append(name)
            print(f"FAIL  {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        odf.columns = [c.lower() for c in odf.columns]
        sdf.columns = [c.lower() for c in sdf.columns]
        if len(sdf) != len(odf):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(sdf)} vs {len(odf)}")
            continue
        cs, co = _canon(sdf), _canon(odf)
        if len(cs) == 0 and len(co) == 0:
            print(f"OK    {name}: 0 rows, {el:.1f}s")
            continue
        if not cs.equals(co):
            diff = (cs != co).any(axis=1)
            n_bad = int(diff.sum())
            failures.append(name)
            print(f"FAIL  {name}: {n_bad}/{len(cs)} rows differ")
            bad_idx = diff[diff].index[:3]
            for i in bad_idx:
                print(f"      spark : {cs.loc[i].to_dict()}")
                print(f"      oracle: {co.loc[i].to_dict()}")
        else:
            print(f"OK    {name}: {len(sdf)} rows, {el:.1f}s{tag}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
