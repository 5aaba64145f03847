"""Local simulation of the driver's DuckDB-oracle differential check.

Runs every queries() entry at the given sf_dir on Spark AND its
oracle_sql() twin on DuckDB; compares row count, column names, and
order-insensitively sorted values (with exact match on rendered cells).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

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
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
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
            print(f"OK    {name}: {len(sdf)} rows, {el:.1f}s")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
