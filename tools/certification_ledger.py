"""Regenerate PARITY.md's "Certification ledger" section (round-8
verdict item 6): one row per registry query with the last round the
DRIVER certified it green (CORRECTNESS_r{N}.json rows+schema+hash all
true; rows-only entries count their weaker rows+schema check) and
whether it sits in the current first-50 driver window.

Usage: python tools/certification_ledger.py   # rewrites the section
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MARKER = "## Certification ledger"


def build_ledger() -> str:
    from parcial_bigdata_spark.plans.registry import ORACLES, QUERIES

    window = list(QUERIES)[:50]
    last: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        rnum = int(re.search(r"r(\d+)", Path(path).name).group(1))
        rounds.append(rnum)
        data = json.loads(Path(path).read_text())
        for name, res in data.items():
            ok = (
                res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match", True)
            )
            if ok and name in QUERIES:
                last[name] = max(last.get(name, 0), rnum)
    next_round = (max(rounds) if rounds else 0) + 1
    wset = set(window)
    lines = [
        MARKER,
        "",
        f"Per-query last driver-certified round (from CORRECTNESS_r*.json; "
        f"regenerate with `python tools/certification_ledger.py`).  "
        f"`in window` marks the first-50 queries() entries the r{next_round} "
        "driver run will certify.  Queries marked `rows-only` have no SQL "
        "oracle by design (approximate operators with exact audit twins).",
        "",
        "| registry query | last driver-green | in window |",
        "|---|---|---|",
    ]
    for name in QUERIES:
        cert = f"r{last[name]}" if name in last else "never"
        if name not in ORACLES:
            cert += " (rows-only)"
        lines.append(
            f"| {name} | {cert} | {'yes' if name in wset else ''} |"
        )
    never = [n for n in QUERIES if n not in last]
    stale = sorted(
        (n for n in last), key=lambda n: last[n]
    )
    oldest = [n for n in stale if last[n] == last[stale[0]]] if stale else []
    lines += [
        "",
        f"Summary: {len(QUERIES)} registry queries, "
        f"{len(never)} never driver-certified "
        f"({sum(1 for n in never if n in wset)} of them in the current "
        f"window), oldest certification r{last[stale[0]] if stale else '-'} "
        f"({', '.join(oldest[:6])}{'…' if len(oldest) > 6 else ''}).",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    parity = REPO / "PARITY.md"
    text = parity.read_text()
    section = build_ledger()
    if MARKER in text:
        head = text[: text.index(MARKER)].rstrip("\n")
        text = head + "\n\n" + section
    else:
        text = text.rstrip("\n") + "\n\n" + section
    parity.write_text(text)
    print(f"wrote {MARKER!r} section ({len(section.splitlines())} lines)")


if __name__ == "__main__":
    main()
