"""Driver-window freshness report + next-rotation proposal.

Scans CORRECTNESS_r*.json (driver ground truth) for each query's LATEST
row, prints the staleness distribution (round of last green vs current
round), flags any red/never-rowed queries, and proposes the next
window: the N stalest latest-green oracled queries, alphabetical within
equal staleness — exactly the policy VERDICT r12 Next #5 set when the
never-rowed backlog reached zero ("keep every green ≤10 rounds old").
The r13 window in registry._DRIVER_PRIORITY was computed this way by
hand; this tool makes the computation reproducible for r14+.

Usage: python tools/staleness.py [N]   (default 50)
Prints the proposal as a ready-to-paste Python tuple body.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_integration_tool_spark import registry


def latest_rows() -> tuple[dict[str, tuple[int, dict]], int]:
    """name -> (round, row) for each query's newest CORRECTNESS row."""
    latest: dict[str, tuple[int, dict]] = {}
    rounds = []
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        for name, row in json.load(open(path)).items():
            if isinstance(row, dict):
                latest[name] = (rnd, row)
    return latest, max(rounds) if rounds else 0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    latest, cur = latest_rows()
    specs = registry.specs()
    oracled = {q for q, s in specs.items() if s.oracle is not None}

    never = sorted(set(specs) - set(latest))
    red = sorted(
        q
        for q, (_, row) in latest.items()
        if q in oracled and not (row.get("hash_match") and row.get("rows_match"))
    )
    rows_only_ok = sorted(
        q
        for q, (_, row) in latest.items()
        if q not in oracled and (row.get("spark_rows") or 0) > 0
    )

    by_round: dict[int, int] = {}
    for _, (rnd, _) in latest.items():
        by_round[rnd] = by_round.get(rnd, 0) + 1
    print(f"current round (newest file): r{cur}")
    print("latest-row distribution:", dict(sorted(by_round.items())))
    print(f"never-rowed: {len(never)}", never[:10] if never else "")
    print(f"red latest rows (oracled): {len(red)}", red[:10] if red else "")
    print(f"rows-only latest rows passing: {len(rows_only_ok)}")
    oldest = min(by_round)
    print(f"oldest green age: {cur - oldest} rounds (policy bar: ≤10)")

    # proposal: never-rowed first (backlog drains before freshness),
    # then stalest greens; oracled only — rows-only-by-design queries
    # re-prove themselves wherever they sit in the window
    ranked = sorted(
        (q for q in latest if q in oracled),
        key=lambda q: (latest[q][0], q),
    )
    proposal = (never + [q for q in ranked if q not in never])[:n]
    print(f"\nproposed next window ({len(proposal)} entries):")
    for q in proposal:
        print(f'    "{q}",')


if __name__ == "__main__":
    main()
