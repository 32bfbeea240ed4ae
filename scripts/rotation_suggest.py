#!/usr/bin/env python
"""Suggest the next round's driver-window rotation.

The driver's correctness gate records only the first 50 entries of
``queries()``; ``queries/registry.py:_PRIORITY`` pins a static
reference-parity head and rotates the remaining slots over queries that
have never appeared in a ``CORRECTNESS_r*.json`` (judge directive,
round 4). This script does the bookkeeping: which queries have never
been recorded, which families they cover, and a suggested rotation list
sized to the free slots.

Usage: python scripts/rotation_suggest.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries import (  # noqa: E402
    registry,
)

HEAD_STATIC = 22  # rq01-20 + flagship + rq20_preagg (keepers released r11)


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recorded: set[str] = set()
    last_round: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        with open(p) as f:
            rec = set(json.load(f))
        recorded |= rec
        m = re.search(r"r(\d+)", os.path.basename(p))
        rnd = int(m.group(1)) if m else 0
        for n in rec:
            last_round[n] = max(last_round.get(n, 0), rnd)
    names = list(registry.all_specs())
    window = set(names[:50])
    never = [n for n in names if n not in recorded]
    pending = [n for n in never if n not in window]
    fam = lambda n: re.match(r"[a-z]+", n).group()
    print(f"registered: {len(names)}  recorded-ever: {len(recorded & set(names))}")
    print(f"never-recorded: {len(never)} "
          f"(of which {len(never) - len(pending)} already in the current window)")
    slots = 50 - HEAD_STATIC
    print(f"\nsuggested next window rotation ({slots} slots), family-diverse:")
    by_fam: dict[str, list[str]] = {}
    for n in pending:
        by_fam.setdefault(fam(n), []).append(n)
    suggestion: list[str] = []
    while len(suggestion) < min(slots, len(pending)):
        progressed = False
        for f in sorted(by_fam):
            if by_fam[f] and len(suggestion) < slots:
                suggestion.append(by_fam[f].pop(0))
                progressed = True
        if not progressed:
            break
    for n in suggestion:
        print(f'    "{n}",')
    leftover = sum(len(v) for v in by_fam.values())
    print(f"\nremaining after that window: {leftover}")
    # Steady state (backlog drained, registry _PRIORITY layout §2/§4):
    # the keepers and the rotation tail advance to the names the driver
    # has not re-attested for the longest — family-diverse, oldest
    # record first, skipping names already seated in the current window.
    print("\nsteady-state refresh (least-recently-recorded, per family;"
          " pick keepers from the top of each family, tail across"
          " families):")
    by_fam_old: dict[str, list[tuple[int, str]]] = {}
    for n in names:
        if n in window or n in never:
            continue
        by_fam_old.setdefault(fam(n), []).append((last_round.get(n, 0), n))
    for f in sorted(by_fam_old):
        oldest = sorted(by_fam_old[f])[:3]
        print(f"  {f}: " + ", ".join(f"{n} (r{r})" for r, n in oldest))


if __name__ == "__main__":
    main()
