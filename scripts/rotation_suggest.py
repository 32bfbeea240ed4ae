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
    for p in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        with open(p) as f:
            recorded |= set(json.load(f))
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


if __name__ == "__main__":
    main()
