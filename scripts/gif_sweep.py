#!/usr/bin/env python
"""Bit-exactness sweep of the pure-Python still-GIF decoder vs real
giflib (libgif.so.7) encodes. GIF's LZW is lossless, so the source
index raster is the ground truth; the encoder's own LZW code-width
schedule and 4-pass interlace writer are the conformance arbiters.
Wider-matrix twin of tests/test_gif_sweep.py.

Usage: python scripts/gif_sweep.py [--quick]
"""
from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_gif_sweep import _expected_gray, giflib_encode  # noqa: E402
from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (  # noqa: E402
    decode_image,
)


def main() -> int:
    quick = "--quick" in sys.argv
    sizes = [(16, 16), (23, 11), (64, 40), (1, 1), (7, 129)]
    if not quick:
        sizes += [(130, 70), (129, 129), (255, 3), (2, 2), (33, 47)]
    seeds = (1,) if quick else (1, 2, 3)
    tot = bad = 0
    for (w, h) in sizes:
        for n_colors in (2, 4, 8, 16, 32, 64, 128, 256):
            for interlace in (False, True):
                for local_map in (False, True):
                    for seed in seeds:
                        random.seed(seed * 10007 + w * h + n_colors)
                        palette = [(random.randrange(256), random.randrange(256),
                                    random.randrange(256))
                                   for _ in range(n_colors)]
                        # mix of runs (LZW-friendly) and noise
                        rows = []
                        for y in range(h):
                            if y % 2:
                                rows.append(bytes(random.randrange(n_colors)
                                                  for _ in range(w)))
                            else:
                                v = random.randrange(n_colors)
                                rows.append(bytes([v] * w))
                        payload = giflib_encode(rows, w, h, palette,
                                                interlace=interlace,
                                                local_map=local_map)
                        gray = _expected_gray(rows, palette)
                        tot += 1
                        try:
                            got = decode_image(payload, use_pil=False)
                            ok = ((got["width"], got["height"]) == (w, h)
                                  and abs(got["mean_sample"]
                                          - sum(gray) / len(gray)) < 1e-12)
                        except (ValueError, IndexError) as exc:
                            ok = False
                            print(f"RAISE w{w} h{h} n{n_colors} i{interlace} "
                                  f"l{local_map} s{seed}: {exc}")
                        if not ok:
                            bad += 1
                            print(f"MISMATCH w{w} h{h} n{n_colors} "
                                  f"i{interlace} l{local_map} s{seed}")
    print(f"cases: {tot}  mismatches: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
