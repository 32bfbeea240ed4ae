#!/usr/bin/env python
"""Bit-exactness sweep of the pure-Python TIFF (IFD0) decoder vs real
libtiff encodes (TIFFClientOpen memory sink via ctypes). All supported
compressions are lossless, so the source raster is the ground truth.
Wider-matrix twin of tests/test_tiff_sweep.py: both byte orders,
Compression 1/5 (+Predictor 2)/32773, photometric 0/1/2/3, gray depths
1/4/8/16, RGB 8/16, RGBA ExtraSamples, many RowsPerStrip values.

Usage: python scripts/tiff_sweep.py [--quick]
"""
from __future__ import annotations

import ctypes
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_tiff_sweep import _base_fields, _luma, libtiff_encode  # noqa: E402
from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (  # noqa: E402
    decode_image,
)


def main() -> int:
    quick = "--quick" in sys.argv
    sizes = [(23, 17), (16, 16), (1, 1), (64, 40)]
    if not quick:
        sizes += [(130, 70), (129, 129), (7, 127), (255, 3)]
    strips = (5,) if quick else (1, 5, 1000)
    tot = bad = 0
    for (w, h) in sizes:
        for comp in (1, 5, 32773):
            for big_endian in (False, True):
                for rps in strips:
                    for kind in ("gray1", "gray4", "gray8", "gray16",
                                 "white8", "rgb8", "rgb16", "rgba8", "pal8"):
                        random.seed(w * h + comp + rps + len(kind))
                        fields = _base_fields(w, h, comp, min(rps, h))
                        if comp == 5 and "1" not in kind and "4" not in kind[-2:]:
                            fields.append((317, ctypes.c_int(2)))
                        if kind.startswith("gray") or kind == "white8":
                            bits = int(kind[4:]) if kind.startswith("gray") else 8
                            photometric = 0 if kind == "white8" else 1
                            maxv = (1 << bits) - 1
                            fields += [(258, ctypes.c_int(bits)),
                                       (262, ctypes.c_int(photometric)),
                                       (277, ctypes.c_int(1))]
                            if comp == 5 and bits < 8:
                                fields = [f for f in fields if f[0] != 317]
                            vals = [[random.randrange(maxv + 1) for _ in range(w)]
                                    for _ in range(h)]
                            if bits == 16:
                                rows = [b"".join(v.to_bytes(2, "little") for v in r)
                                        for r in vals]
                                row_len = 2 * w
                                gray = [v >> 8 for r in vals for v in r]
                            elif bits == 8:
                                rows = [bytes(r) for r in vals]
                                row_len = w
                                gray = [(maxv - v) if photometric == 0 else v
                                        for r in vals for v in r]
                            else:
                                per = 8 // bits
                                row_len = (w * bits + 7) // 8
                                rows = []
                                for r in vals:
                                    rb = bytearray(row_len)
                                    for x, v in enumerate(r):
                                        rb[x // per] |= v << (8 - bits * (x % per + 1))
                                    rows.append(bytes(rb))
                                gray = [v * (255 // maxv) for r in vals for v in r]
                        elif kind == "pal8":
                            n = 256
                            cms = [(ctypes.c_uint16 * n)(
                                *[random.randrange(65536) for _ in range(n)])
                                for _ in range(3)]
                            fields += [(258, ctypes.c_int(8)), (262, ctypes.c_int(3)),
                                       (277, ctypes.c_int(1)), (320, tuple(cms))]
                            vals = [[random.randrange(n) for _ in range(w)]
                                    for _ in range(h)]
                            rows = [bytes(r) for r in vals]
                            row_len = w
                            gray = [_luma(cms[0][i] >> 8, cms[1][i] >> 8,
                                          cms[2][i] >> 8) for r in vals for i in r]
                        elif kind == "rgba8":
                            extras = (ctypes.c_uint16 * 1)(2)
                            fields += [(258, ctypes.c_int(8)), (262, ctypes.c_int(2)),
                                       (277, ctypes.c_int(4)),
                                       (338, (ctypes.c_int(1), extras))]
                            vals = [[random.randrange(256) for _ in range(4 * w)]
                                    for _ in range(h)]
                            rows = [bytes(r) for r in vals]
                            row_len = 4 * w
                            gray = [_luma(r[4 * x], r[4 * x + 1], r[4 * x + 2])
                                    for r in vals for x in range(w)]
                        else:
                            depth = 16 if kind == "rgb16" else 8
                            fields += [(258, ctypes.c_int(depth)),
                                       (262, ctypes.c_int(2)), (277, ctypes.c_int(3))]
                            vals = [[random.randrange(1 << depth)
                                     for _ in range(3 * w)] for _ in range(h)]
                            if depth == 16:
                                rows = [b"".join(v.to_bytes(2, "little") for v in r)
                                        for r in vals]
                                row_len = 6 * w
                                gray = [_luma(r[3 * x] >> 8, r[3 * x + 1] >> 8,
                                              r[3 * x + 2] >> 8)
                                        for r in vals for x in range(w)]
                            else:
                                rows = [bytes(r) for r in vals]
                                row_len = 3 * w
                                gray = [_luma(r[3 * x], r[3 * x + 1], r[3 * x + 2])
                                        for r in vals for x in range(w)]
                        payload = libtiff_encode(rows, row_len, fields, big_endian)
                        tot += 1
                        try:
                            got = decode_image(payload, use_pil=False)
                            ok = ((got["width"], got["height"]) == (w, h)
                                  and abs(got["mean_sample"]
                                          - sum(gray) / len(gray)) < 1e-12)
                        except (ValueError, IndexError) as exc:
                            ok = False
                            print(f"RAISE {w}x{h} c{comp} be{big_endian} "
                                  f"rps{rps} {kind}: {exc}")
                        if not ok:
                            bad += 1
                            print(f"MISMATCH {w}x{h} c{comp} be{big_endian} "
                                  f"rps{rps} {kind}")
    print(f"cases: {tot}  mismatches: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
