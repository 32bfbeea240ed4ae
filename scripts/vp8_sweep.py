#!/usr/bin/env python
"""Bit-exactness sweep of the pure-Python VP8 decoder vs libwebp.

Encodes random/gradient/flat rasters at many sizes and qualities with
the in-container libwebp (ctypes), decodes each payload with BOTH
libwebp's WebPDecodeYUV and operators/vp8.py, and requires all three
planes byte-identical. This is the functional proof behind
vp8_tables.py: no wrong table, tree, border convention or filter
constant survives it.

Usage: python scripts/vp8_sweep.py [--quick]
"""
from __future__ import annotations

import ctypes
import random
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.vp8 import (  # noqa: E402
    decode_webp_vp8,
)


def main() -> int:
    lw = ctypes.CDLL("libwebp.so.7")
    lw.WebPEncodeRGB.restype = ctypes.c_size_t
    lw.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lw.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lw.WebPFree.argtypes = [ctypes.c_void_p]

    quick = "--quick" in sys.argv
    sizes = [(16, 16), (48, 32), (17, 13), (33, 47), (64, 64), (8, 8)]
    if not quick:
        sizes += [(130, 70), (129, 129), (24, 88)]
    quals = (100, 75, 25) if quick else (100, 90, 75, 50, 25, 10, 5)
    tot = bad = 0
    for (w, h) in sizes:
        for q in quals:
            for seed in (1, 2) if quick else (1, 2, 3):
                for pat in ("random", "grad", "flat"):
                    random.seed(seed)
                    if pat == "random":
                        rgb = bytes(random.randrange(256)
                                    for _ in range(w * h * 3))
                    elif pat == "flat":
                        rgb = bytes([120, 130, 140]) * (w * h)
                    else:
                        rgb = bytes(
                            ((x * 255 // max(1, w - 1)) if c == 0
                             else (y * 255 // max(1, h - 1)) if c == 1
                             else 128)
                            for y in range(h) for x in range(w)
                            for c in range(3))
                    out = ctypes.POINTER(ctypes.c_uint8)()
                    n = lw.WebPEncodeRGB(rgb, w, h, w * 3, float(q),
                                         ctypes.byref(out))
                    payload = ctypes.string_at(out, n)
                    lw.WebPFree(out)
                    cw = ctypes.c_int(); ch = ctypes.c_int()
                    u = ctypes.POINTER(ctypes.c_uint8)()
                    v = ctypes.POINTER(ctypes.c_uint8)()
                    st = ctypes.c_int(); ust = ctypes.c_int()
                    y = lw.WebPDecodeYUV(
                        payload, len(payload), ctypes.byref(cw),
                        ctypes.byref(ch), ctypes.byref(u), ctypes.byref(v),
                        ctypes.byref(st), ctypes.byref(ust))
                    W, H, S, US = cw.value, ch.value, st.value, ust.value
                    hw, hh = (W + 1) // 2, (H + 1) // 2
                    yb = ctypes.addressof(y.contents)
                    ub = ctypes.addressof(u.contents)
                    vb = ctypes.addressof(v.contents)
                    Yg = [ctypes.string_at(yb + r * S, W) for r in range(H)]
                    Ug = [ctypes.string_at(ub + r * US, hw) for r in range(hh)]
                    Vg = [ctypes.string_at(vb + r * US, hw) for r in range(hh)]
                    lw.WebPFree(y)
                    w2, h2, Y, U, V = decode_webp_vp8(payload)
                    ok = ((w2, h2) == (W, H)
                          and all(Y[r] == Yg[r] for r in range(H))
                          and all(U[r] == Ug[r] for r in range(hh))
                          and all(V[r] == Vg[r] for r in range(hh)))
                    tot += 1
                    if not ok:
                        bad += 1
                        print(f"MISMATCH w{w} h{h} q{q} seed{seed} {pat}")
    print(f"cases: {tot}  mismatches: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
