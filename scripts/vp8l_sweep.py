#!/usr/bin/env python
"""Bit-exactness sweep of the pure-Python VP8L + ALPH decoders vs libwebp.

Lossless leg: encodes random/gradient/photo/flat rasters at many sizes
with WebPEncodeLosslessRGB and requires our gray/thumbnail contract to
equal the same formula over libwebp's own RGBA decode, pixel for pixel.
Alpha leg: encodes RGBA (lossy color + ALPH alpha) with WebPEncodeRGBA
and requires our ALPH plane to equal WebPDecodeRGBA's A channel byte
for byte, covering both raw and headerless-VP8L alpha compression.

This sweep is what pinned the round-15 decoder fixes (code-length-code
order with 16 between 5 and 6; color-cache info before the meta-prefix
bit): only real encoder output discriminates those, because the older
hand fixtures were emitted by a writer sharing the same assumptions.

Usage: python scripts/vp8l_sweep.py [--quick]
"""
from __future__ import annotations

import ctypes
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (  # noqa: E402
    _decode_image_webp_lossless,
    _decode_webp_alpha,
)
from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.vp8 import (  # noqa: E402
    parse_webp_chunks,
)


def main() -> int:
    lw = ctypes.CDLL("libwebp.so.7")
    lw.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lw.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lw.WebPEncodeRGBA.restype = ctypes.c_size_t
    lw.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lw.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lw.WebPFree.argtypes = [ctypes.c_void_p]

    def ref_rgba(payload: bytes) -> bytes:
        cw = ctypes.c_int()
        ch = ctypes.c_int()
        ptr = lw.WebPDecodeRGBA(payload, len(payload),
                                ctypes.byref(cw), ctypes.byref(ch))
        buf = ctypes.string_at(ptr, cw.value * ch.value * 4)
        lw.WebPFree(ptr)
        return buf

    quick = "--quick" in sys.argv
    sizes = [(16, 16), (32, 24), (17, 13), (48, 32), (64, 64)]
    if not quick:
        sizes += [(130, 70), (129, 129), (8, 8), (33, 47), (24, 88)]
    seeds = (1,) if quick else (1, 2, 3)
    tot = bad = 0

    for (w, h) in sizes:
        for pat in ("random", "grad", "photo", "flat"):
            for seed in seeds:
                random.seed(seed * 1000 + w + h)
                if pat == "random":
                    rgb = bytes(random.randrange(256)
                                for _ in range(w * h * 3))
                elif pat == "flat":
                    rgb = bytes([120, 130, 140]) * (w * h)
                elif pat == "grad":
                    rgb = bytes(
                        ((x * 255 // max(1, w - 1)) if c == 0
                         else (y * 255 // max(1, h - 1)) if c == 1 else 128)
                        for y in range(h) for x in range(w)
                        for c in range(3))
                else:
                    rgb = bytes(
                        min(255, max(0, (x * 3 + y * 2
                                         + random.randrange(24)) % 256))
                        for y in range(h) for x in range(w)
                        for c in range(3))
                out = ctypes.POINTER(ctypes.c_uint8)()
                n = lw.WebPEncodeLosslessRGB(rgb, w, h, w * 3,
                                             ctypes.byref(out))
                payload = ctypes.string_at(out, n)
                lw.WebPFree(out)
                refb = ref_rgba(payload)
                mean_ref = sum(
                    (refb[i * 4] * 19595 + refb[i * 4 + 1] * 38470
                     + refb[i * 4 + 2] * 7471) >> 16
                    for i in range(w * h)) / (w * h)
                tot += 1
                try:
                    got = _decode_image_webp_lossless(payload, 8)
                    ok = (got["width"], got["height"]) == (w, h) and \
                        abs(got["mean_sample"] - mean_ref) < 1e-12
                except (ValueError, IndexError) as exc:
                    ok = False
                    print(f"RAISE L w{w} h{h} {pat} s{seed}: {exc}")
                if not ok:
                    bad += 1
                    print(f"MISMATCH L w{w} h{h} {pat} s{seed}")

    alpha_pats = ("gradx", "diag", "blocky", "random", "const")
    quals = (75.0,) if quick else (100.0, 75.0, 25.0, 5.0)
    for (w, h) in sizes:
        for pat in alpha_pats:
            for q in quals:
                random.seed(w * h + int(q))
                fn = {
                    "gradx": lambda x, y: (x * 255) // max(1, w - 1),
                    "diag": lambda x, y: min(
                        255, (x + y) * 255 // max(1, w + h - 2)),
                    "blocky": lambda x, y: 255 if (x // 8 + y // 8) % 2 else 40,
                    "random": lambda x, y: random.randrange(256),
                    "const": lambda x, y: 128,
                }[pat]
                rgba = bytes(
                    b for y in range(h) for x in range(w)
                    for b in (random.randrange(256), random.randrange(256),
                              random.randrange(256), fn(x, y)))
                out = ctypes.POINTER(ctypes.c_uint8)()
                n = lw.WebPEncodeRGBA(rgba, w, h, w * 4, q, ctypes.byref(out))
                payload = ctypes.string_at(out, n)
                lw.WebPFree(out)
                chunks = parse_webp_chunks(payload)
                if chunks["alph"] is None:
                    continue
                ref_alpha = bytes(ref_rgba(payload)[3::4])
                tot += 1
                try:
                    ours = _decode_webp_alpha(chunks["alph"], w, h)
                    ok = ours == ref_alpha
                except (ValueError, IndexError) as exc:
                    ok = False
                    print(f"RAISE A w{w} h{h} {pat} q{q}: {exc}")
                if not ok:
                    bad += 1
                    print(f"MISMATCH A w{w} h{h} {pat} q{q}")

    print(f"cases: {tot}  mismatches: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
