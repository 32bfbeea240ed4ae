#!/usr/bin/env python
"""Bit-exactness sweep of the pure-Python JPEG DC (1/8-scale) decoders
vs the system libjpeg62-turbo: encode with the r12 C harnesses
(enc.c / enc3.c), take the ground truth from the SAME library's
jpeg_idct_1x1 decode at scale_denom=8 (dec8.c), and require our DC
raster's mean and thumbnail to match exactly. Wider-matrix twin of
tests/test_jpeg_dc_sweep.py.

Result (round 15): clean after aligning the DC finalization to
libjpeg's DESCALE — ((DC*Q0 + 4) >> 3) + 128 — where a plain floored
//8 fails by one gray level whenever DC*Q0 mod 8 >= 4.

Usage: python scripts/jpeg_dc_sweep.py [--quick]
"""
from __future__ import annotations

import os
import random
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (  # noqa: E402
    decode_image,
)

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "arith_jpeg_fixtures")


def main() -> int:
    d = tempfile.mkdtemp(prefix="jpegdc_")
    for src, exe in (("enc.c", "enc"), ("enc3.c", "enc3"), ("dec8.c", "dec8")):
        subprocess.run(["gcc", "-O2", "-o", os.path.join(d, exe),
                        os.path.join(FIXDIR, src), "-ljpeg"], check=True)

    def enc(src_pnm, args, progressive=False):
        exe = os.path.join(d, "enc3" if progressive else "enc")
        return subprocess.run([exe] + [str(a) for a in args], input=src_pnm,
                              capture_output=True, check=True).stdout

    def dec8(jpeg):
        out = subprocess.run([os.path.join(d, "dec8")], input=jpeg,
                             capture_output=True, check=True).stdout
        parts = out.split(b"\n", 3)
        w, h = map(int, parts[1].split())
        return w, h, parts[3][:w * h]

    quick = "--quick" in sys.argv
    sizes = [(16, 16), (17, 13), (64, 40), (33, 47), (8, 8)]
    if not quick:
        sizes += [(130, 70), (129, 129), (7, 7), (24, 88), (1, 1)]
    quals = (90, 50) if quick else (100, 90, 75, 50, 25, 10)
    tot = bad = 0
    for (w, h) in sizes:
        for color in (False, True):
            for q in quals:
                for mode in ("base", "arith", "prog", "parith"):
                    for rst in (0, 2):
                        random.seed(w * h + q + rst)
                        npx = w * h * (3 if color else 1)
                        data = bytes(min(255, (x * 3 + random.randrange(40)) % 256)
                                     for x in range(npx))
                        magic = b"P6" if color else b"P5"
                        src = magic + b"\n%d %d\n255\n" % (w, h) + data
                        if mode == "base":
                            payload = enc(src, [q, 0, rst])
                        elif mode == "arith":
                            payload = enc(src, [q, 1, rst])
                        elif mode == "prog":
                            payload = enc(src, [q, 0, rst], progressive=True)
                        else:
                            payload = enc(src, [q, 1, rst], progressive=True)
                        bw, bh, ref = dec8(payload)
                        tot += 1
                        try:
                            got = decode_image(payload, use_pil=False)
                            tw, th = min(8, w), min(8, h)
                            want = bytes(
                                ref[min((ty * h // th) // 8, bh - 1) * bw
                                    + min((tx * w // tw) // 8, bw - 1)]
                                for ty in range(th) for tx in range(tw))
                            ok = ((got["width"], got["height"]) == (w, h)
                                  and abs(got["mean_sample"]
                                          - sum(ref) / len(ref)) < 1e-12
                                  and got["thumbnail"] == want)
                        except (ValueError, IndexError) as exc:
                            ok = False
                            print(f"RAISE w{w} h{h} c{color} q{q} {mode} "
                                  f"r{rst}: {exc}")
                        if not ok:
                            bad += 1
                            print(f"MISMATCH w{w} h{h} c{color} q{q} {mode} r{rst}")
    print(f"cases: {tot}  mismatches: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
