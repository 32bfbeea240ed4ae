"""Real-codec sweep for the JPEG DC (1/8-scale) legs: every payload is
encoded by the system libjpeg62-turbo (the r12 C harnesses under
scripts/arith_jpeg_fixtures/, compiled on the fly) and the expected
pixels come from the SAME library's jpeg_idct_1x1 decode at
scale_denom=8 (dec8.c) — the exact DC-only reconstruction our decoders
implement, so the comparison is bit-exact, not approximate.

This sweep pinned the round-15 DESCALE alignment: libjpeg computes a
block's 1/8-scale sample as ((DC*Q[0] + 4) >> 3) + 128 (round-half-up
under arithmetic shift), where the decoder previously floored
(DC*Q[0]) // 8 — one gray level off whenever DC*Q[0] mod 8 >= 4. It
covers all four entropy paths (baseline Huffman SOF0, sequential
arithmetic SOF9, progressive Huffman SOF2, progressive arithmetic
SOF10), gray and 4:2:0 color, restart intervals, and ragged edges.
Skipped wholesale when gcc or jpeglib is absent."""

import random
import shutil
import subprocess
import tempfile
import os

import pytest

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (
    decode_image,
)

_FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scripts", "arith_jpeg_fixtures")


def _build_harnesses():
    if shutil.which("gcc") is None or not os.path.exists("/usr/include/jpeglib.h"):
        return None
    d = tempfile.mkdtemp(prefix="jpegdc_")
    try:
        for src, exe in (("enc.c", "enc"), ("enc3.c", "enc3"), ("dec8.c", "dec8")):
            subprocess.run(
                ["gcc", "-O2", "-o", os.path.join(d, exe),
                 os.path.join(_FIXDIR, src), "-ljpeg"],
                check=True, capture_output=True)
    except subprocess.CalledProcessError:
        return None
    return d


_HARNESS = _build_harnesses()


def _enc(src_pnm, args, progressive=False):
    exe = os.path.join(_HARNESS, "enc3" if progressive else "enc")
    return subprocess.run([exe] + [str(a) for a in args], input=src_pnm,
                          capture_output=True, check=True).stdout


def _dec8(jpeg):
    out = subprocess.run([os.path.join(_HARNESS, "dec8")], input=jpeg,
                         capture_output=True, check=True).stdout
    parts = out.split(b"\n", 3)
    w, h = map(int, parts[1].split())
    return w, h, parts[3][:w * h]


@pytest.mark.skipif(_HARNESS is None, reason="gcc/jpeglib not available")
@pytest.mark.parametrize("w,h", [(16, 16), (17, 13), (64, 40), (33, 47), (130, 70)])
@pytest.mark.parametrize("color", [False, True])
@pytest.mark.parametrize("mode,q", [
    ("base", 90), ("base", 25), ("arith", 75), ("prog", 50), ("parith", 75),
])
def test_jpeg_dc_bit_exact_vs_libjpeg_eighth_scale(w, h, color, mode, q):
    random.seed(w * h + q + (1000 if color else 0))
    npx = w * h * (3 if color else 1)
    data = bytes(min(255, (x * 3 + random.randrange(40)) % 256) for x in range(npx))
    magic = b"P6" if color else b"P5"
    src = magic + b"\n%d %d\n255\n" % (w, h) + data
    if mode == "base":
        payload = _enc(src, [q, 0, 4])          # Huffman, restart interval 4
    elif mode == "arith":
        payload = _enc(src, [q, 1, 2])          # SOF9, restarts
    elif mode == "prog":
        payload = _enc(src, [q, 0, 2], progressive=True)   # SOF2
    else:
        payload = _enc(src, [q, 1, 0], progressive=True)   # SOF10
    bw, bh, ref = _dec8(payload)
    assert (bw, bh) == (-(-w // 8), -(-h // 8))
    got = decode_image(payload, use_pil=False)
    assert (got["width"], got["height"], got["n_pixels"]) == (w, h, w * h)
    # mean over the full DC raster: exact float equality over bw*bh
    # samples leaves no room for a single differing block value
    assert got["mean_sample"] == pytest.approx(sum(ref) / len(ref), abs=1e-12)
    # thumbnail: the decoder's nearest-neighbor rule replayed over
    # libjpeg's raster (yw == w for Y at max sampling in both layouts)
    tw, th = min(8, w), min(8, h)
    want = bytes(
        ref[min((ty * h // th) // 8, bh - 1) * bw + min((tx * w // tw) // 8, bw - 1)]
        for ty in range(th) for tx in range(tw))
    assert got["thumbnail"] == want
