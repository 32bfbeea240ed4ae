"""Lossy-WebP (VP8 key frame) decoder tests.

Three BAKED fixtures pin the decode dependency-free (payloads were
encoded once with libwebp 1.2.4 WebPEncodeRGB; expected values are the
pure decoder's output at creation time, which the live sweep below
verified bit-exact against WebPDecodeYUV). The live sweep re-runs the
bit-exactness check against libwebp via ctypes whenever the shared
library is present (it is in this container), across content patterns,
odd sizes and qualities that exercise segmentation, per-segment
quantizers/filter levels, B_PRED and both 127/129 border conventions.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import random

import pytest

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (
    _decode_image_webp_lossy,
    decode_image,
)
from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.vp8 import (
    decode_webp_vp8,
)


FIXTURES = [
    (  # flat 16x16 q75
        "524946462a00000057454250565038201e0000007001009d012a10001000020034259402"
        "7401a00000f13a28a3f1185be000",
        16, 16, 126.0,
        "7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e"
        "7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e7e",
    ),
    (  # grad 24x16 q50
        "524946466800000057454250565038205c0000003004009d012a180010003ed162a64d28"
        "2623a2300801001a096c009d32847722ccc0df2c6a8a275d620000fef111019a689fda37"
        "92577be33b9097bcfbde33bcc673cf7994d0c8c5274374663c03f6602a5882fb72eccb5c"
        "d0c00000",
        24, 16, 126.3515625,
        "2529343a44484f56323641475157636a444853596369737a545863697378878e686c777d"
        "878c939a787c878d979da7ae8a8e999fa7aab4bb9a9ea9afb6b8c8cf",
    ),
    (  # rand 17x13 q90
        "524946469a01000057454250565038208e010000500b009d012a11000d003e31148842a2"
        "2121180400200304b6004e99423005b8768234d7f55c401fa81fe3bfb37bf35db17f8afe"
        "93f001fb01e9017296b93fec6ef49d355f302fdbbc907c71fe03d837f9d7f8fe000fd1d1"
        "c46f0f5f72e03c2eade00000f928de60f860207b5c86e8e43eefab5088eafb3f47e908c7"
        "86a9cce880f768a9245649e64c436b1b0fd5366e5f76bd2cecf816d7bbfed0e06cc29ffa"
        "72a6e756139bee09393e1917d5e418043b743f7c1b8ed90b55539d26c58d13f58705b017"
        "b9782716a332b7b45e8f6df20137f7f8f6cf15051ef046fb097dd547708f9b123b1cd8ec"
        "bc2db4f81eceb713f98fcae2d5d94a7fe71e77cb721f8c2c4aa88d93e2fb87e8c38fe3e6"
        "efd2e7e72a0711ef8ee9d8ffea93faffe932e19658ffdaf27fcaa3878f91d8ffff7f3229"
        "cd3395f1cfaffe913baf31c50378c469346c26ac2dbfed9fffd48b629dcfb98ffff1aaab"
        "b6e80617fc62ddd1a7e8bbaf4ee7c24e4ed5673f948aff8e8e4f667fc9b602287fe9a045"
        "6161bffd3408ac2c3786bd8d1b2e0ef47b1a365b2000",
        17, 13, 125.93212669683258,
        "63987548c65cb2918278b7a32c86727c519292b3a0983f937c7c7c6aa032a6b549574799"
        "8989e361bfba8cb6725550d26ca0bc6ea85b54c89f64b1805160906a",
    ),
]


@pytest.mark.parametrize("idx", range(len(FIXTURES)))
def test_vp8_baked_fixtures(idx):
    parts = FIXTURES[idx]
    # payload hex strings come first, then w, h, mean, then thumbnail hex
    strs = [p for p in parts if isinstance(p, str)]
    nums = [p for p in parts if not isinstance(p, str)]
    w, h, mean = nums
    # thumbnail hex is the LAST string; payload is the concatenation of
    # the preceding ones
    thumb_hex = strs[-1]
    payload = bytes.fromhex("".join(strs[:-1]))
    out = decode_image(payload, thumb_side=8, use_pil=False)
    assert (out["width"], out["height"]) == (w, h)
    assert out["n_pixels"] == w * h
    assert out["mean_sample"] == pytest.approx(mean, abs=1e-9)
    assert out["thumbnail"] == bytes.fromhex(thumb_hex)


def test_vp8_interframe_and_vp8x_raise():
    # interframe tag (low bit of the frame tag set) must raise, as must
    # a VP8X extended container -- both route to the imaging seam
    payload = bytes.fromhex("".join(
        p for p in FIXTURES[0] if isinstance(p, str))[: -len(FIXTURES[0][-1])])
    body = bytearray(payload)
    body[20] |= 1  # set the keyframe/interframe bit inside the VP8 chunk
    with pytest.raises(ValueError):
        decode_webp_vp8(bytes(body))
    vp8x = payload[:12] + b"VP8X" + (10).to_bytes(4, "little") + bytes(10)
    with pytest.raises(ValueError):
        decode_webp_vp8(vp8x)


def _libwebp():
    try:
        return ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None


@pytest.mark.skipif(_libwebp() is None, reason="libwebp.so.7 not present")
@pytest.mark.parametrize("w,h,q,pattern", [
    (16, 16, 100, "random"),
    (48, 32, 75, "random"),
    (17, 13, 10, "grad"),   # segmentation + per-segment filter levels
    (33, 47, 25, "grad"),   # filter level 63, odd dims
    (64, 64, 50, "random"),
    (24, 88, 5, "flat"),    # strong quantization, tall frame
])
def test_vp8_bit_exact_vs_libwebp(w, h, q, pattern):
    lw = _libwebp()
    lw.WebPEncodeRGB.restype = ctypes.c_size_t
    lw.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lw.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lw.WebPFree.argtypes = [ctypes.c_void_p]
    random.seed(7)
    if pattern == "random":
        rgb = bytes(random.randrange(256) for _ in range(w * h * 3))
    elif pattern == "flat":
        rgb = bytes([120, 130, 140]) * (w * h)
    else:
        rgb = bytes(
            ((x * 255 // max(1, w - 1)) if c == 0
             else (y * 255 // max(1, h - 1)) if c == 1 else 128)
            for y in range(h) for x in range(w) for c in range(3))
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lw.WebPEncodeRGB(rgb, w, h, w * 3, float(q), ctypes.byref(out))
    assert n > 0
    payload = ctypes.string_at(out, n)
    lw.WebPFree(out)
    cw = ctypes.c_int(); ch = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)(); v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uvstride = ctypes.c_int()
    y = lw.WebPDecodeYUV(payload, len(payload), ctypes.byref(cw),
                         ctypes.byref(ch), ctypes.byref(u), ctypes.byref(v),
                         ctypes.byref(stride), ctypes.byref(uvstride))
    assert y
    W, H, S, US = cw.value, ch.value, stride.value, uvstride.value
    half_w, half_h = (W + 1) // 2, (H + 1) // 2
    ybase = ctypes.addressof(y.contents)
    ubase = ctypes.addressof(u.contents)
    vbase = ctypes.addressof(v.contents)
    Yg = [ctypes.string_at(ybase + r * S, W) for r in range(H)]
    Ug = [ctypes.string_at(ubase + r * US, half_w) for r in range(half_h)]
    Vg = [ctypes.string_at(vbase + r * US, half_w) for r in range(half_h)]
    lw.WebPFree(y)
    w2, h2, Y, U, V = decode_webp_vp8(payload)
    assert (w2, h2) == (W, H)
    assert all(Y[r] == Yg[r] for r in range(H))
    assert all(U[r] == Ug[r] for r in range(half_h))
    assert all(V[r] == Vg[r] for r in range(half_h))


@pytest.mark.skipif(_libwebp() is None, reason="libwebp.so.7 not present")
def test_vp8_router_matches_direct_decode():
    # decode_image must route a lossy payload to the pure VP8 leg (no
    # Pillow in this container) and report the Y-plane stats
    payload = bytes.fromhex("".join(
        p for p in FIXTURES[2] if isinstance(p, str))[: -len(FIXTURES[2][-1])])
    via_router = decode_image(payload, thumb_side=8, use_pil=False)
    direct = _decode_image_webp_lossy(payload, thumb_side=8)
    assert via_router == direct
