"""Property-based round-trips for the round-13 dependency-free decoders.

The fixed fixtures in test_round13_properties / test_multimodal pin the
specs' semantics at hand-chosen values; these hypothesis cases sweep the
parameter space — random sample payloads, widths that straddle byte
boundaries, every filter type, every predictor — and check the decoder
against DIRECT recomputation from the chosen values (not against the
encoder's inverse, except for lossless JPEG where the encoder is itself
a one-page transcription of Annex H's category/extend rules and every
fixed fixture already pins those rules independently).
"""

from __future__ import annotations

import struct
import zlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (
    decode_audio,
    encode_wav,
)

_PROP = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# --- WAV -------------------------------------------------------------------------


@_PROP
@given(
    vals=st.lists(st.integers(-32768, 32767), min_size=0, max_size=200),
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
    stereo=st.booleans(),
    junk=st.booleans(),
)
def test_wav_pcm16_roundtrip_stats(vals, rate, stereo, junk):
    ch = 2 if stereo else 1
    if stereo and len(vals) % 2:
        vals = vals[:-1]
    pcm = struct.pack(f"<{len(vals)}h", *vals)
    stt = decode_audio(encode_wav(pcm, rate, ch, 16, junk_chunk=junk))
    assert stt["n_frames"] == len(vals) // ch
    assert stt["sum_sq"] == sum(v * v for v in vals[: stt["n_frames"] * ch])
    assert stt["peak_abs"] == max(
        (abs(v) for v in vals[: stt["n_frames"] * ch]), default=0
    )
    assert stt["duration_ms"] == stt["n_frames"] * 1000 // rate


@_PROP
@given(data=st.binary(min_size=0, max_size=300))
def test_wav_pcm8_roundtrip_stats(data):
    stt = decode_audio(encode_wav(data, 16000, 1, 8))
    assert stt["n_frames"] == len(data)
    assert stt["sum_sq"] == sum((b - 128) ** 2 for b in data)
    assert stt["peak_abs"] == max((abs(b - 128) for b in data), default=0)


# --- sub-8-bit PNG ----------------------------------------------------------------


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big")
        + ctype
        + data
        + zlib.crc32(ctype + data).to_bytes(4, "big")
    )


def _encode_png_sub8(width, height, pixels, depth, filters):
    row_bytes = (width * depth + 7) // 8
    per_byte = 8 // depth
    raster = bytearray()
    prev = bytes(row_bytes)
    for y in range(height):
        packed = bytearray(row_bytes)
        for x, v in enumerate(pixels[y]):
            shift = 8 - depth * (x % per_byte + 1)
            packed[x // per_byte] |= v << shift
        f = filters[y % len(filters)]
        raster.append(f)
        for i in range(row_bytes):
            a = packed[i - 1] if i >= 1 else 0
            b = prev[i]
            c = prev[i - 1] if i >= 1 else 0
            if f == 0:
                enc = packed[i]
            elif f == 1:
                enc = (packed[i] - a) & 0xFF
            elif f == 2:
                enc = (packed[i] - b) & 0xFF
            elif f == 3:
                enc = (packed[i] - ((a + b) >> 1)) & 0xFF
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc = (packed[i] - pred) & 0xFF
            raster.append(enc)
        prev = bytes(packed)
    ihdr = struct.pack(">IIBBBBB", width, height, depth, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raster)))
        + _png_chunk(b"IEND", b"")
    )


@_PROP
@given(
    depth=st.sampled_from([1, 2, 4]),
    width=st.integers(1, 21),
    height=st.integers(1, 6),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=6),
    data=st.data(),
)
def test_png_sub8_gray_roundtrip(depth, width, height, filters, data):
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (
        _decode_image_png,
    )

    mx = (1 << depth) - 1
    pixels = [
        [data.draw(st.integers(0, mx)) for _ in range(width)]
        for _ in range(height)
    ]
    out = _decode_image_png(_encode_png_sub8(width, height, pixels, depth, filters))
    scale = 255 // mx
    flat = [v * scale for row in pixels for v in row]
    assert out["n_pixels"] == width * height
    assert out["mean_sample"] == sum(flat) / len(flat)
    # thumbnail is the full raster whenever the image fits inside 8x8
    if width <= 8 and height <= 8:
        assert out["thumbnail"] == bytes(flat)


# --- lossless JPEG (SOF3) ----------------------------------------------------------


def _jls_predict(plane, w, x, y, sel, default, fresh):
    if fresh:
        return default
    if y == 0:
        return plane[x - 1]
    if x == 0:
        return plane[(y - 1) * w]
    ra, rb, rc = (
        plane[y * w + x - 1],
        plane[(y - 1) * w + x],
        plane[(y - 1) * w + x - 1],
    )
    return {
        1: ra,
        2: rb,
        3: rc,
        4: ra + rb - rc,
        5: ra + ((rb - rc) >> 1),
        6: rb + ((ra - rc) >> 1),
        7: (ra + rb) >> 1,
    }[sel]


@_PROP
@given(
    width=st.integers(1, 10),
    height=st.integers(1, 6),
    sel=st.integers(1, 7),
    data=st.data(),
)
def test_jpeg_lossless_random_roundtrip(width, height, sel, data):
    """Random 8-bit grayscale images, every predictor: encode with a
    direct Annex-H transcription (diff per sample from the same
    prediction equations, category/extend bit layout) and require the
    decoder to recover every pixel exactly — lossless is the format's
    contract, so any state bug (predictor selection, Huffman sync,
    EXTEND sign) surfaces as a wrong pixel."""
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (
        _decode_image_jpeg_lossless,
    )

    pixels = [
        [data.draw(st.integers(0, 255)) for _ in range(width)]
        for _ in range(height)
    ]
    flat = [v for row in pixels for v in row]
    # derive diffs by the spec's prediction equations
    plane = [0] * (width * height)
    diffs = []
    for y in range(height):
        for x in range(width):
            px = _jls_predict(plane, width, x, y, sel, 128, x == 0 and y == 0)
            d = (flat[y * width + x] - px) & 0xFFFF
            if d >= 32768:
                d -= 65536  # smallest-magnitude representative mod 2^16
            diffs.append(d)
            plane[y * width + x] = flat[y * width + x]
    cats = []
    for d in diffs:
        if d == 0:
            cats.append((0, 0))
        elif d == -32768:  # SSSS=16: 32768 ≡ −32768 mod 2^16, NO raw bits
            cats.append((16, 0))
        else:
            t = abs(d).bit_length()
            cats.append((t, d if d > 0 else d + (1 << t) - 1))
    symbols = sorted({t for t, _ in cats})
    counts = bytes([0, 0, 0, len(symbols)] + [0] * 12)  # all 4-bit codes
    dht = (
        b"\xff\xc4"
        + (2 + 17 + len(symbols)).to_bytes(2, "big")
        + b"\x00"
        + counts
        + bytes(symbols)
    )
    codes = {s: (i, 4) for i, s in enumerate(symbols)}
    bits = []
    for t, r in cats:
        code, n = codes[t]
        for i in range(n - 1, -1, -1):
            bits.append((code >> i) & 1)
        if t == 16:
            continue  # SSSS=16 appends no raw bits
        for i in range(t - 1, -1, -1):
            bits.append((r >> i) & 1)
    bits += [1] * (-len(bits) % 8)
    scan = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for bit in bits[i : i + 8]:
            b = (b << 1) | bit
        scan.append(b)
        if b == 0xFF:
            scan.append(0x00)
    sof = (
        b"\xff\xc3"
        + (2 + 6 + 3).to_bytes(2, "big")
        + bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0])
    )
    sos = b"\xff\xda" + (2 + 1 + 2 + 3).to_bytes(2, "big") + bytes(
        [1, 1, 0x00, sel, 0, 0]
    )
    jpg = b"\xff\xd8" + dht + sof + sos + bytes(scan) + b"\xff\xd9"
    out = _decode_image_jpeg_lossless(jpg)
    assert out["n_pixels"] == width * height
    assert out["mean_sample"] == sum(flat) / len(flat)
    if width <= 8 and height <= 8:
        assert out["thumbnail"] == bytes(flat)


# --- sub-8-bit INTERLACED PNG (round 14) -------------------------------------------


@_PROP
@given(
    width=st.integers(1, 17),
    height=st.integers(1, 12),
    depth=st.sampled_from([1, 2, 4]),
    data=st.data(),
)
def test_png_sub8_interlaced_roundtrip(width, height, depth, data):
    """Random sub-8-bit gray images at sizes straddling every Adam7 pass
    boundary AND every per-pass byte boundary: encode interlaced (bit-
    packed per pass, PNG §7.2/§8.2) and require the decoder to recover
    every sample exactly (gray scales by 255/(2^d−1))."""
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (
        _decode_image_png,
    )

    from .test_multimodal import _make_png_adam7_sub8

    mask = (1 << depth) - 1
    pixels = [
        data.draw(st.integers(0, mask)) for _ in range(width * height)
    ]
    out = _decode_image_png(
        _make_png_adam7_sub8(width, height, pixels, depth), thumb_side=32
    )
    assert out["n_pixels"] == width * height
    scale = 255 // mask
    expected = [v * scale for v in pixels]
    assert out["mean_sample"] == sum(expected) / len(expected)
    if width <= 32 and height <= 32:
        assert list(out["thumbnail"]) == expected


# --- hierarchical JPEG (round 14) ---------------------------------------------------


@_PROP
@given(
    wb=st.integers(1, 3),
    hb=st.integers(1, 3),
    base=st.integers(40, 200),
    n_stages=st.integers(1, 2),
    use_exp=st.booleans(),
    data=st.data(),
)
def test_jpeg_hierarchical_random_pyramids(wb, hb, base, n_stages, use_exp, data):
    """Random hierarchies: a flat base stage (optionally at half
    resolution, doubled by EXP — bilinear of a constant is exact), then
    1-2 differential stages with random per-block corrections. Expected
    samples follow directly from the chosen values (clamp per stage)."""
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (
        _decode_image_jpeg_hierarchical,
    )

    from .test_multimodal import _JpegWriter

    w_px, h_px = 8 * wb, 8 * hb
    w = _JpegWriter()
    w.dqt(0, 8)
    w.dht_dc(0)
    w.dht_ac(0)
    w.dhp(w_px, h_px, [(1, 1, 1, 0)])
    if use_exp:
        # base at pixel-exact half resolution; EXP doubles both axes
        bw0, bh0 = -(-w_px // 2), -(-h_px // 2)
        w.sof0(bw0, bh0, [(1, 1, 1, 0)])
        nb0 = (-(-bw0 // 8)) * (-(-bh0 // 8))
    else:
        w.sof0(w_px, h_px, [(1, 1, 1, 0)])
        nb0 = wb * hb
    w.sos([(1, 0, 0)])
    prev = 0
    for _ in range(nb0):
        coeff = 8 * (base - 128) // 8
        w.dc_code(coeff - prev)
        prev = coeff
    w.flush_scan()
    if use_exp:
        w.exp(1, 1)
    expected = [[base] * (wb) for _ in range(hb)]  # per-block values
    for _ in range(n_stages):
        diffs = [
            [data.draw(st.integers(-40, 40)) for _ in range(wb)]
            for _ in range(hb)
        ]
        w.sof5(w_px, h_px, [(1, 1, 1, 0)])
        w.sos([(1, 0, 0)])
        for r in range(hb):
            for c in range(wb):
                w.dc_code(diffs[r][c])
                expected[r][c] = min(255, max(0, expected[r][c] + diffs[r][c]))
        w.flush_scan()  # each stage's entropy must precede the next marker
    out = _decode_image_jpeg_hierarchical(w.finish(), thumb_side=w_px)
    assert (out["width"], out["height"]) == (w_px, h_px)
    # thumb_side == width → the first row of the thumbnail is exact samples
    got_row0 = list(out["thumbnail"][:w_px])
    want_row0 = [expected[0][c // 8] for c in range(w_px)]
    assert got_row0 == want_row0
    want_mean = sum(sum(r) for r in expected) / (wb * hb)
    assert out["mean_sample"] == want_mean
