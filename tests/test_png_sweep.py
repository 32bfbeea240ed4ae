"""Real-encoder sweep for the PNG decoder: every payload is produced by
the in-container libpng16 (ctypes, write API with a memory sink), and
the expected pixels are the SOURCE raster itself — PNG is lossless, so
no reference decode is needed; the encoder's own filter heuristics and
interlace packing exercise the unfilter/deinterlace paths on streams we
did not author.

This applies the round-15 VP8L lesson (hand-assembled fixtures prove
self-consistency, not conformance) to the PNG leg: libpng picks per-row
filters adaptively on photo-like content — all five on the same image —
and its Adam7 writer is the conformance arbiter for the seven-pass
geometry, including the bit-packed sub-8 passes. Skipped wholesale when
libpng16.so.16 is absent."""

import ctypes
import random

import pytest

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (
    decode_image,
)

_WRITE_CB = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_size_t)
_FLUSH_CB = ctypes.CFUNCTYPE(None, ctypes.c_void_p)
_PNG_TRANSFORM_PACKING = 0x0004


def _libpng():
    try:
        png = ctypes.CDLL("libpng16.so.16")
    except OSError:
        return None
    png.png_get_header_ver.restype = ctypes.c_char_p
    png.png_get_header_ver.argtypes = [ctypes.c_void_p]
    png.png_create_write_struct.restype = ctypes.c_void_p
    png.png_create_write_struct.argtypes = [ctypes.c_char_p] + [ctypes.c_void_p] * 3
    png.png_create_info_struct.restype = ctypes.c_void_p
    png.png_create_info_struct.argtypes = [ctypes.c_void_p]
    png.png_set_write_fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, _WRITE_CB, _FLUSH_CB]
    png.png_set_IHDR.argtypes = [ctypes.c_void_p] * 2 + [ctypes.c_uint32] * 2 + [ctypes.c_int] * 5
    png.png_set_PLTE.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    png.png_set_rows.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p)]
    png.png_write_png.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    png.png_destroy_write_struct.argtypes = [ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p)]
    return png


def libpng_encode(rows, w, h, depth, color_type, interlace, palette=None):
    """Encode via libpng's write API into memory. `rows` are UNPACKED
    (one byte per sample below 8-bit — PNG_TRANSFORM_PACKING packs them;
    16-bit samples are two big-endian bytes)."""
    png = _libpng()
    ver = png.png_get_header_ver(None)
    buf = bytearray()

    def _w(_p, data, n):
        buf.extend(ctypes.string_at(data, n))

    wcb, fcb = _WRITE_CB(_w), _FLUSH_CB(lambda _p: None)
    p = png.png_create_write_struct(ver, None, None, None)
    info = png.png_create_info_struct(p)
    png.png_set_write_fn(p, None, wcb, fcb)
    png.png_set_IHDR(p, info, w, h, depth, color_type, interlace, 0, 0)
    if palette is not None:
        png.png_set_PLTE(p, info, bytes(palette), len(palette) // 3)
    row_arr = (ctypes.c_char_p * h)(*rows)
    png.png_set_rows(p, info, row_arr)
    transforms = _PNG_TRANSFORM_PACKING if depth < 8 else 0
    png.png_write_png(p, info, transforms, None)
    pp, ii = ctypes.c_void_p(p), ctypes.c_void_p(info)
    png.png_destroy_write_struct(ctypes.byref(pp), ctypes.byref(ii))
    return bytes(buf)


def _luma(r, g, b):
    return (r * 19595 + g * 38470 + b * 7471) >> 16


def _expected_gray(samples, w, h, depth, color_type, palette):
    """The decoder's documented gray contract applied to the raster."""
    out = []
    if color_type == 0:
        scale = {1: 255, 2: 85, 4: 17, 8: 1}.get(depth)
        for y in range(h):
            for x in range(w):
                v = samples[y][x]
                out.append((v >> 8) if depth == 16 else v * scale)
    elif color_type == 3:
        for y in range(h):
            for x in range(w):
                i = samples[y][x] * 3
                out.append(_luma(palette[i], palette[i + 1], palette[i + 2]))
    else:
        nch = {2: 3, 4: 2, 6: 4}[color_type]
        for y in range(h):
            for x in range(w):
                px = samples[y][x * nch:(x + 1) * nch]
                if depth == 16:
                    px = [v >> 8 for v in px]
                if color_type == 4:
                    out.append(px[0])
                else:
                    out.append(_luma(px[0], px[1], px[2]))
    return out


def _check(payload, w, h, gray):
    got = decode_image(payload, use_pil=False)
    assert (got["width"], got["height"], got["n_pixels"]) == (w, h, w * h)
    assert got["mean_sample"] == pytest.approx(sum(gray) / len(gray), abs=1e-12)
    tw, th = min(8, w), min(8, h)
    want = bytes(gray[(ty * h // th) * w + (tx * w // tw)]
                 for ty in range(th) for tx in range(tw))
    assert got["thumbnail"] == want


@pytest.mark.skipif(_libpng() is None, reason="libpng16.so.16 not present")
@pytest.mark.parametrize("w,h", [(16, 16), (33, 21), (13, 7), (64, 40), (1, 1), (2, 3)])
@pytest.mark.parametrize("depth", [1, 2, 4, 8, 16])
@pytest.mark.parametrize("interlace", [0, 1])
def test_png_gray_all_depths_vs_libpng(w, h, depth, interlace):
    random.seed(w * h + depth + interlace)
    maxv = (1 << depth) - 1
    # photo-ish content so libpng's adaptive filter picker uses several
    # filters on the same image; plus pure noise rows
    samples = [[min(maxv, ((x * 3 + y * 2 + random.randrange(3)) % (maxv + 1)))
                if y % 3 else random.randrange(maxv + 1)
                for x in range(w)] for y in range(h)]
    if depth == 16:
        rows = [b"".join(v.to_bytes(2, "big") for v in r) for r in samples]
    else:
        rows = [bytes(r) for r in samples]
    payload = libpng_encode(rows, w, h, depth, 0, interlace)
    _check(payload, w, h, _expected_gray(samples, w, h, depth, 0, None))


@pytest.mark.skipif(_libpng() is None, reason="libpng16.so.16 not present")
@pytest.mark.parametrize("w,h", [(17, 13), (32, 24), (5, 9)])
@pytest.mark.parametrize("depth", [1, 2, 4, 8])
@pytest.mark.parametrize("interlace", [0, 1])
def test_png_palette_all_depths_vs_libpng(w, h, depth, interlace):
    random.seed(w + h + depth + interlace)
    n_colors = 1 << depth if depth < 8 else 199
    palette = bytes(random.randrange(256) for _ in range(n_colors * 3))
    samples = [[random.randrange(n_colors) for _ in range(w)] for _ in range(h)]
    payload = libpng_encode([bytes(r) for r in samples], w, h, depth, 3,
                            interlace, palette=palette)
    _check(payload, w, h, _expected_gray(samples, w, h, depth, 3, palette))


@pytest.mark.skipif(_libpng() is None, reason="libpng16.so.16 not present")
@pytest.mark.parametrize("w,h", [(16, 16), (33, 21), (64, 40), (3, 2)])
@pytest.mark.parametrize("color_type", [2, 4, 6])
@pytest.mark.parametrize("depth", [8, 16])
@pytest.mark.parametrize("interlace", [0, 1])
def test_png_color_types_vs_libpng(w, h, color_type, depth, interlace):
    random.seed(w * h + color_type + depth + interlace)
    nch = {2: 3, 4: 2, 6: 4}[color_type]
    maxv = (1 << depth) - 1
    samples = [[random.randrange(maxv + 1) for _ in range(w * nch)]
               for _ in range(h)]
    if depth == 16:
        rows = [b"".join(v.to_bytes(2, "big") for v in r) for r in samples]
    else:
        rows = [bytes(r) for r in samples]
    payload = libpng_encode(rows, w, h, depth, color_type, interlace)
    _check(payload, w, h, _expected_gray(samples, w, h, depth, color_type, None))
