"""Real-encoder sweep for the STILL-GIF decoder: every payload is
produced by the in-container giflib (libgif.so.7, ctypes, memory sink)
and — GIF's LZW being lossless — the source index raster is the ground
truth, mapped through the palette with the decoder's documented
truncating ITU-R 601-2 luma. Covers palette sizes 2..256 (every LZW
minimum code size), global vs local color tables, the 4-pass interlace,
extension-block skipping, and the animation/partial-frame rejections.
Skipped wholesale when libgif.so.7 is absent."""

import ctypes
import random

import pytest

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (
    _decode_image_gif,
    decode_image,
)

_OUT_FN = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p,
                           ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int)


class _GifColorType(ctypes.Structure):
    _fields_ = [("Red", ctypes.c_ubyte), ("Green", ctypes.c_ubyte),
                ("Blue", ctypes.c_ubyte)]


class _ColorMapObject(ctypes.Structure):
    _fields_ = [("ColorCount", ctypes.c_int), ("BitsPerPixel", ctypes.c_int),
                ("SortFlag", ctypes.c_bool),
                ("Colors", ctypes.POINTER(_GifColorType))]


def _giflib():
    try:
        g = ctypes.CDLL("libgif.so.7")
    except OSError:
        return None
    g.EGifOpen.restype = ctypes.c_void_p
    g.EGifOpen.argtypes = [ctypes.c_void_p, _OUT_FN, ctypes.POINTER(ctypes.c_int)]
    g.GifMakeMapObject.restype = ctypes.POINTER(_ColorMapObject)
    g.GifMakeMapObject.argtypes = [ctypes.c_int, ctypes.POINTER(_GifColorType)]
    g.GifFreeMapObject.argtypes = [ctypes.POINTER(_ColorMapObject)]
    g.EGifPutScreenDesc.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 4 + [ctypes.POINTER(_ColorMapObject)]
    g.EGifPutImageDesc.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 4 + [ctypes.c_bool, ctypes.POINTER(_ColorMapObject)]
    g.EGifPutLine.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    g.EGifPutComment.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    g.EGifCloseFile.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
    return g


_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def giflib_encode(index_rows, w, h, palette, interlace=False,
                  local_map=False, comment=None, extra_frame=False):
    """Encode an index raster via giflib into memory. For interlaced
    files giflib expects the rows in PASS order (the caller reorders, as
    gifsponge does)."""
    g = _giflib()
    buf = bytearray()

    def _w(_gf, data, n):
        buf.extend(ctypes.string_at(data, n))
        return n

    cb = _OUT_FN(_w)
    err = ctypes.c_int()
    n = len(palette)
    colors = (_GifColorType * n)(*[_GifColorType(*c) for c in palette])
    cmap = g.GifMakeMapObject(n, colors)
    gf = g.EGifOpen(None, cb, ctypes.byref(err))
    assert gf, err.value
    g.EGifPutScreenDesc(gf, w, h, 8, 0, None if local_map else cmap)
    if comment is not None:
        g.EGifPutComment(gf, comment)
    g.EGifPutImageDesc(gf, 0, 0, w, h, interlace, cmap if local_map else None)
    rows = (list(index_rows) if not interlace else
            [index_rows[y] for off, step in _GIF_PASSES
             for y in range(off, h, step)])
    for row in rows:
        g.EGifPutLine(gf, row, w)
    if extra_frame:
        g.EGifPutImageDesc(gf, 0, 0, w, h, False, None)
        for row in index_rows:
            g.EGifPutLine(gf, row, w)
    g.EGifCloseFile(gf, ctypes.byref(err))
    g.GifFreeMapObject(cmap)
    return bytes(buf)


def _expected_gray(index_rows, palette):
    lut = [(r * 19595 + g * 38470 + b * 7471) >> 16 for r, g, b in palette]
    return [lut[i] for row in index_rows for i in row]


def _check(payload, w, h, gray):
    got = decode_image(payload, use_pil=False)
    assert (got["width"], got["height"], got["n_pixels"]) == (w, h, w * h)
    assert got["mean_sample"] == pytest.approx(sum(gray) / len(gray), abs=1e-12)
    tw, th = min(8, w), min(8, h)
    want = bytes(gray[(ty * h // th) * w + (tx * w // tw)]
                 for ty in range(th) for tx in range(tw))
    assert got["thumbnail"] == want


@pytest.mark.skipif(_giflib() is None, reason="libgif.so.7 not present")
@pytest.mark.parametrize("w,h", [(16, 16), (23, 11), (64, 40), (1, 1), (7, 129)])
@pytest.mark.parametrize("n_colors", [2, 4, 16, 128, 256])  # GIF color tables are power-of-2 sized
@pytest.mark.parametrize("interlace", [False, True])
def test_gif_bit_exact_vs_giflib(w, h, n_colors, interlace):
    random.seed(w * h + n_colors)
    palette = [(random.randrange(256), random.randrange(256),
                random.randrange(256)) for _ in range(n_colors)]
    rows = [bytes(random.randrange(n_colors) for _ in range(w))
            for _ in range(h)]
    payload = giflib_encode(rows, w, h, palette, interlace=interlace)
    _check(payload, w, h, _expected_gray(rows, palette))


@pytest.mark.skipif(_giflib() is None, reason="libgif.so.7 not present")
def test_gif_local_map_and_extensions():
    random.seed(7)
    w, h, n = 33, 21, 32
    palette = [(random.randrange(256), random.randrange(256),
                random.randrange(256)) for _ in range(n)]
    rows = [bytes(random.randrange(n) for _ in range(w)) for _ in range(h)]
    payload = giflib_encode(rows, w, h, palette, local_map=True,
                            comment=b"a skipped extension block")
    _check(payload, w, h, _expected_gray(rows, palette))


@pytest.mark.skipif(_giflib() is None, reason="libgif.so.7 not present")
def test_gif_animated_raises_into_seam():
    random.seed(3)
    w, h, n = 16, 12, 8
    palette = [(i * 31 % 256, i * 17 % 256, i * 5 % 256) for i in range(n)]
    rows = [bytes(random.randrange(n) for _ in range(w)) for _ in range(h)]
    payload = giflib_encode(rows, w, h, palette, extra_frame=True)
    with pytest.raises(ValueError, match="animated"):
        _decode_image_gif(payload)


def test_gif_corrupt_raises():
    with pytest.raises(ValueError, match="truncated"):
        _decode_image_gif(b"GIF89a\x01\x00")
    # image descriptor promising more pixels than the LZW stream holds
    with pytest.raises(ValueError):
        _decode_image_gif(
            b"GIF89a\x10\x00\x10\x00\x80\x00\x00" + bytes(6)
            + b"\x2c\x00\x00\x00\x00\x10\x00\x10\x00\x00\x02\x01\x4c\x00\x3b")
