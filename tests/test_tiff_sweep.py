"""Real-encoder sweep for the TIFF (IFD0) decoder: every payload is
produced by the in-container libtiff (TIFFClientOpen memory sink via
ctypes) and — the supported compressions all being lossless — the
source raster is the ground truth. Covers both byte orders (mode "w" /
"wb"), Compression 1/5/32773 (LZW with the early-change schedule and
horizontal Predictor 2), PhotometricInterpretation 0/1/2/3, gray depths
1/4/8/16, RGB 8/16, RGBA with ExtraSamples (alpha ignored), 256-entry
16-bit ColorMaps, and multi-strip layouts. Skipped wholesale when
libtiff.so.6 is absent."""

import ctypes
import random

import pytest

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (
    _decode_image_tiff,
    decode_image,
)

_READ = ctypes.CFUNCTYPE(ctypes.c_ssize_t, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_ssize_t)
_WRITE = ctypes.CFUNCTYPE(ctypes.c_ssize_t, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_ssize_t)
_SEEK = ctypes.CFUNCTYPE(ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int)
_CLOSE = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p)
_SIZE = ctypes.CFUNCTYPE(ctypes.c_uint64, ctypes.c_void_p)
_MAP = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_uint64))
_UNMAP = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64)


def _libtiff():
    try:
        t = ctypes.CDLL("libtiff.so.6")
    except OSError:
        return None
    t.TIFFClientOpen.restype = ctypes.c_void_p
    t.TIFFClientOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p,
                                 _READ, _WRITE, _SEEK, _CLOSE, _SIZE, _MAP, _UNMAP]
    t.TIFFWriteScanline.restype = ctypes.c_int
    t.TIFFWriteScanline.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_uint32, ctypes.c_uint16]
    t.TIFFClose.argtypes = [ctypes.c_void_p]
    # TIFFSetField is variadic: leave argtypes unset, pass typed values
    return t


def libtiff_encode(rows, row_len, fields, big_endian=False):
    """Encode scanline rows via libtiff into memory. `fields` is a list
    of (tag, value-or-tuple) where tuples are splatted for variadic
    tags (ColorMap's three arrays, ExtraSamples' count+pointer)."""
    t = _libtiff()
    buf = bytearray()
    pos = [0]

    def _read(_h, p, n):
        d = bytes(buf[pos[0]:pos[0] + n])
        ctypes.memmove(p, d, len(d))
        pos[0] += len(d)
        return len(d)

    def _write(_h, p, n):
        d = ctypes.string_at(p, n)
        end = pos[0] + n
        if len(buf) < end:
            buf.extend(b"\0" * (end - len(buf)))
        buf[pos[0]:end] = d
        pos[0] = end
        return n

    def _seek(_h, off, whence):
        if whence == 0:
            pos[0] = off
        elif whence == 1:
            pos[0] += off
        else:
            pos[0] = len(buf) + off
        return pos[0]

    cbs = (_READ(_read), _WRITE(_write), _SEEK(_seek),
           _CLOSE(lambda _h: 0), _SIZE(lambda _h: len(buf)),
           _MAP(lambda _h, a, b: 0), _UNMAP(lambda _h, a, b: None))
    tif = t.TIFFClientOpen(b"mem", b"wb" if big_endian else b"w", None, *cbs)
    assert tif
    for tag, val in fields:
        if isinstance(val, tuple):
            t.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag), *val)
        else:
            t.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag), val)
    for y, row in enumerate(rows):
        rb = ctypes.create_string_buffer(bytes(row), row_len)
        assert t.TIFFWriteScanline(tif, rb, y, 0) == 1
    t.TIFFClose(tif)
    return bytes(buf)


def _luma(r, g, b):
    return (r * 19595 + g * 38470 + b * 7471) >> 16


def _base_fields(w, h, comp, rps):
    return [(256, ctypes.c_uint32(w)), (257, ctypes.c_uint32(h)),
            (259, ctypes.c_int(comp)), (278, ctypes.c_uint32(rps)),
            (284, ctypes.c_int(1))]


def _check(payload, w, h, gray):
    got = decode_image(payload, use_pil=False)
    assert (got["width"], got["height"], got["n_pixels"]) == (w, h, w * h)
    assert got["mean_sample"] == pytest.approx(sum(gray) / len(gray), abs=1e-12)
    tw, th = min(8, w), min(8, h)
    want = bytes(gray[(ty * h // th) * w + (tx * w // tw)]
                 for ty in range(th) for tx in range(tw))
    assert got["thumbnail"] == want


@pytest.mark.skipif(_libtiff() is None, reason="libtiff.so.6 not present")
@pytest.mark.parametrize("comp", [1, 5, 32773])
@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("bits", [1, 4, 8, 16])
@pytest.mark.parametrize("photometric", [0, 1])
def test_tiff_gray_vs_libtiff(comp, big_endian, bits, photometric):
    w, h, rps = 23, 17, 5
    random.seed(comp + bits + photometric)
    maxv = (1 << bits) - 1
    fields = _base_fields(w, h, comp, rps) + [
        (258, ctypes.c_int(bits)), (262, ctypes.c_int(photometric)),
        (277, ctypes.c_int(1))]
    if comp == 5 and bits >= 8:
        fields.append((317, ctypes.c_int(2)))  # horizontal predictor
    vals = [[random.randrange(maxv + 1) for _ in range(w)] for _ in range(h)]
    if bits == 16:
        rows = [b"".join(v.to_bytes(2, "little") for v in r) for r in vals]
        row_len = 2 * w
    elif bits == 8:
        rows = [bytes(r) for r in vals]
        row_len = w
    else:
        per = 8 // bits
        row_len = (w * bits + 7) // 8
        rows = []
        for r in vals:
            rb = bytearray(row_len)
            for x, v in enumerate(r):
                rb[x // per] |= v << (8 - bits * (x % per + 1))
            rows.append(bytes(rb))
    payload = libtiff_encode(rows, row_len, fields, big_endian)
    if bits == 16:
        gray = [(255 - (v >> 8)) if photometric == 0 else (v >> 8)
                for r in vals for v in r]
    else:
        scale = 255 // maxv if bits < 8 else 1
        gray = [((maxv - v) if photometric == 0 else v) * scale
                for r in vals for v in r]
    _check(payload, w, h, gray)


@pytest.mark.skipif(_libtiff() is None, reason="libtiff.so.6 not present")
@pytest.mark.parametrize("comp", [1, 5, 32773])
@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("kind", ["rgb8", "rgb16", "rgba8", "pal8"])
def test_tiff_color_vs_libtiff(comp, big_endian, kind):
    w, h, rps = 19, 13, 4
    random.seed(comp + len(kind))
    fields = _base_fields(w, h, comp, rps)
    if comp == 5:
        fields.append((317, ctypes.c_int(2)))
    if kind == "pal8":
        n = 256
        cms = [(ctypes.c_uint16 * n)(*[random.randrange(65536) for _ in range(n)])
               for _ in range(3)]
        fields += [(258, ctypes.c_int(8)), (262, ctypes.c_int(3)),
                   (277, ctypes.c_int(1)), (320, tuple(cms))]
        vals = [[random.randrange(n) for _ in range(w)] for _ in range(h)]
        rows = [bytes(r) for r in vals]
        row_len = w
        gray = [_luma(cms[0][i] >> 8, cms[1][i] >> 8, cms[2][i] >> 8)
                for r in vals for i in r]
    elif kind == "rgba8":
        extras = (ctypes.c_uint16 * 1)(2)  # unassociated alpha
        fields += [(258, ctypes.c_int(8)), (262, ctypes.c_int(2)),
                   (277, ctypes.c_int(4)),
                   (338, (ctypes.c_int(1), extras))]
        vals = [[random.randrange(256) for _ in range(4 * w)] for _ in range(h)]
        rows = [bytes(r) for r in vals]
        row_len = 4 * w
        gray = [_luma(r[4 * x], r[4 * x + 1], r[4 * x + 2])
                for r in vals for x in range(w)]
    else:
        depth = 16 if kind == "rgb16" else 8
        fields += [(258, ctypes.c_int(depth)), (262, ctypes.c_int(2)),
                   (277, ctypes.c_int(3))]
        vals = [[random.randrange(1 << depth) for _ in range(3 * w)]
                for _ in range(h)]
        if depth == 16:
            rows = [b"".join(v.to_bytes(2, "little") for v in r) for r in vals]
            row_len = 6 * w
            gray = [_luma(r[3 * x] >> 8, r[3 * x + 1] >> 8, r[3 * x + 2] >> 8)
                    for r in vals for x in range(w)]
        else:
            rows = [bytes(r) for r in vals]
            row_len = 3 * w
            gray = [_luma(r[3 * x], r[3 * x + 1], r[3 * x + 2])
                    for r in vals for x in range(w)]
    payload = libtiff_encode(rows, row_len, fields, big_endian)
    _check(payload, w, h, gray)


@pytest.mark.skipif(_libtiff() is None, reason="libtiff.so.6 not present")
def test_tiff_multipage_decodes_first_ifd():
    """Subsequent IFDs are separate PAGES, not animation frames: IFD0 is
    the still image and extra pages must not raise (unlike GIF/WebP
    animation). libtiff writes a second directory via
    TIFFWriteDirectory between pages."""
    t = _libtiff()
    t.TIFFWriteDirectory = t.TIFFWriteDirectory
    t.TIFFWriteDirectory.restype = ctypes.c_int
    t.TIFFWriteDirectory.argtypes = [ctypes.c_void_p]
    buf = bytearray()
    pos = [0]

    def _read(_h, p, n):
        d = bytes(buf[pos[0]:pos[0] + n])
        ctypes.memmove(p, d, len(d))
        pos[0] += len(d)
        return len(d)

    def _write(_h, p, n):
        d = ctypes.string_at(p, n)
        end = pos[0] + n
        if len(buf) < end:
            buf.extend(b"\0" * (end - len(buf)))
        buf[pos[0]:end] = d
        pos[0] = end
        return n

    def _seek(_h, off, whence):
        if whence == 0:
            pos[0] = off
        elif whence == 1:
            pos[0] += off
        else:
            pos[0] = len(buf) + off
        return pos[0]

    cbs = (_READ(_read), _WRITE(_write), _SEEK(_seek),
           _CLOSE(lambda _h: 0), _SIZE(lambda _h: len(buf)),
           _MAP(lambda _h, a, b: 0), _UNMAP(lambda _h, a, b: None))
    tif = t.TIFFClientOpen(b"mem", b"w", None, *cbs)
    random.seed(5)
    w, h = 16, 12
    pages = []
    for page in range(2):
        for tag, val in _base_fields(w, h, 1, h) + [
                (258, ctypes.c_int(8)), (262, ctypes.c_int(1)),
                (277, ctypes.c_int(1))]:
            t.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag), val)
        rows = [bytes(random.randrange(256) for _ in range(w)) for _ in range(h)]
        pages.append(rows)
        for y, row in enumerate(rows):
            rb = ctypes.create_string_buffer(row, w)
            assert t.TIFFWriteScanline(tif, rb, y, 0) == 1
        if page == 0:
            assert t.TIFFWriteDirectory(ctypes.c_void_p(tif)) == 1
    t.TIFFClose(tif)
    gray = [v for r in pages[0] for v in r]   # page 0, not page 1
    _check(bytes(buf), w, h, gray)


def test_tiff_unsupported_raises():
    with pytest.raises(ValueError, match="BigTIFF"):
        _decode_image_tiff(b"II\x2b\x00" + bytes(12))
    with pytest.raises(ValueError, match="not a TIFF"):
        _decode_image_tiff(b"XX\x2a\x00" + bytes(8))


@pytest.mark.skipif(_libtiff() is None, reason="libtiff.so.6 not present")
@pytest.mark.parametrize("comp", [1, 5, 32773])
@pytest.mark.parametrize("big_endian", [False, True])
def test_tiff_builder_conformant_per_libtiff(comp, big_endian):
    """The mm_tiff_decode_stats BUILDER (encode_tiff_gray, including its
    literal-mode LZW and PackBits writers) must produce files libtiff
    itself reads back byte-identically — so the registered query's
    containers are conformant TIFF, not merely self-consistent."""
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (
        encode_tiff_gray,
    )

    t = _libtiff()
    t.TIFFReadScanline.restype = ctypes.c_int
    t.TIFFReadScanline.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_uint32, ctypes.c_uint16]
    random.seed(comp)
    w, h = 23, 17
    raster = bytes(random.randrange(256) for _ in range(w * h))
    payload = encode_tiff_gray(raster, w, h, photometric=1, compression=comp,
                               big_endian=big_endian, rows_per_strip=4)
    buf = bytearray(payload)
    pos = [0]

    def _read(_h, p, n):
        d = bytes(buf[pos[0]:pos[0] + n])
        ctypes.memmove(p, d, len(d))
        pos[0] += len(d)
        return len(d)

    def _seek(_h, off, whence):
        if whence == 0:
            pos[0] = off
        elif whence == 1:
            pos[0] += off
        else:
            pos[0] = len(buf) + off
        return pos[0]

    cbs = (_READ(_read), _WRITE(lambda _h, p, n: 0), _SEEK(_seek),
           _CLOSE(lambda _h: 0), _SIZE(lambda _h: len(buf)),
           _MAP(lambda _h, a, b: 0), _UNMAP(lambda _h, a, b: None))
    tif = t.TIFFClientOpen(b"mem", b"r", None, *cbs)
    assert tif, "libtiff refused the builder's container"
    rb = ctypes.create_string_buffer(w)
    rows = []
    for y in range(h):
        assert t.TIFFReadScanline(tif, rb, y, 0) == 1
        rows.append(bytes(rb.raw[:w]))
    t.TIFFClose(tif)
    assert b"".join(rows) == raster
