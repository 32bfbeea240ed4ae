"""Adversarial-input hygiene for the dependency-free decoders: every
mutation (truncation, byte flips, trailing junk) of a valid payload must
either still decode or raise ValueError — never leak IndexError through
``decode_image``, never hang, and never allocate an unbounded raster
from a corrupt dimension field (the `_PIXEL_CAP` decode-DoS guard and
the PNG bounded inflate, both round 15: before the cap, a flipped TIFF
LONG or GIF/PNG size field demanded gigabytes of pure-Python work from
a tiny payload, and a small IDAT could act as a zlib bomb)."""

import random
import zlib

import pytest

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (
    _PIXEL_CAP,
    _decode_image_gif,
    _decode_image_png,
    _decode_image_tiff,
    decode_image,
    encode_tiff_gray,
)


def _valid_payloads():
    """Small valid payloads per format, built dependency-free."""
    random.seed(7)
    out = {}
    # PNM
    out["pnm"] = b"P5\n20 15\n255\n" + bytes(
        random.randrange(256) for _ in range(300))
    # PNG (gray 8, one filter-0 raster)
    import struct

    def chunk(tag, body):
        c = tag + body
        return struct.pack(">I", len(body)) + c + struct.pack(
            ">I", zlib.crc32(c))

    raw = b"".join(
        b"\x00" + bytes(random.randrange(256) for _ in range(20))
        for _ in range(15))
    out["png"] = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 20, 15, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b""))
    # TIFF (LZW + strips, big-endian)
    out["tiff"] = encode_tiff_gray(
        bytes(random.randrange(256) for _ in range(300)), 20, 15,
        compression=5, big_endian=True, rows_per_strip=4)
    return out


@pytest.mark.parametrize("fmt", ["pnm", "png", "tiff"])
def test_mutations_raise_valueerror_only(fmt):
    payload = _valid_payloads()[fmt]
    for i in range(800):
        random.seed(i)
        b = bytearray(payload)
        op = random.randrange(3)
        if op == 0:
            b = b[: random.randrange(len(b))]
        elif op == 1:
            for _ in range(random.randrange(1, 5)):
                b[random.randrange(len(b))] = random.randrange(256)
        else:
            b += bytes(random.randrange(256)
                       for _ in range(random.randrange(1, 40)))
        try:
            decode_image(bytes(b), use_pil=False)
        except ValueError:
            pass  # the only legal failure mode at the decode_image surface


def test_dimension_caps_guard_allocation():
    # GIF logical screen demanding 65535x65535 (4G pixels) from 20 bytes
    huge_gif = (b"GIF89a\xff\xff\xff\xff\x00\x00\x00"
                + b"\x2c\x00\x00\x00\x00\xff\xff\xff\xff\x00\x02\x00\x3b")
    with pytest.raises(ValueError, match="outside the supported range"):
        _decode_image_gif(huge_gif)
    # TIFF IFD declaring a raster beyond the cap
    t = bytearray(encode_tiff_gray(bytes(300), 20, 15))
    # ImageWidth is the first IFD entry's value: find tag 256 (II order)
    idx = t.find(b"\x00\x01\x04\x00\x01\x00\x00\x00")
    assert idx > 0
    t[idx + 8 : idx + 12] = (1 << 23).to_bytes(4, "little")  # x15 rows > cap
    with pytest.raises(ValueError, match="outside the supported range"):
        _decode_image_tiff(bytes(t))
    # PNG IHDR with 31-bit dimensions
    import struct

    def chunk(tag, body):
        c = tag + body
        return struct.pack(">I", len(body)) + c + struct.pack(">I", zlib.crc32(c))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 1 << 24, 1 << 24, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"\x00"))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="outside the supported range"):
        _decode_image_png(png)
    assert _PIXEL_CAP == 1 << 26


def test_png_bounded_inflate_rejects_zlib_bomb():
    """A 64 KiB IDAT claiming a 20x15 image but inflating to ~64 MB must
    be rejected by the bounded inflate, not expanded then length-checked."""
    import struct

    def chunk(tag, body):
        c = tag + body
        return struct.pack(">I", len(body)) + c + struct.pack(">I", zlib.crc32(c))

    bomb = zlib.compress(bytes(1 << 26), 9)
    assert len(bomb) < (1 << 17)
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 20, 15, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", bomb)
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="inflates beyond"):
        _decode_image_png(png)
