#!/usr/bin/env python
"""Toggle-search probe: find the true VP8L header/code semantics by
differential testing against libwebp on real encoder output."""
import ctypes, os, random, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.vp8 import parse_webp_chunks
from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators import multimodal as mm

ORDER_OLD = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
ORDER_NEW = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


class Code:


    def __init__(self, lengths, rev):
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("no symbols")
        if len(used) == 1:
            self.single = used[0][1]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        self.max_len = max(ln for ln, _ in used)
        bl_count = [0] * (self.max_len + 1)
        for ln, _ in used:
            bl_count[ln] += 1
        # completeness check (libwebp rejects over/under-subscribed codes)
        total = sum(bl_count[ln] << (self.max_len - ln) for ln in range(1, self.max_len + 1))
        if total != (1 << self.max_len):
            raise ValueError("incomplete/oversubscribed code")
        next_code = [0] * (self.max_len + 1)
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        table = {}
        for sym, ln in enumerate(lengths):
            if ln:
                c = next_code[ln]
                next_code[ln] += 1
                if rev:
                    c = int(format(c, f"0{ln}b")[::-1], 2)
                table[(ln, c)] = sym
        self.table = table

    @classmethod
    def simple(cls, symbols):
        self = cls.__new__(cls)
        if len(symbols) == 1:
            self.single, self.table, self.max_len = symbols[0], None, 0
        else:
            self.single = None
            self.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
            self.max_len = 1
        return self

    def decode(self, br, rev):
        if self.single is not None:
            return self.single
        acc = 0
        for ln in range(1, self.max_len + 1):
            b = br.read_bits(1)
            if rev:
                acc |= b << (ln - 1)
            else:
                acc = (acc << 1) | b
            sym = self.table.get((ln, acc))
            if sym is not None:
                return sym
        raise ValueError("invalid code word")


class P:
    """Parameterized decoder."""

    def __init__(self, order, rev, cache_first, cap_all):
        self.order, self.rev, self.cache_first, self.cap_all = order, rev, cache_first, cap_all

    def read_code_lengths(self, br, alphabet_size):
        num_clc = 4 + br.read_bits(4)
        cl = [0] * 19
        for i in range(num_clc):
            cl[self.order[i]] = br.read_bits(3)
        clc = Code(cl, self.rev)
        if br.read_bits(1):
            nb = 2 + 2 * br.read_bits(3)
            max_tokens = 2 + br.read_bits(nb)
            if max_tokens > alphabet_size:
                raise ValueError("cap>alphabet")
        else:
            max_tokens = alphabet_size
        lengths = [0] * alphabet_size
        prev = 8
        sym = 0
        while sym < alphabet_size and max_tokens > 0:
            tok = clc.decode(br, self.rev)
            if self.cap_all:
                max_tokens -= 1
            if tok < 16:
                if not self.cap_all:
                    max_tokens -= 1
                lengths[sym] = tok
                sym += 1
                if tok:
                    prev = tok
            else:
                if tok == 16:
                    rep = 3 + br.read_bits(2)
                    fill = prev
                elif tok == 17:
                    rep = 3 + br.read_bits(3)
                    fill = 0
                else:
                    rep = 11 + br.read_bits(7)
                    fill = 0
                if sym + rep > alphabet_size:
                    raise ValueError("repeat overrun")
                for _ in range(rep):
                    lengths[sym] = fill
                    sym += 1
        return lengths

    def read_prefix_code(self, br, alphabet_size):
        if br.read_bits(1):
            num_symbols = br.read_bits(1) + 1
            first8 = br.read_bits(1)
            syms = [br.read_bits(8 if first8 else 1)]
            if num_symbols == 2:
                syms.append(br.read_bits(8))
            if any(s >= alphabet_size for s in syms):
                raise ValueError("simple sym oob")
            return Code.simple(syms)
        return Code(self.read_code_lengths(br, alphabet_size), self.rev)

    def entropy_image(self, br, width, height, is_main):
        meta = None
        meta_bits = 0
        meta_w = 0
        num_groups = 1
        cache_bits = 0

        def read_meta():
            nonlocal meta, meta_bits, meta_w, num_groups
            if br.read_bits(1):
                meta_bits = br.read_bits(3) + 2
                meta_w = mm._vp8l_subsample(width, meta_bits)
                meta_h = mm._vp8l_subsample(height, meta_bits)
                meta_img = self.entropy_image(br, meta_w, meta_h, False)
                meta = [(p >> 8) & 0xFFFF for p in meta_img]
                num_groups = max(meta) + 1

        def read_cache():
            nonlocal cache_bits
            cache_bits = br.read_bits(4) if br.read_bits(1) else 0
            if cache_bits > 11:
                raise ValueError("cache bits oob")

        if is_main:
            if self.cache_first:
                read_cache()
                read_meta()
            else:
                read_meta()
                read_cache()
        else:
            read_cache()
        cache_size = (1 << cache_bits) if cache_bits else 0
        groups = []
        for _ in range(num_groups):
            groups.append((
                self.read_prefix_code(br, 256 + 24 + cache_size),
                self.read_prefix_code(br, 256),
                self.read_prefix_code(br, 256),
                self.read_prefix_code(br, 256),
                self.read_prefix_code(br, 40),
            ))
        cache = [0] * cache_size
        n = width * height
        out = [0] * n
        pos = 0
        group = groups[0]
        rev = self.rev
        while pos < n:
            if meta is not None:
                x, y = pos % width, pos // width
                group = groups[meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
            code_g, code_r, code_b, code_a, code_d = group
            sym = code_g.decode(br, rev)
            if sym < 256:
                red = code_r.decode(br, rev)
                blue = code_b.decode(br, rev)
                alpha = code_a.decode(br, rev)
                px = (alpha << 24) | (red << 16) | (sym << 8) | blue
                out[pos] = px
                pos += 1
                if cache_size:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            elif sym < 280:
                length = mm._vp8l_lz77_value(br, sym - 256)
                dist_code = mm._vp8l_lz77_value(br, code_d.decode(br, rev))
                if dist_code > 120:
                    dist = dist_code - 120
                else:
                    dx, dy = mm._VP8L_DIST_MAP[dist_code - 1]
                    dist = dx + dy * width
                    if dist < 1:
                        dist = 1
                if dist > pos or pos + length > n:
                    raise ValueError("backref oob")
                for _ in range(length):
                    px = out[pos - dist]
                    out[pos] = px
                    pos += 1
                    if cache_size:
                        cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            else:
                out[pos] = cache[sym - 280]
                pos += 1
        return out

    def image_stream(self, br, width, height):
        transforms = []
        seen = set()
        cur_w = width
        while br.read_bits(1):
            ttype = br.read_bits(2)
            if ttype in seen:
                raise ValueError("dup transform")
            seen.add(ttype)
            if ttype in (0, 1):
                size_bits = br.read_bits(3) + 2
                sub = self.entropy_image(
                    br, mm._vp8l_subsample(cur_w, size_bits),
                    mm._vp8l_subsample(height, size_bits), False)
                transforms.append((ttype, size_bits, sub, cur_w))
            elif ttype == 2:
                transforms.append((ttype,))
            else:
                pal_size = br.read_bits(8) + 1
                deltas = self.entropy_image(br, pal_size, 1, False)
                palette = []
                prev = 0
                for d in deltas:
                    prev = mm._vp8l_add_pixels(prev, d)
                    palette.append(prev)
                if pal_size <= 2:
                    width_bits = 3
                elif pal_size <= 4:
                    width_bits = 2
                elif pal_size <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((ttype, palette, width_bits, cur_w))
                cur_w = mm._vp8l_subsample(cur_w, width_bits)
        px = self.entropy_image(br, cur_w, height, True)
        for tr in reversed(transforms):
            if tr[0] == 0:
                px = mm._vp8l_predictor_inverse(px, tr[3], height, tr[1], tr[2])
                cur_w = tr[3]
            elif tr[0] == 1:
                px = mm._vp8l_color_inverse(px, tr[3], height, tr[1], tr[2])
                cur_w = tr[3]
            elif tr[0] == 2:
                px = mm._vp8l_subtract_green_inverse(px)
            else:
                px = mm._vp8l_palette_inverse(px, cur_w, height, tr[1], tr[2], tr[3])
                cur_w = tr[3]
        return px


def main():
    lw = ctypes.CDLL("libwebp.so.7")
    for f, res, args in [
        ("WebPEncodeRGBA", ctypes.c_size_t, [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]),
        ("WebPEncodeLosslessRGB", ctypes.c_size_t, [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]),
        ("WebPEncodeLosslessRGBA", ctypes.c_size_t, [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]),
        ("WebPDecodeRGBA", ctypes.POINTER(ctypes.c_uint8), [ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]),
    ]:
        g = getattr(lw, f)
        g.restype = res
        g.argtypes = args
    lw.WebPFree.argtypes = [ctypes.c_void_p]

    cases = []  # (tag, payload, kind) kind: 'vp8l' (full file) or 'alph'
    def enc_lossless(rgb, w, h):
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lw.WebPEncodeLosslessRGB(rgb, w, h, w * 3, ctypes.byref(out))
        p = ctypes.string_at(out, n)
        lw.WebPFree(out)
        return p

    def enc_rgba(rgba, w, h, q):
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lw.WebPEncodeRGBA(rgba, w, h, w * 4, float(q), ctypes.byref(out))
        p = ctypes.string_at(out, n)
        lw.WebPFree(out)
        return p

    for (w, h) in [(16, 16), (32, 24), (64, 64), (17, 13), (130, 70), (48, 32)]:
        for pat in ("random", "grad", "photo", "flat"):
            random.seed(w + h)
            if pat == "random":
                rgb = bytes(random.randrange(256) for _ in range(w * h * 3))
            elif pat == "flat":
                rgb = bytes([120, 130, 140]) * (w * h)
            elif pat == "grad":
                rgb = bytes(((x * 255 // max(1, w - 1)) if c == 0 else (y * 255 // max(1, h - 1)) if c == 1 else 128) for y in range(h) for x in range(w) for c in range(3))
            else:
                rgb = bytes(min(255, max(0, (x * 3 + y * 2 + random.randrange(24)) % 256)) for y in range(h) for x in range(w) for c in range(3))
            cases.append((f"L-{w}x{h}-{pat}", enc_lossless(rgb, w, h), w, h, "vp8l"))
    for (w, h) in [(32, 24), (17, 13), (64, 64), (33, 47)]:
        for pat in ("gradx", "diag", "blocky"):
            random.seed(w * h)
            fn = {"gradx": lambda x, y: (x * 255) // max(1, w - 1),
                  "diag": lambda x, y: min(255, (x + y) * 255 // max(1, w + h - 2)),
                  "blocky": lambda x, y: 255 if (x // 8 + y // 8) % 2 else 40}[pat]
            rgba = bytes(b for y in range(h) for x in range(w) for b in (random.randrange(256), random.randrange(256), random.randrange(256), fn(x, y)))
            cases.append((f"A-{w}x{h}-{pat}", enc_rgba(rgba, w, h, 75), w, h, "alph"))

    def ref_rgba(pl):
        cw = ctypes.c_int(); ch = ctypes.c_int()
        r = lw.WebPDecodeRGBA(pl, len(pl), ctypes.byref(cw), ctypes.byref(ch))
        b = ctypes.string_at(r, cw.value * ch.value * 4)
        lw.WebPFree(r)
        return b

    results = {}
    for order_name, order in (("old", ORDER_OLD), ("new", ORDER_NEW)):
        for rev in (False, True):
            for cache_first in (False, True):
                for cap_all in (True, False):
                    dec = P(order, rev, cache_first, cap_all)
                    npass = 0
                    fails = []
                    for tag, pl, w, h, kind in cases:
                        refb = ref_rgba(pl)
                        try:
                            if kind == "vp8l":
                                chunks = parse_webp_chunks(pl)
                                v = chunks["vp8l"]
                                br = mm._LsbBitReader(v, 1)
                                ww = br.read_bits(14) + 1
                                hh = br.read_bits(14) + 1
                                br.read_bits(1); br.read_bits(3)
                                px = dec.image_stream(br, ww, hh)
                                got = bytes(b for p in px for b in ((p >> 16) & 255, (p >> 8) & 255, p & 255, (p >> 24) & 255))
                                ok = got == refb
                            else:
                                chunks = parse_webp_chunks(pl)
                                a = chunks["alph"]
                                if a is None or (a[0] & 3) != 1:
                                    continue
                                if (a[0] >> 2) & 3:
                                    continue  # skip filtered for structure probe
                                px = dec.image_stream.__self__  # unused
                                br = mm._LsbBitReader(a, 1)
                                px = dec.image_stream(br, w, h)
                                got = bytes((p >> 8) & 0xFF for p in px)
                                ok = got == refb[3::4]
                            if ok:
                                npass += 1
                            else:
                                fails.append(tag + ":val")
                        except Exception as e:
                            fails.append(tag + ":" + str(e)[:25])
                    results[(order_name, rev, cache_first, cap_all)] = (npass, fails)
                    print(order_name, "rev" if rev else "msb", "cacheF" if cache_first else "metaF",
                          "capAll" if cap_all else "capLit", "pass", npass, "/", len(cases),
                          ("" if npass > len(cases) - 6 else str(fails[:4])))


main()
