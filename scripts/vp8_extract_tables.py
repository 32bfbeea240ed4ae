"""Locate VP8 decoder constant tables in libwebp.so.7's .rodata.

Tables are normative constants of RFC 6386 (public); libwebp (BSD) carries
them as static arrays. We find them by structural signatures and verify
functionally against libwebp's own decoder in vp8_proto.py.
"""
import struct, json

data = open("/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5", "rb").read()
out = {}

# --- dequant tables: uint16 LE, len 128, monotone non-decreasing ---
def find_u16_monotone(first, last, n=128):
    hits = []
    target_first = struct.pack("<H", first)
    i = -1
    while True:
        i = data.find(target_first, i + 1)
        if i < 0:
            break
        vals = struct.unpack_from("<%dH" % n, data, i) if i + 2*n <= len(data) else None
        if not vals:
            continue
        if vals[-1] != last:
            continue
        if all(vals[k] <= vals[k+1] for k in range(n-1)):
            hits.append((i, list(vals)))
    return hits

dc_hits = find_u16_monotone(4, 157)
ac_hits = find_u16_monotone(4, 284)
print("dc candidates:", [(h[0]) for h in dc_hits])
print("ac candidates:", [(h[0]) for h in ac_hits])
if len({tuple(v) for _, v in dc_hits}) == 1:
    out["dc_q"] = dc_hits[0][1]
if len({tuple(v) for _, v in ac_hits}) == 1:
    out["ac_q"] = ac_hits[0][1]

# --- CoeffsUpdateProba: 1056 bytes, mostly 255 ---
best = None
for i in range(0, len(data) - 1056):
    if data[i] != 255 or data[i+1] != 255:
        continue
    chunk = data[i:i+1056]
    c255 = chunk.count(255)
    if c255 > 900 and all(b > 0 for b in chunk):
        # require next bytes to break the 255 run pattern (start-anchored):
        # walk back: previous byte should not be 255-heavy region start
        if best is None or c255 > best[1]:
            # anchor at the EARLIEST start of this run region
            j = i
            while j > 0 and data[j-1] == 255:
                j -= 1
            chunk2 = data[j:j+1056]
            if chunk2.count(255) > 900 and all(b > 0 for b in chunk2):
                best = (j, chunk2.count(255), chunk2)
print("update candidate:", best[0] if best else None, "count255:", best[1] if best else None)

# --- kf_bmode_prob: anchored by its known first row (RFC 6386 §11.5) ---
sig = bytes([231,120,48,89,115,113,120,152,112])
i = data.find(sig)
print("bmode offset:", i)
if i >= 0:
    out["kf_bmode"] = list(data[i:i+900])

# --- zigzag + bands ---
zz = bytes([0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15])
print("zigzag offset:", data.find(zz))
bands = bytes([0,1,2,3,6,4,5,6,6,6,6,6,6,6,6,7])
print("bands offset:", data.find(bands))

# --- CoeffsProba0: near update table typically; collect candidates around ---
if best:
    out["update_off"] = best[0]
    out["update"] = list(best[2])

json.dump(out, open("/root/repo/var/vp8_tables_raw.json", "w"))
print("saved keys:", list(out))
