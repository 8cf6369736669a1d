#!/usr/bin/env python3
"""Independent reference for the GRFT1 average-hash (mm_phash pins).

Reimplements, from the documented algorithm only (Media.scala
scaladoc), the payload encode (magic, w=8+len%24, h=4+len%12, frames,
pixel = (textbyte + 31*f + i) % 256) and the 8x8 average-hash of
frame 0 (box-average cells, bit c = cell mean > mean of cell means,
empty cells = 0). Prints doc_id, phash for the pinned doc ids on
sf0.01 — the literals in Media.mmPhashSql.

Usage: python3 tools/golden_phash.py [sf_dir] [doc_id...]
       python3 tools/golden_phash.py scenes [sf_dir]   # mm_scene_cuts pins
"""
import sys

import duckdb

MODE = sys.argv[1] if len(sys.argv) > 1 and sys.argv[1] in ("scenes", "features", "frames") else None
SCENES = MODE == "scenes"
PIN_IDS = {0, 13, 250} if MODE == "features" else {0, 6, 123}
if MODE is not None:
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
else:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ids = [] if MODE is not None else ([int(x) for x in sys.argv[2:]] or [0, 7, 123])

rows = duckdb.connect().execute(
    f"SELECT doc_id, text FROM '{sf}/documents.parquet'" +
    ("" if MODE is not None else f" WHERE doc_id IN ({','.join(map(str, ids))})")
).fetchall()


def frame_phash(b, w, h, f):
    """Average-hash of frame f: pixel = (textbyte + 31*f + i) % 256."""
    px = [((b[i % len(b)] if b else 0) + 31 * f + i) % 256
          for i in range(w * h)]
    sums = [0] * 64
    counts = [0] * 64
    for y in range(h):
        cy = y * 8 // h
        for x in range(w):
            c = cy * 8 + x * 8 // w
            sums[c] += px[y * w + x]
            counts[c] += 1
    means = [sums[i] / counts[i] if counts[i] else 0.0 for i in range(64)]
    mean = sum(means) / 64.0
    hv = 0
    for i in range(64):
        if means[i] > mean:
            hv |= 1 << i
    return hv


def _decode(doc_id, text):
    """Independent GRFT1 reimplementation: full pixel buffer per doc."""
    if doc_id == 13:
        return None  # the planted corrupt payload
    frames = 1 + doc_id % 4
    b = text.encode("utf-8")
    w = 8 + len(b) % 24
    h = 4 + len(b) % 12
    px = []
    for f in range(frames):
        px.extend(((b[i % len(b)] if b else 0) + 31 * f + i) % 256
                  for i in range(w * h))
    return w, h, frames, px


if MODE == "features":
    # mm_features pins + corpus totals: per-doc (ok, width, height,
    # n_frames, n_pixels, pixel_mean, pixel_min, pixel_max, thumb_crc)
    # with thumb = 2x box downsample of frame 0, CRC32
    import zlib
    tot = dict(w=0, h=0, f=0, npx=0, mean=0, crc=0)
    mn, mx, n_bad = 255, 0, 0
    pins = {}
    for d, t in sorted(rows):
        dec = _decode(d, t)
        if dec is None:
            n_bad += 1
            if d in PIN_IDS:
                pins[d] = (False, -1, -1, -1, -1, -1, -1, -1, -1)
            continue
        w, h, frames, px = dec
        s = sum(px)
        pm, px_min, px_max = s // len(px), min(px), max(px)
        w2, h2 = w // 2, h // 2
        thumb = bytes(
            (px[(2 * y) * w + 2 * x] + px[(2 * y) * w + 2 * x + 1] +
             px[(2 * y + 1) * w + 2 * x] + px[(2 * y + 1) * w + 2 * x + 1]) // 4
            for y in range(h2) for x in range(w2))
        crc = zlib.crc32(thumb) & 0xFFFFFFFF
        tot["w"] += w; tot["h"] += h; tot["f"] += frames
        tot["npx"] += len(px); tot["mean"] += pm; tot["crc"] += crc
        mn = min(mn, px_min); mx = max(mx, px_max)
        if d in PIN_IDS:
            pins[d] = (True, w, h, frames, len(px), pm, px_min, px_max, crc)
    for d, v in sorted(pins.items()):
        print(f"({d}, {str(v[0]).lower()}, {', '.join(map(str, v[1:]))}),")
    print(f"(-1, {str(n_bad == 1).lower()}, {tot['w']}, {tot['h']}, "
          f"{tot['f']}, {tot['npx']}, {tot['mean']}, {mn}, {mx}, {tot['crc']}),")
    sys.exit(0)

if MODE == "frames":
    # mm_frame_sample pins + totals: every 2nd frame per valid doc,
    # (frame_mean = integer mean, frame_crc = CRC32 of the frame bytes)
    import zlib
    n_rows = tot_mean = tot_crc = 0
    pins = []
    for d, t in sorted(rows):
        dec = _decode(d, t)
        if dec is None:
            continue
        w, h, frames, px = dec
        for f in range(0, frames, 2):
            fr = px[f * w * h:(f + 1) * w * h]
            fm = sum(fr) // (w * h)
            crc = zlib.crc32(bytes(fr)) & 0xFFFFFFFF
            n_rows += 1; tot_mean += fm; tot_crc += crc
            if d in PIN_IDS:
                pins.append((d, f, fm, crc))
    for p in pins:
        print(f"({p[0]}, {p[1]}, {p[2]}, {p[3]}),")
    print(f"(-1, {n_rows}, {tot_mean}, {tot_crc}),")
    sys.exit(0)


if SCENES:
    # mm_scene_cuts: per-frame hashes, successive steps, cut >= 8
    tot_f = tot_c = mx = 0
    pins = {}
    for d, t in sorted(rows):
        if d == 13:   # the corrupt payload
            continue
        frames = 1 + d % 4
        b = t.encode("utf-8")
        w = 8 + len(b) % 24
        h = 4 + len(b) % 12
        ph = [frame_phash(b, w, h, f) for f in range(frames)]
        steps = [bin(ph[f] ^ ph[f + 1]).count("1") for f in range(frames - 1)]
        cuts = sum(1 for s in steps if s >= 8)
        m = max(steps) if steps else 0
        tot_f += frames
        tot_c += cuts
        mx = max(mx, m)
        if d in (1, 6, 123):
            pins[d] = (frames, cuts, m)
    for d, v in sorted(pins.items()):
        print(f"({d}, {v[0]}, {v[1]}, {v[2]}),")
    print(f"(-1, {tot_f}, {tot_c}, {mx}),")
    sys.exit(0)


def phash(text: str) -> int:
    b = text.encode("utf-8")
    w = 8 + len(b) % 24
    h = 4 + len(b) % 12
    # frame 0 pixels
    px = [((b[i % len(b)] if b else 0) + i) % 256 for i in range(w * h)]
    sums = [0] * 64
    counts = [0] * 64
    for y in range(h):
        cy = y * 8 // h
        for x in range(w):
            c = cy * 8 + x * 8 // w
            sums[c] += px[y * w + x]
            counts[c] += 1
    means = [sums[i] / counts[i] if counts[i] else 0.0 for i in range(64)]
    mean = sum(means) / 64.0
    hv = 0
    for i in range(64):
        if means[i] > mean:
            hv |= 1 << i
    # two's-complement to signed 64-bit (Spark LongType)
    return hv - (1 << 64) if hv >= 1 << 63 else hv


for doc_id, text in sorted(rows):
    print(doc_id, phash(text))
