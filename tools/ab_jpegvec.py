#!/usr/bin/env python3
"""Interleaved A/B: per-block vs batched JPEG encoder pipeline (r17).

The r17 change routes all 8x8 blocks of an image through ONE batched
numpy FDCT (_fdct_quant_blocks: np.pad + two stacked matmuls + a
zigzag gather) and hoists the encoder's canonical Huffman tables to
module constants; the old path built each block as a Python list of
lists (64 min() calls), ran a per-block matmul, and rebuilt both code
tables per image. Encoders are deterministic pure functions, so this
is a single-process interleaved A/B over the exact bench fixture
shapes (the three lanes' dims/grey formulas at sf0.1 doc count), with
BYTE-IDENTICAL output asserted pair-wise — the decode layer and the
oracle cannot tell the two apart by construction.

Old implementations are inlined below (pre-0d65c0d code); "new" is
the library. Order flips per pass so host drift cancels pairwise.

Run: python3 tools/ab_jpegvec.py      Writes bench_ab_jpegvec.json.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

PASSES = 6
N_DOCS = 5000  # sf0.1 documents row count

from cql_replicator_spark.analytics import multimodal as MM  # noqa: E402


# -- old (pre-r17) encoder pipeline, verbatim ---------------------------------

def _old_fdct_quant(block):
    import numpy as np

    C = np.asarray(MM._DCT)
    s = np.asarray(block, dtype=np.float64) - 128.0
    coef = C @ s @ C.T
    zz = np.rint(coef).astype(np.int64)
    return [int(zz[r, c]) for r, c in MM._ZZ]


def old_encode_grey_jpeg(width, height, pixels, restart_interval=0):
    import struct

    if len(pixels) != width * height:
        raise ValueError("pixels length != width*height")
    dc_codes = MM._canonical_codes(MM._DC_BITS, MM._DC_VALS)
    ac_codes = MM._canonical_codes(MM._AC_BITS, MM._AC_VALS)
    w8, h8 = (width + 7) // 8, (height + 7) // 8
    bw = MM._BitWriter()
    pred = 0
    for by in range(h8):
        for bx in range(w8):
            mcu_no = by * w8 + bx
            if restart_interval and mcu_no \
                    and mcu_no % restart_interval == 0:
                bw.write_marker(
                    0xD0 + (mcu_no // restart_interval - 1) % 8)
                pred = 0
            block = [[pixels[min(height - 1, by * 8 + y) * width
                             + min(width - 1, bx * 8 + x)]
                      for x in range(8)] for y in range(8)]
            zz = _old_fdct_quant(block)
            diff = zz[0] - pred
            pred = zz[0]
            cat, extra = MM._category(diff)
            code, ln = dc_codes[cat]
            bw.write(code, ln)
            if cat:
                bw.write(extra, cat)
            run = 0
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                cat, extra = MM._category(zz[k])
                code, ln = ac_codes[(run << 4) | cat]
                bw.write(code, ln)
                bw.write(extra, cat)
                run = 0
            if run:
                code, ln = ac_codes[0x00]
                bw.write(code, ln)
    ecs = bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", height, width)
              + bytes([1, 1, 0x11, 0]))
    dht = (seg(0xC4, bytes([0x00]) + bytes(MM._DC_BITS) + bytes(MM._DC_VALS))
           + seg(0xC4, bytes([0x10]) + bytes(MM._AC_BITS) + bytes(MM._AC_VALS)))
    dri = (seg(0xDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht + dri + sos + ecs + b"\xff\xd9")


def old_encode_progressive_grey_jpeg(width, height, pixels,
                                     script=None, restart_interval=0):
    import struct

    if len(pixels) != width * height:
        raise ValueError("pixels length != width*height")
    script = list(MM._PROG_SCRIPT if script is None else script)
    dc_codes = MM._canonical_codes(MM._DC_BITS, MM._DC_VALS)
    ac_codes = MM._canonical_codes(MM._AC_BITS, MM._AC_VALS)
    w8, h8 = (width + 7) // 8, (height + 7) // 8
    blocks = []
    for by in range(h8):
        for bx in range(w8):
            block = [[pixels[min(height - 1, by * 8 + y) * width
                             + min(width - 1, bx * 8 + x)]
                      for x in range(8)] for y in range(8)]
            blocks.append(_old_fdct_quant(block))

    def encode_scan(ss, se, ah, al):
        bw = MM._BitWriter()
        ri = restart_interval or len(blocks)
        for ivl, start in enumerate(range(0, len(blocks), ri)):
            if start:
                bw.write_marker(0xD0 + (ivl - 1) % 8)
            chunk = blocks[start:start + ri]
            if ss == 0:
                if ah == 0:
                    pred = 0
                    for zz in chunk:
                        v = zz[0] >> al
                        cat, extra = MM._category(v - pred)
                        pred = v
                        code, ln = dc_codes[cat]
                        bw.write(code, ln)
                        if cat:
                            bw.write(extra, cat)
                else:
                    for zz in chunk:
                        bw.write((zz[0] >> al) & 1, 1)
            elif ah == 0:
                MM._emit_prog_ac_first(bw, chunk, ss, se, al, ac_codes)
            else:
                MM._emit_prog_ac_refine(bw, chunk, ss, se, al, ac_codes)
        return bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += seg(0xC2, bytes([8]) + struct.pack(">HH", height, width)
               + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(MM._DC_BITS) + bytes(MM._DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(MM._AC_BITS) + bytes(MM._AC_VALS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for ss, se, ah, al in script:
        out += seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        out += encode_scan(ss, se, ah, al)
    out += b"\xff\xd9"
    return bytes(out)


# -- fixture-shaped workloads (the three lanes' synth formulas) ---------------

def work_baseline(enc):
    for d in range(1, N_DOCS + 1):
        w, h, g = d % 21 + 4, d % 13 + 4, d % 256
        enc(w, h, bytes([g]) * (w * h))


def work_progressive(enc):
    for d in range(1, N_DOCS + 1):
        w, h, g = d % 19 + 4, d % 11 + 4, (d * 7) % 256
        enc(w, h, bytes([g]) * (w * h))


def work_mjpeg(enc):
    for d in range(1, N_DOCS + 1):
        w, h, nf = d % 9 + 8, d % 7 + 8, d % 4 + 1
        frames = [enc(w, h, bytes([(d + 31 * i) % 256]) * (w * h))
                  for i in range(nf)]
        MM.encode_mjpeg_avi(w, h, frames, fps=10)


WORK = [
    ("jpeg_encode", work_baseline, old_encode_grey_jpeg,
     MM.encode_grey_jpeg),
    ("progressive_encode", work_progressive,
     old_encode_progressive_grey_jpeg, MM.encode_progressive_grey_jpeg),
    ("mjpeg_encode", work_mjpeg, old_encode_grey_jpeg,
     MM.encode_grey_jpeg),
]


def main() -> None:
    import random

    # byte-identical outputs, fixture dims + random greys + random
    # non-solid images (exercises the AC path the solid fixtures skip)
    rng = random.Random(20260817)
    for _ in range(200):
        w, h = rng.randint(1, 33), rng.randint(1, 33)
        px = bytes(rng.randrange(256) for _ in range(w * h))
        ri = rng.choice([0, 0, 2])
        assert old_encode_grey_jpeg(w, h, px, ri) == \
            MM.encode_grey_jpeg(w, h, px, ri), "baseline bytes differ!"
        assert old_encode_progressive_grey_jpeg(
            w, h, px, restart_interval=ri) == \
            MM.encode_progressive_grey_jpeg(w, h, px,
                                            restart_interval=ri), \
            "progressive bytes differ!"

    raw = {name: {"old": [], "new": []} for name, *_ in WORK}
    for name, work, old, new in WORK:   # discarded warm-up
        work(old)
        work(new)
    for p in range(PASSES):
        order = (("old", "new") if p % 2 == 0 else ("new", "old"))
        for side in order:
            for name, work, old, new in WORK:
                fn = old if side == "old" else new
                t0 = time.perf_counter()
                work(fn)
                raw[name][side].append(round(time.perf_counter() - t0, 3))

    out = {"passes": PASSES, "n_docs": N_DOCS,
           "protocol": "v2: byte-equality asserted (200 random images "
                       "incl. non-solid + restart intervals), 1 warmup "
                       "pass per side, per-pass order flip",
           "raw": raw, "medians": {}}
    for name, *_ in WORK:
        mo = statistics.median(raw[name]["old"])
        mn = statistics.median(raw[name]["new"])
        out["medians"][name] = {"old": round(mo, 3), "new": round(mn, 3),
                                "ratio_new_over_old": round(mn / mo, 3)}
        print(f"{name}: old {mo:.3f}s new {mn:.3f}s ratio {mn / mo:.3f}")
    (ROOT / "bench_ab_jpegvec.json").write_text(
        json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
