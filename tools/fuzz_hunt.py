"""Out-of-band media-parser fuzz hunt: fresh random seed, 25k trials
x 16 parsers, same six mutation classes as the in-suite derandomized
test (random bytes, valid-prefix truncation, bit flips, splices,
trailing garbage, 4-byte window overwrite). Any raise is a failure
(the blob is saved for corpus promotion to tests/fixtures/fuzz/);
RSS is sampled to catch unbounded-allocation regressions.

The in-suite test (test_media_parsers_are_total_on_arbitrary_bytes)
replays the committed corpus and a derandomized 250-example pass for
CI stability; THIS runner is the per-round randomized hunt — run it
with a fresh seed each round so the search actually explores.

Usage: python3 tools/fuzz_hunt.py [seed] [trials]
"""
import random
import resource
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

from cql_replicator_spark.analytics import multimodal as MM  # noqa: E402
from test_analytics import _ref_bmp, _ref_gif, _ref_png  # noqa: E402

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else int(time.time())
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 25_000
rng = random.Random(SEED)
print(f"seed={SEED} trials={TRIALS}")

parsers = [MM.parse_image_header, MM.parse_audio_header,
           MM.parse_video_header, MM.parse_bmp_pixels,
           MM.parse_png_pixels, MM.parse_gif_pixels,
           MM.parse_jpeg_pixels, MM.parse_wav_samples,
           MM.parse_avi_mjpeg, MM.parse_png_text_chunks,
           MM.decode_image_rgb, MM.real_features,
           MM.parse_ima_adpcm_samples, MM.parse_flac_samples,
           MM.parse_y4m_frames,
           lambda b: MM.resize_image_real(b, 4, 4)]

w, h = 9, 6
valid = [
    MM.encode_grey_jpeg(w, h, bytes([77]) * (w * h)),
    _ref_bmp(3, 2, [[(1, 2, 3)] * 3] * 2),
    _ref_gif(4, 3, [(255, 0, 0), (0, 255, 0)],
             [rng.randrange(2) for _ in range(12)]),
    _ref_png(4, 3, [[(9, 9, 9)] * 4] * 3, [0, 1, 2]),
    _ref_png(4, 3, [[(9, 9, 9)] * 4] * 3, [0, 1, 2]),
    MM.encode_mjpeg_avi(8, 8, [MM.encode_grey_jpeg(8, 8, bytes(64))]),
    MM.encode_gif(5, 4, [(1, 2, 3), (4, 5, 6), (7, 8, 9)],
                  [i % 3 for i in range(20)]),
    MM.encode_png_rgb(5, 4, (9, 8, 7)),
    MM.encode_progressive_grey_jpeg(9, 6, bytes(range(54))),
    MM.encode_progressive_rgb_jpeg(10, 6, bytes(180), "420"),
    MM.encode_flac(list(range(-60, 60)), 8000, 1),
    MM.encode_flac([i % 7 - 3 for i in range(120)], 8000, 2,
                   stereo_mode="mid_side"),
    MM.encode_ima_adpcm_wav([((i * 37) % 4000) - 2000
                             for i in range(200)]),
]

fails = 0
peak_rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
for t in range(TRIALS):
    mode = rng.randrange(6)
    if mode == 0:
        blob = rng.randbytes(rng.randrange(301))
    elif mode == 1:
        base = valid[rng.randrange(len(valid))]
        blob = base[:rng.randrange(len(base) + 1)]
    elif mode == 2:
        base = bytearray(valid[rng.randrange(len(valid))])
        for _ in range(rng.randrange(1, 9)):
            base[rng.randrange(len(base))] ^= 1 << rng.randrange(8)
        blob = bytes(base)
    elif mode == 3:
        a = valid[rng.randrange(len(valid))]
        b = valid[rng.randrange(len(valid))]
        blob = (a[:rng.randrange(len(a) + 1)]
                + b[rng.randrange(len(b) + 1):])
    elif mode == 4:
        base = valid[rng.randrange(len(valid))]
        blob = base + rng.randbytes(rng.randrange(1, 64))
    else:
        base = bytearray(valid[rng.randrange(len(valid))])
        off = rng.randrange(max(1, len(base) - 4))
        base[off:off + 4] = rng.randbytes(4)
        blob = bytes(base)
    for p in parsers:
        try:
            p(blob)
        except Exception as exc:  # noqa: BLE001
            fails += 1
            fn = f"/tmp/fuzz_fail_{SEED}_{t}.bin"
            with open(fn, "wb") as f:
                f.write(blob)
            print(f"FAIL trial={t} mode={mode} parser={p} "
                  f"exc={type(exc).__name__}: {exc} -> {fn}")
    if t % 5000 == 4999:
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        print(f"  {t + 1}/{TRIALS} fails={fails} "
              f"rss={rss // 1024} MiB", flush=True)

rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(f"DONE seed={SEED}: {TRIALS} trials x {len(parsers)} parsers, "
      f"{fails} failures, peak RSS {rss // 1024} MiB "
      f"(start {peak_rss0 // 1024} MiB)")
sys.exit(1 if fails else 0)
