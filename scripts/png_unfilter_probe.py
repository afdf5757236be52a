#!/usr/bin/env python
"""PNG unfilter micro-probe (r8 judge item #5): time the stdlib per-byte
kernel against the numpy-vectorized kernel on identical filtered scanline
streams, per filter type plus a mixed-filter stream, asserting the outputs
byte-identical before recording a single speedup number per case.

The inputs are synthetic raw streams (deterministic LCG bytes with chosen
filter bytes) — unfiltering is defined on arbitrary data bytes, so no
encoder is needed and every filter type is exercised at full coverage,
including Average/Paeth which ``encode_png`` (filter-0 writer) never emits.

Usage: ``python scripts/png_unfilter_probe.py [round_number]`` — writes
``PNG_UNFILTER_PROBE_r{N}.json`` at the repo root when a round is given.
"""

from __future__ import annotations

import json
import os
import sys
import time

W, H, CHANNELS = 512, 512, 3
REPS = 3


def lcg_bytes(n: int, seed: int = 12345) -> bytes:
    out = bytearray(n)
    s = seed
    for i in range(n):
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        out[i] = (s >> 16) & 0xFF
    return bytes(out)


def make_stream(filter_bytes: list[int], stride: int) -> bytes:
    data = lcg_bytes(len(filter_bytes) * stride)
    rows = []
    for y, f in enumerate(filter_bytes):
        rows.append(bytes([f]) + data[y * stride:(y + 1) * stride])
    return b"".join(rows)


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else None
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    from pyspark_coding_challenge_spark.llm.pngcodec import _unfilter

    stride = W * CHANNELS
    cases = {
        "none": [0] * H,
        "sub": [1] * H,
        "up": [2] * H,
        "average": [3] * H,
        "paeth": [4] * H,
        # the shape adaptive encoders actually emit: mixed per-row filters
        "mixed": [(y * 7) % 5 for y in range(H)],
    }
    result = {
        "protocol": (
            f"{W}x{H} {CHANNELS}-channel synthetic filtered streams "
            f"(deterministic LCG data bytes), best of {REPS} per kernel; "
            "outputs asserted byte-identical before timing is recorded"
        ),
        "note": (
            "Average/Paeth intentionally keep the per-byte loop inside the "
            "numpy kernel: the per-PIXEL numpy variant (channels-wide vector "
            "ops in the x loop) measured 0.13-0.15x vs stdlib on this exact "
            "protocol — numpy dispatch overhead dominates at 1-4 channels — "
            "so their expected speedup here is ~1.0, with the vector wins on "
            "none/sub/up and on the mixed stream"
        ),
        "cases": {},
    }
    for name, fbytes in cases.items():
        raw = make_stream(fbytes, stride)
        ref = _unfilter(raw, H, stride, CHANNELS, use_numpy=False)
        vec = _unfilter(raw, H, stride, CHANNELS, use_numpy=True)
        assert ref == vec, f"kernel divergence on {name}"
        timings = {}
        for label, use_numpy in (("stdlib", False), ("numpy", True)):
            best = min(
                _timed(_unfilter, raw, H, stride, CHANNELS, use_numpy)
                for _ in range(REPS)
            )
            timings[label] = round(best, 4)
        timings["speedup"] = round(timings["stdlib"] / timings["numpy"], 2) \
            if timings["numpy"] > 0 else None
        result["cases"][name] = timings
        print(f"{name}: {timings}", file=sys.stderr)

    out = json.dumps(result)
    print(out)
    if rnd:
        path = os.path.join(repo_root, f"PNG_UNFILTER_PROBE_r{rnd}.json")
        with open(path, "w") as fh:
            fh.write(out + "\n")
        print(f"wrote {path}", file=sys.stderr)


def _timed(fn, *args) -> float:
    t0 = time.perf_counter()
    fn(*args)
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
