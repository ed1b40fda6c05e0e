#!/usr/bin/env python3
"""Benchmark: end-to-end `.xz` decode throughput of the framework.

Prints ONE JSON line:
  {"metric": "xz_decode_throughput", "value": <MB/s>, "unit": "MB/s",
   "vs_baseline": <ratio>}

Protocol (BASELINE.md): the reference (lzma-rs, Rust) publishes no numbers
and no Rust toolchain exists in this image, so the measured stand-in
baseline is single-threaded liblzma (`xz -dc -T1`) on the same corpus —
a strictly harder target than lzma-rs (which is slower than liblzma).

Corpus: ~60 MB of Python sources from this image (deterministic order),
compressed with `xz -6 --block-size=4MiB` so the archive has independent
blocks — the format's parallel axis. Bit-exactness is asserted before
timing. Details go to stderr; stdout carries only the JSON line.
"""

import glob
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
BENCH_DIR = os.path.join(HERE, ".bench")
CORPUS = os.path.join(BENCH_DIR, "corpus.bin")
CORPUS_XZ = os.path.join(BENCH_DIR, "corpus.xz")
TARGET_MB = int(os.environ.get("LZMA_RS_TPU_BENCH_MB", "60"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_corpus() -> None:
    os.makedirs(BENCH_DIR, exist_ok=True)
    if os.path.exists(CORPUS) and os.path.exists(CORPUS_XZ):
        return
    bufs, tot = [], 0
    for pat in ("/usr/lib/python3*/**/*.py", "/opt/venv/lib/**/*.py"):
        for p in sorted(glob.glob(pat, recursive=True)):
            try:
                b = open(p, "rb").read()
            except OSError:
                continue
            bufs.append(b)
            tot += len(b)
            if tot > TARGET_MB * 1e6:
                break
        if tot > TARGET_MB * 1e6:
            break
    data = b"".join(bufs)
    if len(data) < 8e6:
        # fallback corpus if this image lacks python sources: tile the
        # reference test corpus to scale
        seed = open(
            "/root/reference/tests/files/range-coder-edge-case", "rb"
        ).read()
        data = (seed * (int(TARGET_MB * 1e6) // len(seed) + 1))[
            : int(TARGET_MB * 1e6)
        ]
    with open(CORPUS, "wb") as f:
        f.write(data)
    subprocess.run(
        ["xz", "-6", "-T0", "--block-size=1048576", "-k", "-f", CORPUS],
        check=True,
    )
    os.replace(CORPUS + ".xz", CORPUS_XZ)
    log(f"corpus: {len(data) / 1e6:.1f} MB -> {os.path.getsize(CORPUS_XZ) / 1e6:.1f} MB xz")


def time_best(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    build_corpus()
    expected = open(CORPUS, "rb").read()
    cx = open(CORPUS_XZ, "rb").read()
    n_mb = len(expected) / 1e6

    import lzma_rs_tpu

    # correctness gate
    out = lzma_rs_tpu.xz_decompress(cx)
    assert out == expected, "decode is not bit-exact — refusing to benchmark"
    del out

    ours = time_best(lambda: lzma_rs_tpu.xz_decompress(cx))
    ours_mbs = n_mb / ours
    log(f"lzma_rs_tpu xz_decompress: {ours_mbs:.1f} MB/s ({ours:.2f}s)")

    base = time_best(
        lambda: subprocess.run(
            ["xz", "-dc", "-T1", CORPUS_XZ],
            stdout=subprocess.DEVNULL,
            check=True,
        )
    )
    base_mbs = n_mb / base
    log(f"baseline xz -dc -T1 (liblzma): {base_mbs:.1f} MB/s ({base:.2f}s)")

    print(
        json.dumps(
            {
                "metric": "xz_decode_throughput",
                "value": round(ours_mbs, 1),
                "unit": "MB/s",
                "vs_baseline": round(ours_mbs / base_mbs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
