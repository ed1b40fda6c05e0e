#!/usr/bin/env python3
"""Sweep VMEM-kernel configs on the real TPU and report warm throughput.

Each row: archive profile (block size, props) x kernel config overrides.
Usage: python tools/bench_vmem_matrix.py [corpus_mb]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench", "corpus.bin")


def load_corpus(mb):
    if os.path.exists(CORPUS):
        return open(CORPUS, "rb").read()[: int(mb * 1e6)]
    ref_dir = os.environ.get("LZMA_RS_REFERENCE", "/root/reference")
    foo = os.path.join(ref_dir, "tests", "files", "foo.txt")
    if os.path.exists(foo):
        seed = open(foo, "rb").read()
    else:
        # synthetic text-like corpus: repeated source files from this repo
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        parts = []
        for root, _, files in os.walk(os.path.join(here, "lzma_rs_tpu")):
            for f in sorted(files):
                if f.endswith(".py"):
                    parts.append(open(os.path.join(root, f), "rb").read())
        seed = b"\n".join(parts) or b"the quick brown fox " * 1024
    return (seed * (int(mb * 1e6) // len(seed) + 1))[: int(mb * 1e6)]


def run_case(data, block, props, cfg_kw):
    import lzma_rs_tpu
    from lzma_rs_tpu.ops import vmem_decoder as vd
    from lzma_rs_tpu.parallel import runtime

    archive = lzma_rs_tpu.xz_compress(
        data, block_size=block, level=6, props=props
    )
    plans, *_ = runtime.plan_xz(archive)
    nlanes = sum(len(p.lanes) for p in plans)
    config = vd.KernelConfig(**cfg_kw) if cfg_kw else None
    t0 = time.perf_counter()
    out = runtime.execute_plan_vmem(archive, plans, config=config)
    cold = time.perf_counter() - t0
    assert out == data, "NOT BIT-EXACT"
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = runtime.execute_plan_vmem(archive, plans, config=config)
        best = min(best, time.perf_counter() - t0)
    assert out == data
    mbs = len(data) / 1e6 / best
    print(
        f"block={block} props={props} cfg={cfg_kw or 'auto'}: "
        f"{mbs:6.2f} MB/s warm ({nlanes} lanes, "
        f"ratio {len(archive)/len(data):.3f}, cold {cold:.0f}s)",
        flush=True,
    )
    return mbs


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    import jax

    print("devices:", jax.devices(), flush=True)
    data = load_corpus(mb)
    P_LC0 = 0 + 9 * (0 + 5 * 2)  # lc=0 lp=0 pb=2

    cases = [
        # (block, props, config overrides)
        (16384, -1, {}),  # round-1 baseline shape, now with 4B copies
        (8192, P_LC0, dict(L=256, W=8192, W_IN=8192, NLIT=1, UNROLL=2)),
        (8192, P_LC0, dict(L=256, W=8192, W_IN=8192, NLIT=1, UNROLL=4)),
        (4096, P_LC0, dict(L=256, W=4096, W_IN=4096, NLIT=1, UNROLL=4)),
        (8192, P_LC0, dict(L=512, W=8192, W_IN=8192, NLIT=1, UNROLL=4)),
    ]
    for block, props, kw in cases:
        try:
            run_case(data, block, props, kw)
        except Exception as e:  # keep sweeping
            print(f"block={block} props={props} cfg={kw}: FAIL {e!r}",
                  flush=True)


if __name__ == "__main__":
    main()
