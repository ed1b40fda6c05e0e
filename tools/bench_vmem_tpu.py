#!/usr/bin/env python3
"""Benchmark the VMEM Pallas decoder on the real TPU.

Builds a TPU-profile archive (block_size <= the kernel window so every
dict-reset segment fits VMEM), decodes it with execute_plan_vmem on the
default device, verifies bit-exactness, and reports warm throughput.

Usage: python tools/bench_vmem_tpu.py [corpus_mb] [block_size] [profile]
  profile: "tpu" (default; tpu_profile archive -> ring kernel) or "plain"
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench", "corpus.bin")


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    profile = sys.argv[3] if len(sys.argv) > 3 else "tpu"

    import jax

    print("devices:", jax.devices(), flush=True)

    import lzma_rs_tpu
    from lzma_rs_tpu.parallel import runtime

    if os.path.exists(CORPUS):
        data = open(CORPUS, "rb").read()[: int(mb * 1e6)]
    else:
        seed = open(
            "/root/reference/tests/files/foo.txt", "rb"
        ).read()
        data = (seed * (int(mb * 1e6) // len(seed) + 1))[: int(mb * 1e6)]

    t0 = time.perf_counter()
    if profile == "tpu":
        archive = lzma_rs_tpu.xz_compress(
            data, block_size=block, tpu_profile=True
        )
    else:
        archive = lzma_rs_tpu.xz_compress(data, block_size=block, level=6)
    print(
        f"corpus {len(data)/1e6:.1f} MB -> {len(archive)/1e6:.2f} MB xz "
        f"(block {block}, {profile}) in {time.perf_counter()-t0:.1f}s",
        flush=True,
    )
    print("config:", runtime.choose_vmem_config(
        runtime.plan_xz(archive)[0]), flush=True)

    plans, _, _, _, _ = runtime.plan_xz(archive)
    nlanes = sum(len(p.lanes) for p in plans)
    print(f"plans: {len(plans)} blocks, {nlanes} lanes", flush=True)

    t0 = time.perf_counter()
    out = runtime.execute_plan_vmem(archive, plans)
    t_cold = time.perf_counter() - t0
    assert out == data, "NOT BIT-EXACT"
    print(f"cold (incl. compile): {t_cold:.1f}s", flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = runtime.execute_plan_vmem(archive, plans)
        best = min(best, time.perf_counter() - t0)
    assert out == data
    mbs = len(data) / 1e6 / best
    print(f"vmem kernel: {mbs:.2f} MB/s warm ({best:.2f}s, bit-exact)")


if __name__ == "__main__":
    main()
