#!/usr/bin/env python3
"""Measure the VMEM kernel's per-step cost on the real TPU.

Decodes a TPU-profile archive through execute_plan_vmem with stats
enabled and reports total kernel iterations (sum over batches of the
max-lane iteration count) and wall time per iteration — the number the
kernel's pass-cost model has to explain.

Usage: python tools/time_vmem_step.py [corpus_mb] [block_size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    profile = sys.argv[3] if len(sys.argv) > 3 else "tpu"
    import json

    cfg_kw = json.loads(sys.argv[4]) if len(sys.argv) > 4 else None

    import lzma_rs_tpu
    from lzma_rs_tpu.parallel import runtime
    from lzma_rs_tpu.utils import stats as stats_mod

    seed = open("/root/reference/tests/files/foo.txt", "rb").read()
    data = (seed * (int(mb * 1e6) // len(seed) + 1))[: int(mb * 1e6)]
    if profile == "tpu":
        archive = lzma_rs_tpu.xz_compress(data, block_size=block,
                                          tpu_profile=True)
    else:
        archive = lzma_rs_tpu.xz_compress(data, block_size=block, level=6)
    plans, _, _, _, _ = runtime.plan_xz(archive)
    nlanes = sum(len(p.lanes) for p in plans)
    config = None
    if cfg_kw is not None:
        from lzma_rs_tpu.ops.vmem_decoder import KernelConfig

        config = KernelConfig(**cfg_kw)
    print(f"{len(data)/1e6:.1f} MB, block {block} ({profile}): "
          f"{nlanes} lanes, config {config or runtime.choose_vmem_config(plans)}")

    def run():
        return runtime.execute_plan_vmem(archive, plans, config=config)

    out = run()  # warm
    assert out == data

    best = float("inf")
    iters = 0
    for _ in range(3):
        with stats_mod.collect() as st:
            t0 = time.perf_counter()
            out = run()
            dt = time.perf_counter() - t0
        if dt < best:
            best, iters = dt, st.kernel_iters
    assert out == data
    print(
        f"warm {len(data)/1e6/best:.2f} MB/s, {iters} iters, "
        f"{best/iters*1e6:.2f} us/step, "
        f"{len(data)/iters:.2f} bytes/step (whole corpus)"
    )


if __name__ == "__main__":
    main()
