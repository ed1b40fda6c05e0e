#!/usr/bin/env python3
"""Measure and persist the auto-router calibration for THIS host.

Writes ``native_mbs`` (host engine throughput) and — when a TPU backend
is reachable — ``link_mbs`` (host<->device round-trip bandwidth) to the
calibration file (``runtime.calibration_path()``). The kernel step-cost
fit (step_a/step_b) needs compiled kernel timings at two shapes; bench.py
refreshes those from its own device measurements, so this tool leaves
them untouched. Cheap by design: one ~16 MB decode + one 8 MB transfer,
no kernel compiles.

Usage: python tools/calibrate.py [--mb N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    mb = 16
    args = sys.argv[1:]
    if args and args[0] == "--mb":
        mb = int(args[1])

    import lzma_rs_tpu
    from lzma_rs_tpu.parallel import runtime

    seed = open("/root/reference/tests/files/foo.txt", "rb").read()
    data = (seed * (mb * 1_000_000 // len(seed) + 1))[: mb * 1_000_000]
    arch = lzma_rs_tpu.xz_compress(data, block_size=1 << 20, level=6)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = runtime.xz_decode(arch, engine="native")
        best = min(best, time.perf_counter() - t0)
    assert out == data
    native_mbs = len(data) / 1e6 / best
    print(f"native engine: {native_mbs:.1f} MB/s")
    cal = {"native_mbs": native_mbs}

    try:
        import jax

        if jax.default_backend() == "tpu":
            import jax.numpy as jnp
            import numpy as np

            buf = np.zeros(8 * 1024 * 1024, dtype=np.uint8)
            link_best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                d = jnp.asarray(buf)
                jax.block_until_ready(d)
                _ = np.asarray(d)
                link_best = min(link_best, time.perf_counter() - t0)
            cal["link_mbs"] = 2 * len(buf) / 1e6 / link_best
            print(f"link: {cal['link_mbs']:.1f} MB/s")
        else:
            print("no TPU backend: leaving link_mbs unchanged")
    except Exception as e:
        print(f"device probe skipped: {type(e).__name__}: {e}")

    path = runtime.write_calibration(**cal)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
