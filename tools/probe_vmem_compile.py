#!/usr/bin/env python3
"""Compile-only probe for the VMEM Pallas decoder on the real TPU.

Lowers + compiles decode_segments_vmem for the default config without
running it. Mosaic lowering errors surface in ~1s (the axon compile
helper fails fast), making this the bisect driver for "Not implemented"
lowering failures.

Usage: python tools/probe_vmem_compile.py [L] [W] [RING] [NLIT]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    ring = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    nlit = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    import jax
    import jax.numpy as jnp

    from lzma_rs_tpu.ops import vmem_decoder as vd

    cfg = vd.KernelConfig(L=L, W=W, W_IN=W, RING=ring, NLIT=nlit)
    K = cfg.K

    def fn(inbuf, win, is_, ie, os_, oe, meta):
        return vd.decode_segments_vmem(
            inbuf, win, is_, ie, os_, oe, meta,
            config=cfg, max_iters=1000,
        )

    shapes = [
        jax.ShapeDtypeStruct((cfg.W_IN // 4, L), jnp.int32),
        jax.ShapeDtypeStruct((W // 4, L), jnp.int32),
    ] + [jax.ShapeDtypeStruct((K, L), jnp.int32)] * 5
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*shapes)
    print(f"lowered in {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    lowered.compile()
    print(f"COMPILED OK in {time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
