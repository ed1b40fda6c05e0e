#!/usr/bin/env python3
"""Probe which per-lane dynamic-indexing patterns Mosaic lowers, and cost.

The TPU decode-kernel design (docs/DESIGN.md "Pallas findings") depends
entirely on the economics of four primitive access patterns:

  A. minor-axis dynamic gather   g[l, j] = x[l, idx[l, j]]   (take_along_axis
     axis=-1 with full-shape indices — the only gather form Mosaic's
     lowering rule admits)
  B. sublane-axis dynamic gather r[i, c] = x[idx[i, c], c]   (per-lane row
     select from a stack of rows)
  C. one-hot masked read         sum(where(iota == idx, x, 0))
  D. one-hot masked write        x = where(iota == idx, v, x)
  E. scalar dynamic read/write   x[0, j] for a traced j (per-"grid-lane")

Each probe times ITERS repetitions inside one kernel (fori_loop) so the
per-op cost excludes launch overhead. Unsupported patterns report as
LOWER-FAIL with the first line of the compiler error.

Run on TPU:  python tools/probe_mosaic.py
Run on CPU (interpret-mode sanity): JAX_PLATFORM_NAME=cpu python tools/probe_mosaic.py --interpret
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 512


def bench(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def run_probe(name, build, interpret):
    try:
        fn, args = build(interpret)
        dt = bench(fn, *args)
        per_op_us = dt / ITERS * 1e6
        print(f"{name:55s} {per_op_us:10.3f} us/op   ({dt*1e3:8.3f} ms total)")
    except Exception as e:  # noqa: BLE001 — report lowering failures
        lines = [ln for ln in str(e).splitlines() if ln.strip()]
        msg = lines[0][:110] if lines else type(e).__name__
        print(f"{name:55s} LOWER-FAIL: {msg}")


# Mosaic's only gather lowering (`tpu.dynamic_gather`, lowering.py
# `_gather_lowering_rule`) accepts lax.gather on a 2D operand with
# full-shape indices and batching dims — gather along the minor (lane)
# axis or the major (sublane) axis. jnp.take_along_axis does NOT produce
# this form in jax 0.9, so build the gather explicitly.
def gather_lanes(x, idx):
    """g[i, j] = x[i, idx[i, j]] — within-row (lane) dynamic gather."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        x, idx[:, :, None], dnums, slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def gather_sublanes(x, idx):
    """g[i, j] = x[idx[i, j], j] — cross-row (sublane) dynamic gather."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,),
        operand_batching_dims=(1,), start_indices_batching_dims=(1,),
    )
    return jax.lax.gather(
        x, idx[:, :, None], dnums, slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


# --------------------------------------------------------------------------
# A. minor-axis dynamic gather (full-shape indices)
# --------------------------------------------------------------------------
def probe_gather_minor(L, W, dtype, interpret):
    def kernel(x_ref, idx_ref, o_ref):
        x = x_ref[:]
        idx0 = idx_ref[:]

        def body(i, carry):
            idx = (idx0 + i) & (W - 1)
            g = gather_lanes(x, idx)
            return carry + g

        o_ref[:] = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((L, W), dtype)
        )

    @jax.jit
    def fn(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, W), dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, idx)

    x = jnp.arange(L * W, dtype=dtype).reshape(L, W)
    idx = (jnp.arange(L * W, dtype=jnp.int32).reshape(L, W) * 7) % W
    return fn, (x, idx)


# --------------------------------------------------------------------------
# B. sublane-axis dynamic gather: select one row per minor-lane
# --------------------------------------------------------------------------
def probe_gather_sublane(R, C, dtype, interpret):
    def kernel(x_ref, idx_ref, o_ref):
        x = x_ref[:]
        idx0 = idx_ref[:]

        def body(i, carry):
            idx = (idx0 + i) % R
            g = gather_sublanes(x, idx)  # [R, C]
            return carry + g

        o_ref[:] = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((R, C), dtype)
        )

    @jax.jit
    def fn(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, C), dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, idx)

    x = jnp.arange(R * C, dtype=dtype).reshape(R, C)
    idx = (jnp.arange(R * C, dtype=jnp.int32).reshape(R, C) * 3) % R
    return fn, (x, idx)


# --------------------------------------------------------------------------
# C/D. one-hot masked read / write over [L, W]
# --------------------------------------------------------------------------
def probe_onehot_read(L, W, dtype, interpret):
    def kernel(x_ref, idx_ref, o_ref):
        x = x_ref[:]
        idx0 = idx_ref[:]
        cols = jax.lax.broadcasted_iota(jnp.int32, (L, W), 1)

        def body(i, carry):
            idx = (idx0 + i) % W
            v = jnp.sum(
                jnp.where(cols == idx[:, None], x, 0), axis=1, keepdims=True
            )
            return carry + v

        o_ref[:] = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((L, 1), dtype)
        )

    @jax.jit
    def fn(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, 1), dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, idx)

    x = jnp.arange(L * W, dtype=dtype).reshape(L, W)
    idx = (jnp.arange(L, dtype=jnp.int32) * 11) % W
    return fn, (x, idx)


def probe_onehot_write(L, W, dtype, interpret):
    def kernel(x_ref, idx_ref, o_ref):
        idx0 = idx_ref[:]
        cols = jax.lax.broadcasted_iota(jnp.int32, (L, W), 1)

        def body(i, x):
            idx = (idx0 + i) % W
            return jnp.where(cols == idx[:, None], x + 1, x)

        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    @jax.jit
    def fn(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, W), dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x, idx)

    x = jnp.arange(L * W, dtype=dtype).reshape(L, W)
    idx = (jnp.arange(L, dtype=jnp.int32) * 11) % W
    return fn, (x, idx)


# --------------------------------------------------------------------------
# E. scalar dynamic read+write into a VMEM row (per-"grid-lane" emulation)
# --------------------------------------------------------------------------
def probe_scalar_rw(W, interpret):
    def kernel(x_ref, o_ref):
        def body(i, carry):
            j = (i * 37) % W
            v = x_ref[0, j]
            x_ref[0, (j + 1) % W] = v + carry
            return carry + v

        o_ref[0, 0] = jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            input_output_aliases={0: None} if False else {},
            interpret=interpret,
        )(x)

    x = jnp.arange(W, dtype=jnp.int32).reshape(1, W)
    return fn, (x,)


# --------------------------------------------------------------------------
# F. dynamic row slice per traced scalar (pl.ds) from a [R, C] table
# --------------------------------------------------------------------------
def probe_dynrow(R, C, interpret):
    def kernel(x_ref, o_ref):
        def body(i, carry):
            r = (i * 13) % R
            row = x_ref[pl.ds(r, 1), :]
            return carry + row

        o_ref[:] = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((1, C), jnp.int32)
        )

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, C), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x)

    x = jnp.arange(R * C, dtype=jnp.int32).reshape(R, C)
    return fn, (x,)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    interp = args.interpret
    if interp:
        jax.config.update("jax_platforms", "cpu")

    print(f"devices: {jax.devices()}  iters/kernel: {ITERS}")
    i32 = jnp.int32

    probes = [
        ("A gather-minor [8,128] i32",
         functools.partial(probe_gather_minor, 8, 128, i32)),
        ("A gather-minor [128,128] i32",
         functools.partial(probe_gather_minor, 128, 128, i32)),
        ("A gather-minor [8,1024] i32",
         functools.partial(probe_gather_minor, 8, 1024, i32)),
        ("A gather-minor [128,1024] i32",
         functools.partial(probe_gather_minor, 128, 1024, i32)),
        ("A gather-minor [8,128] u8",
         functools.partial(probe_gather_minor, 8, 128, jnp.uint8)),
        ("B gather-sublane [8,128] i32",
         functools.partial(probe_gather_sublane, 8, 128, i32)),
        ("B gather-sublane [64,128] i32",
         functools.partial(probe_gather_sublane, 64, 128, i32)),
        ("B gather-sublane [512,128] i32",
         functools.partial(probe_gather_sublane, 512, 128, i32)),
        ("C onehot-read [128,768] i32",
         functools.partial(probe_onehot_read, 128, 768, i32)),
        ("C onehot-read [128,2048] i32",
         functools.partial(probe_onehot_read, 128, 2048, i32)),
        ("D onehot-write [128,768] i32",
         functools.partial(probe_onehot_write, 128, 768, i32)),
        ("D onehot-write [128,2048] i32",
         functools.partial(probe_onehot_write, 128, 2048, i32)),
        ("E scalar-rw [1,4096]",
         functools.partial(probe_scalar_rw, 4096)),
        ("F dynrow pl.ds [512,128]",
         functools.partial(probe_dynrow, 512, 128)),
        ("F dynrow pl.ds [4096,128]",
         functools.partial(probe_dynrow, 4096, 128)),
    ]
    for name, build in probes:
        run_probe(name, build, interp)


if __name__ == "__main__":
    main()
