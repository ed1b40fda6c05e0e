#!/usr/bin/env python3
"""Probe: 2-D lane layout for the VMEM kernel.

The kernel's per-step cost is dominated by ~500 tiny vector ops on 1-D
[L] carries (docs/DESIGN.md, probe_step_cost results: memory passes are
~6% of step cost). 1-D vectors live SUBLANE-REPLICATED in Mosaic: a vreg
is (8, 128), so an [L] op does useful work in only 1/8 of each vreg and
an L=256 op burns 2 vregs for 256 lanes. A 2-D [S, 128] carry layout
packs S*128 distinct lanes per S/8 vregs — potentially 8x the lanes per
issue slot.

This probe measures a dependent chain of kernel-shaped tiny ops plus the
one-hot probability read/update/write ("bit decode") under:
  A. 1-D [256] replicated carries, 2-D [rows, 256] tables (current)
  B. 2-D [8, 128] carries (1024 lanes), 3-D [rows, 8, 128] tables
  C. 2-D [16, 128] carries (2048 lanes), 3-D tables
  D. 2-D [32, 128] carries (4096 lanes), 3-D tables

Reports per-iteration and per-lane-bit cost. Run on real TPU.
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 256
ROWS = 648  # PROB_WORDS at NLIT=1


def run(name, build):
    try:
        fn, args, lanes = build()
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        dt = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
        per_it = best * 1e6 / ITERS
        per_lane_ns = best * 1e9 / ITERS / lanes
        print(f"{name:44s} OK  compile {dt:6.1f}s  "
              f"{per_it:8.3f} us/it  {per_lane_ns:7.3f} ns/lane-bit")
    except Exception as e:  # noqa: BLE001
        lines = [ln for ln in str(e).splitlines() if ln.strip()]
        msg = ""
        for ln in lines:
            if "Mosaic" in ln or "relayout" in ln or "NotImplemented" in ln \
                    or "Unsupported" in ln:
                msg = ln.strip()[:160]
                break
        print(f"{name:44s} FAIL {msg or (lines[0][:160] if lines else '?')}")


def bitdecode_1d(L):
    """Current style: [L] replicated carries, [ROWS, L] table."""
    def kernel(x_ref, o_ref, tab_ref):
        tab_ref[:] = x_ref[:]
        rows = jax.lax.broadcasted_iota(jnp.int32, (ROWS, L), 0)

        def body(c):
            idx, acc, rng, cod, i = c
            # ~20 tiny index ops (stand-in for stage-A where chains)
            for k in range(10):
                idx = jnp.where(acc > k, idx + 1, idx)
            idx = jnp.clip(idx, 0, ROWS - 1)
            sel = jnp.where(rows == idx[None, :], tab_ref[:], 0)
            p = jnp.sum(sel, axis=0)
            bound = (rng.astype(jnp.uint32) >> 11) * (p & 0x7FF).astype(jnp.uint32)
            bit = (cod.astype(jnp.uint32) >= bound).astype(jnp.int32)
            newp = jnp.where(bit == 1, p - (p >> 5), p + 3)
            pm = rows == idx[None, :]
            tab_ref[:] = jnp.where(pm, newp[None, :], tab_ref[:])
            rng = jnp.where(bit == 1, rng - bound.astype(jnp.int32), rng | 1)
            cod = cod ^ bit
            acc = (acc << 1) | bit
            acc = jnp.where(acc > 0x100, 1, acc)
            return idx, acc, rng, cod, i + 1

        def cond(c):
            return c[-1] < ITERS

        # init from a ref load: splat-initialized carries are inferred
        # fully-replicated and concrete body updates cannot relayout in
        z = jnp.min(x_ref[0:1, :], axis=0) * 0
        out = jax.lax.while_loop(
            cond, body,
            (z, z + 1, z - 1, z + 12345, jnp.zeros((), jnp.int32)))
        o_ref[:] = out[1][None, :]

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((ROWS, L), jnp.int32)],
        )(x)

    return fn, (jnp.full((ROWS, L), 1024, jnp.int32),), L


def bitdecode_2d(S):
    """2-D lanes: [S, 128] carries, [ROWS, S, 128] table."""
    L = S * 128

    def kernel(x_ref, o_ref, tab_ref):
        tab_ref[:] = x_ref[:]
        rows = jax.lax.broadcasted_iota(jnp.int32, (ROWS, S, 128), 0)

        def body(c):
            idx, acc, rng, cod, i = c
            for k in range(10):
                idx = jnp.where(acc > k, idx + 1, idx)
            idx = jnp.clip(idx, 0, ROWS - 1)
            sel = jnp.where(rows == idx[None], tab_ref[:], 0)
            p = jnp.sum(sel, axis=0)
            bound = (rng.astype(jnp.uint32) >> 11) * (p & 0x7FF).astype(jnp.uint32)
            bit = (cod.astype(jnp.uint32) >= bound).astype(jnp.int32)
            newp = jnp.where(bit == 1, p - (p >> 5), p + 3)
            pm = rows == idx[None]
            tab_ref[:] = jnp.where(pm, newp[None], tab_ref[:])
            rng = jnp.where(bit == 1, rng - bound.astype(jnp.int32), rng | 1)
            cod = cod ^ bit
            acc = (acc << 1) | bit
            acc = jnp.where(acc > 0x100, 1, acc)
            return idx, acc, rng, cod, i + 1

        def cond(c):
            return c[-1] < ITERS

        z = x_ref[0] * 0
        out = jax.lax.while_loop(
            cond, body,
            (z, z + 1, z - 1, z + 12345, jnp.zeros((), jnp.int32)))
        o_ref[:] = out[1]

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((ROWS, S, 128), jnp.int32)],
        )(x)

    return fn, (jnp.full((ROWS, S, 128), 1024, jnp.int32),), L


def tinyops_only_1d(L):
    """Pure dependent tiny-op chain, no table: isolates issue overhead."""
    def kernel(x_ref, o_ref):
        def body(c):
            a, b, d, i = c
            for k in range(50):
                a = jnp.where(b > (k & 7), a + 1, a - d)
                b = (b ^ a) & 0xFFFF
                d = jnp.where(a > b, d | 1, d << 1)
            return a, b, d, i + 1

        def cond(c):
            return c[-1] < ITERS

        z = x_ref[0, :]
        out = jax.lax.while_loop(
            cond, body, (z, z + 1, z + 2, jnp.zeros((), jnp.int32)))
        o_ref[:] = out[0][None, :]

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return fn, (jnp.zeros((8, L), jnp.int32),), L


def tinyops_only_2d(S):
    L = S * 128

    def kernel(x_ref, o_ref):
        def body(c):
            a, b, d, i = c
            for k in range(50):
                a = jnp.where(b > (k & 7), a + 1, a - d)
                b = (b ^ a) & 0xFFFF
                d = jnp.where(a > b, d | 1, d << 1)
            return a, b, d, i + 1

        def cond(c):
            return c[-1] < ITERS

        z = x_ref[:]
        out = jax.lax.while_loop(
            cond, body, (z, z + 1, z + 2, jnp.zeros((), jnp.int32)))
        o_ref[:] = out[0]

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return fn, (jnp.zeros((S, 128), jnp.int32),), L


if __name__ == "__main__":
    print("devices:", jax.devices())
    run("tinyops(150) 1d L=256", lambda: tinyops_only_1d(256))
    run("tinyops(150) 2d S=8 (1024 lanes)", lambda: tinyops_only_2d(8))
    run("tinyops(150) 2d S=32 (4096 lanes)", lambda: tinyops_only_2d(32))
    run("bitdecode 1d L=256", lambda: bitdecode_1d(256))
    run("bitdecode 2d S=8 (1024 lanes)", lambda: bitdecode_2d(8))
    run("bitdecode 2d S=16 (2048 lanes)", lambda: bitdecode_2d(16))
