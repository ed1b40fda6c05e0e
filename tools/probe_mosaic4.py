#!/usr/bin/env python3
"""Bisect the vmem_decoder 'Not implemented: Sublane broadcast' failure.

Each variant reproduces one structural pattern of ops/vmem_decoder.py's
kernel (nested while_loops, 1-D [L] carried vectors, transposed [W, L]
tables) and adds one suspect construct. Compile-only: a variant either
COMPILEs or reports the first line of the Mosaic error.

Run: python tools/probe_mosaic4.py [variant ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128
W = 512
_I32 = jnp.int32


def onehot_read(table, idx, width):
    rows = jax.lax.broadcasted_iota(_I32, (width, L), 0)
    sel = jnp.where(rows == idx[None, :], table, 0)
    return jnp.sum(sel, axis=0)


def build(variant):
    def kernel(x_ref, o_ref, tab_ref, tile_ref):
        tab_ref[:] = jnp.full((W, L), 7, _I32)
        tile_ref[:] = jnp.zeros((64, L), _I32)

        def step(carry):
            idx, acc, it = carry
            v = onehot_read(tab_ref[:], idx, W)
            rows = jax.lax.broadcasted_iota(_I32, (W, L), 0)
            m = (rows == idx[None, :]) & (acc > 0)[None, :]
            tab_ref[:] = jnp.where(m, v[None, :] + 1, tab_ref[:])
            idx = (idx + v) % W
            acc = acc + 1

            if variant == "when_reset":
                flag = acc % 17 == 0

                @pl.when(jnp.max(flag.astype(_I32)) == 1)
                def _():
                    tab_ref[:] = jnp.where(
                        flag[None, :], 0x400, tab_ref[:]
                    )

            if variant == "when_reset_hoisted":
                flag = acc % 17 == 0
                tab_ref[:] = jnp.where(flag[None, :], 0x400, tab_ref[:])

            if variant == "when_reset_refed":
                flag = acc % 17 == 0
                tile_ref[0:1, :] = flag.astype(_I32)[None, :]

                @pl.when(jnp.max(flag.astype(_I32)) == 1)
                def _():
                    fm = tile_ref[0:1, :] == 1
                    tab_ref[:] = jnp.where(
                        jnp.broadcast_to(fm, (W, L)), 0x400, tab_ref[:]
                    )

            return idx, acc, it + 1

        def outer_body(carry):
            # refill pattern: concatenate of one-hot row selects
            idx = carry[0]
            row0 = (idx // 128)[None, :]
            accs = [jnp.zeros((32, L), _I32) for _ in range(2)]
            for r in range(W // 128):
                chunk = tab_ref[r * 32:(r + 1) * 32, :]
                for t in range(2):
                    accs[t] = jnp.where(row0 + t == r, chunk, accs[t])
            tile_ref[:] = jnp.concatenate(accs, axis=0)

            def inner_cond(jc):
                return jc[0] < 16

            def inner_body(jc):
                j, inner = jc
                return (j + 1, step(inner))

            _, carry = jax.lax.while_loop(
                inner_cond, inner_body, (jnp.int32(0), carry)
            )
            return carry

        def cond(carry):
            return carry[2] < 64

        init = (
            x_ref[0, :] * 0,
            jnp.zeros((L,), _I32),
            jnp.zeros((), _I32),
        )
        final = jax.lax.while_loop(cond, outer_body, init)
        o_ref[:] = final[0][None, :]

    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, L), _I32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((W, L), _I32),
                pltpu.VMEM((64, L), _I32),
            ],
        )(x)

    return fn


VARIANTS = ["base", "when_reset", "when_reset_hoisted", "when_reset_refed"]


def main():
    want = sys.argv[1:] or VARIANTS
    x = jnp.zeros((4, L), _I32)
    for v in want:
        t0 = time.perf_counter()
        try:
            jax.jit(build(v)).lower(x).compile()
            print(f"{v:24s} COMPILE OK ({time.perf_counter()-t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            lines = [ln for ln in str(e).splitlines() if "Not implemented" in ln or "error" in ln.lower()]
            msg = lines[0][:140] if lines else str(e).splitlines()[0][:140]
            print(f"{v:24s} FAIL: {msg}")


if __name__ == "__main__":
    main()


def build2(variant):
    """Width-8 sublane one-hot reads from input refs (Stage E sched)."""
    K = 8

    def kernel(k_ref, o_ref, tab_ref):
        tab_ref[:] = jnp.full((W, L), 7, _I32)

        def step(carry):
            idx, acc, it = carry
            v = onehot_read(tab_ref[:], idx, W)
            ci = jnp.clip(acc, 0, K - 1)
            if variant == "sched8_max":
                rows = jax.lax.broadcasted_iota(_I32, (K, L), 0)
                sel = jnp.where(rows == ci[None, :], k_ref[:], 0)
                v = v + jnp.max(sel, axis=0)
            if variant == "sched8_sum":
                rows = jax.lax.broadcasted_iota(_I32, (K, L), 0)
                sel = jnp.where(rows == ci[None, :], k_ref[:], 0)
                v = v + jnp.sum(sel, axis=0)
            if variant == "sched8_blend":
                sel = jnp.zeros((L,), _I32)
                kv = k_ref[:]
                for r in range(K):
                    sel = sel + kv[r, :] * (ci == r).astype(_I32)
                v = v + sel
            idx = (idx + v) % W
            acc = acc + 1
            return idx, acc, it + 1

        def outer_body(carry):
            def inner_cond(jc):
                return jc[0] < 16

            def inner_body(jc):
                j, inner = jc
                return (j + 1, step(inner))

            _, carry = jax.lax.while_loop(
                inner_cond, inner_body, (jnp.int32(0), carry)
            )
            return carry

        def cond(carry):
            return carry[2] < 64

        init = (k_ref[0, :] * 0, jnp.zeros((L,), _I32), jnp.zeros((), _I32))
        final = jax.lax.while_loop(cond, outer_body, init)
        o_ref[:] = final[0][None, :]

    def fn(k):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, L), _I32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((W, L), _I32)],
        )(k)

    return fn


def main2():
    import time as _t
    k = jnp.zeros((8, L), _I32)
    for v in ["sched8_max", "sched8_sum", "sched8_blend"]:
        t0 = _t.perf_counter()
        try:
            jax.jit(build2(v)).lower(k).compile()
            print(f"{v:24s} COMPILE OK ({_t.perf_counter()-t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            lines = [ln for ln in str(e).splitlines() if "Not implemented" in ln]
            print(f"{v:24s} FAIL: {lines[0][:120] if lines else str(e).splitlines()[0][:120]}")
