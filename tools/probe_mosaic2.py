#!/usr/bin/env python3
"""Second round of Mosaic probes: pin down which vmem_decoder construct
triggers 'Invalid relayout (1,128) -> {*,*}(8,128)'. Each probe isolates
one pattern with a while_loop-carried index vector (the delta versus
tools/probe_mosaic.py, whose fori-loop one-hots compiled fine)."""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128
W = 2048
ITERS = 64


def run(name, build):
    try:
        fn, args = build()
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        warm = time.perf_counter() - t0
        print(f"{name:45s} OK  compile+run {dt:6.1f}s  warm {warm*1e6/ITERS:8.3f} us/it")
    except Exception as e:  # noqa: BLE001
        lines = [ln for ln in str(e).splitlines() if ln.strip()]
        msg = ""
        for ln in lines:
            if "Mosaic" in ln or "relayout" in ln or "NotImplemented" in ln:
                msg = ln.strip()[:160]
                break
        print(f"{name:45s} FAIL {msg or (lines[0][:160] if lines else '?')}")


# P1: while-carried 1-D idx, one-hot read over [W, L]
def p1():
    def kernel(x_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (W, L), 0)

        def cond(c):
            return c[1] < ITERS

        def body(c):
            idx, i, acc = c
            sel = jnp.where(rows == idx[None, :], x_ref[:], 0)
            v = jnp.max(sel, axis=0)
            return ((idx + 1) % W, i + 1, acc + v)

        idx0 = jnp.zeros((L,), jnp.int32)
        _, _, acc = jax.lax.while_loop(
            cond, body, (idx0, jnp.int32(0), jnp.zeros((L,), jnp.int32))
        )
        o_ref[:] = acc[None, :]

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return fn, (jnp.ones((W, L), jnp.int32),)


# P2: while-carried 2-D [1, L] idx, keepdims one-hot
def p2():
    def kernel(x_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (W, L), 0)

        def cond(c):
            return c[1] < ITERS

        def body(c):
            idx, i, acc = c
            sel = jnp.where(rows == idx, x_ref[:], 0)
            v = jnp.max(sel, axis=0, keepdims=True)
            return ((idx + 1) % W, i + 1, acc + v)

        idx0 = jnp.zeros((1, L), jnp.int32)
        _, _, acc = jax.lax.while_loop(
            cond, body, (idx0, jnp.int32(0), jnp.zeros((1, L), jnp.int32))
        )
        o_ref[:] = acc

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return fn, (jnp.ones((W, L), jnp.int32),)


# P3: P2 + one-hot WRITE with carried mask
def p3():
    def kernel(x_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (W, L), 0)

        def cond(c):
            return c[1] < ITERS

        def body(c):
            idx, i, acc = c
            sel = jnp.where(rows == idx, x_ref[:], 0)
            v = jnp.max(sel, axis=0, keepdims=True)
            mask = (v & 1) == 1
            x_ref[:] = jnp.where((rows == idx) & mask, v + 1, x_ref[:])
            return ((idx + 1) % W, i + 1, acc + v)

        idx0 = jnp.zeros((1, L), jnp.int32)
        _, _, acc = jax.lax.while_loop(
            cond, body, (idx0, jnp.int32(0), jnp.zeros((1, L), jnp.int32))
        )
        o_ref[:] = acc

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases={},
        )(x)

    return fn, (jnp.ones((W, L), jnp.int32),)


# P4: pl.when with ref write inside while body (refill pattern)
def p4():
    def kernel(x_ref, o_ref, scratch):
        def cond(c):
            return c[0] < ITERS

        def body(c):
            i, acc = c

            @pl.when(i % 8 == 0)
            def _():
                scratch[:] = x_ref[0:2, :] + i

            return (i + 1, acc + scratch[:])

        _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((2, L), jnp.int32))
        )
        o_ref[:] = acc[0:1, :]

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2, L), jnp.int32)],
        )(x)

    return fn, (jnp.ones((W, L), jnp.int32),)


# P5: static-slice ref read+write with carried mask (lit-swap pattern)
def p5():
    def kernel(x_ref, o_ref):
        def cond(c):
            return c[0] < ITERS

        def body(c):
            i, mask, acc = c
            total = acc
            for s in range(4):
                seg = x_ref[s * 512:(s + 1) * 512, :]
                seg2 = jnp.where(mask[None, :] == s, seg + 1, seg)
                x_ref[s * 512:(s + 1) * 512, :] = seg2
                total = total + jnp.max(seg2, axis=0)
            return (i + 1, (mask + 1) % 4, total)

        _, _, acc = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.zeros((L,), jnp.int32),
             jnp.zeros((L,), jnp.int32)),
        )
        o_ref[:] = acc[None, :]

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return fn, (jnp.ones((W, L), jnp.int32),)


# P6: [None, :] on an expression mixing carried vec with reduce output
def p6():
    def kernel(x_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (W, L), 0)

        def cond(c):
            return c[1] < ITERS

        def body(c):
            idx, i, acc = c
            word = jnp.sum(
                jnp.where(rows == (idx >> 2)[None, :], x_ref[:], 0), axis=0
            )
            sh = (idx & 3) * 8
            byte = (word >> sh) & 0xFF
            return ((idx + byte + 1) % W, i + 1, acc + byte)

        idx0 = jnp.zeros((L,), jnp.int32)
        _, _, acc = jax.lax.while_loop(
            cond, body, (idx0, jnp.int32(0), jnp.zeros((L,), jnp.int32))
        )
        o_ref[:] = acc[None, :]

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return fn, (jnp.ones((W, L), jnp.int32),)


if __name__ == "__main__":
    print("devices:", jax.devices())
    for name, build in [
        ("P1 while-carried 1D idx onehot [W,L]", p1),
        ("P2 while-carried [1,L] idx keepdims", p2),
        ("P3 P2 + masked onehot ref write", p3),
        ("P4 pl.when ref write in while", p4),
        ("P5 static-slice swap with carried mask", p5),
        ("P6 packed-word read + shift extract", p6),
    ]:
        run(name, build)
