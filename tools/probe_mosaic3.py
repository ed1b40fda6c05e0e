#!/usr/bin/env python3
"""Third Mosaic probe round: (a) find the construct behind 'Invalid
relayout (1,128)->{*,*}(8,128)' — prime suspect: vector reduce-to-scalar
in the while cond; (b) isolate per-op costs that shape the kernel design
(variable shifts, sum vs max one-hot, unroll amortization)."""

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
        jax.block_until_ready(fn(*args))
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        warm = time.perf_counter() - t0
        print(f"{name:48s} OK  compile {dt:6.1f}s  warm {warm*1e6/ITERS:8.3f} us/it")
    except Exception as e:  # noqa: BLE001
        lines = [ln for ln in str(e).splitlines() if ln.strip()]
        msg = ""
        for ln in lines:
            if "Mosaic" in ln or "relayout" in ln or "NotImplemented" in ln:
                msg = ln.strip()[:140]
                break
        print(f"{name:48s} FAIL {msg or (lines[0][:140] if lines else '?')}")


def _wrap(kernel, nouts=1):
    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return fn, (jnp.ones((W, L), jnp.int32),)


# P7: while cond = jnp.any over a carried [L] bool
def p7():
    def kernel(x_ref, o_ref):
        def cond(c):
            node, i = c
            return jnp.any(node < 5) & (i < ITERS)

        def body(c):
            node, i = c
            return (node + (i & 1), i + 1)

        node, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros((L,), jnp.int32), jnp.int32(0))
        )
        o_ref[:] = node[None, :]

    return _wrap(kernel)


# P8: cond via max-reduce to scalar on i32
def p8():
    def kernel(x_ref, o_ref):
        def cond(c):
            node, i = c
            active = jnp.max(jnp.where(node < 5, 1, 0))
            return (active == 1) & (i < ITERS)

        def body(c):
            node, i = c
            return (node + (i & 1), i + 1)

        node, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros((L,), jnp.int32), jnp.int32(0))
        )
        o_ref[:] = node[None, :]

    return _wrap(kernel)


# P9: cond via scalar carried flag, recomputed in body (reduce in body)
def p9():
    def kernel(x_ref, o_ref):
        def cond(c):
            node, i, active = c
            return (active == 1) & (i < ITERS)

        def body(c):
            node, i, _ = c
            node = node + (i & 1)
            active = jnp.max(jnp.where(node < 5, 1, 0))
            return (node, i + 1, active)

        node, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.zeros((L,), jnp.int32), jnp.int32(0), jnp.int32(1)),
        )
        o_ref[:] = node[None, :]

    return _wrap(kernel)


# P10: jnp.concatenate of [32, L] chunks inside while body
def p10():
    def kernel(x_ref, o_ref):
        def cond(c):
            return c[0] < ITERS

        def body(c):
            i, acc = c
            a = x_ref[0:32, :] + i
            b = x_ref[32:64, :] + i
            cat = jnp.concatenate([a, b], axis=0)  # [64, L]
            return (i + 1, acc + jnp.max(cat, axis=0))

        _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((L,), jnp.int32))
        )
        o_ref[:] = acc[None, :]

    return _wrap(kernel)


# P11a: variable per-lane shift on [L]
def p11a():
    def kernel(x_ref, o_ref):
        def cond(c):
            return c[0] < ITERS

        def body(c):
            i, v = c
            sh = (v & 3) * 8
            v2 = ((v >> sh) & 0xFF) + i
            return (i + 1, v2)

        _, v = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((L,), jnp.int32))
        )
        o_ref[:] = v[None, :]

    return _wrap(kernel)


# P11b: constant-shift 4-way select instead of variable shift
def p11b():
    def kernel(x_ref, o_ref):
        def cond(c):
            return c[0] < ITERS

        def body(c):
            i, v = c
            k = v & 3
            b = jnp.where(
                k == 0, v & 0xFF,
                jnp.where(
                    k == 1, (v >> 8) & 0xFF,
                    jnp.where(k == 2, (v >> 16) & 0xFF, (v >> 24) & 0xFF),
                ),
            )
            return (i + 1, b + i)

        _, v = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((L,), jnp.int32))
        )
        o_ref[:] = v[None, :]

    return _wrap(kernel)


# P12: sum-reduce vs max-reduce one-hot over [W, L]
def p12(reduce_sum):
    def build():
        def kernel(x_ref, o_ref):
            rows = jax.lax.broadcasted_iota(jnp.int32, (W, L), 0)

            def cond(c):
                return c[1] < ITERS

            def body(c):
                idx, i, acc = c
                sel = jnp.where(rows == idx[None, :], x_ref[:], 0)
                if reduce_sum:
                    v = jnp.sum(sel, axis=0)
                else:
                    v = jnp.max(sel, axis=0)
                return ((idx + v + 1) % W, i + 1, acc + v)

            idx0 = jnp.zeros((L,), jnp.int32)
            _, _, acc = jax.lax.while_loop(
                cond, body, (idx0, jnp.int32(0), jnp.zeros((L,), jnp.int32))
            )
            o_ref[:] = acc[None, :]

        return _wrap(kernel)

    return build


# P13: unrolled body (8 dependent one-hots per while iteration)
def p13():
    def kernel(x_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (W, L), 0)

        def cond(c):
            return c[1] < ITERS // 8

        def body(c):
            idx, i, acc = c
            for _ in range(8):
                sel = jnp.where(rows == idx[None, :], x_ref[:], 0)
                v = jnp.max(sel, axis=0)
                acc = acc + v
                idx = (idx + v + 1) % W
            return (idx, i + 1, acc)

        idx0 = jnp.zeros((L,), jnp.int32)
        _, _, acc = jax.lax.while_loop(
            cond, body, (idx0, jnp.int32(0), jnp.zeros((L,), jnp.int32))
        )
        o_ref[:] = acc[None, :]

    return _wrap(kernel)


# P14/P15: one-hot over SMALL row counts (sub-vreg / few-vreg heights)
def p_small(rows_n):
    def build():
        def kernel(x_ref, o_ref):
            rows = jax.lax.broadcasted_iota(jnp.int32, (rows_n, L), 0)

            def cond(c):
                return c[1] < ITERS

            def body(c):
                idx, i, acc = c
                sel = jnp.where(rows == idx[None, :], x_ref[0:rows_n, :], 0)
                v = jnp.max(sel, axis=0)
                return ((idx + v + 1) % rows_n, i + 1, acc + v)

            idx0 = jnp.zeros((L,), jnp.int32)
            _, _, acc = jax.lax.while_loop(
                cond, body, (idx0, jnp.int32(0), jnp.zeros((L,), jnp.int32))
            )
            o_ref[:] = acc[None, :]

        return _wrap(kernel)

    return build


# P16: refill-style mask select over [32, L] slices with carried base
def p16():
    def kernel(x_ref, o_ref, t_ref):
        def cond(c):
            return c[0] < ITERS

        def body(c):
            i, base, acc = c
            row0 = (base // 128)[None, :]
            acc0 = jnp.zeros((32, L), jnp.int32)
            acc1 = jnp.zeros((32, L), jnp.int32)
            for r in range(W // 32):
                chunk = x_ref[r * 32:(r + 1) * 32, :]
                acc0 = jnp.where(row0 + 0 == r, chunk, acc0)
                acc1 = jnp.where(row0 + 1 == r, chunk, acc1)
            t_ref[:] = jnp.concatenate([acc0, acc1], axis=0)
            v = jnp.max(t_ref[:], axis=0)
            return (i + 1, (base + v + 129) % (W * 16), acc + v)

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
            scratch_shapes=[pltpu.VMEM((64, L), jnp.int32)],
        )(x)

    return fn, (jnp.ones((W, L), jnp.int32),)


if __name__ == "__main__":
    print("devices:", jax.devices())
    for name, build in [
        ("P7 cond: jnp.any over carried vec", p7),
        ("P8 cond: max-reduce to scalar", p8),
        ("P9 cond: carried scalar flag", p9),
        ("P10 concatenate in body", p10),
        ("P11a variable per-lane shift", p11a),
        ("P11b constant-shift 4-way select", p11b),
        ("P12s one-hot sum-reduce [2048,128]", p12(True)),
        ("P12m one-hot max-reduce [2048,128]", p12(False)),
        ("P13 8x-unrolled dependent one-hots", p13),
        ("P14 one-hot over [8, L]", p_small(8)),
        ("P15 one-hot over [64, L]", p_small(64)),
        ("P16 refill mask-select + concat + scratch", p16),
    ]:
        run(name, build)
