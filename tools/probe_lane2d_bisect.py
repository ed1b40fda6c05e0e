#!/usr/bin/env python3
"""Bisect which construct in the 2-D bitdecode probe trips Mosaic's
'Invalid relayout {0,0} -> {*,*}'. Variants strip stages cumulatively."""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 32
ROWS = 648
S = 8


def try_case(name, body_builder, nread=True):
    def kernel(x_ref, o_ref, tab_ref):
        tab_ref[:] = x_ref[:]
        rows = jax.lax.broadcasted_iota(jnp.int32, (ROWS, S, 128), 0)

        body = body_builder(tab_ref, rows)

        def cond(c):
            return c[-1] < ITERS

        z = x_ref[0] * 0
        out = jax.lax.while_loop(
            cond, body,
            (z, z + 1, z - 1, z + 12345, jnp.zeros((), jnp.int32)))
        o_ref[:] = out[0] + out[1] + out[2] + out[3]

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((ROWS, S, 128), jnp.int32)],
        )(x)

    try:
        jax.block_until_ready(fn(jnp.full((ROWS, S, 128), 1024, jnp.int32)))
        print(f"{name:40s} OK")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        i = msg.find("Invalid relayout")
        j = msg.find("Not implemented")
        k = max(i, j)
        print(f"{name:40s} FAIL {msg[k:k+120] if k >= 0 else msg[:120]}")


# v1: index ops only, no table access
def v1(tab_ref, rows):
    def body(c):
        idx, acc, rng, cod, i = c
        for k in range(10):
            idx = jnp.where(acc > k, idx + 1, idx)
        idx = jnp.clip(idx, 0, ROWS - 1)
        acc = (acc << 1) | (idx & 1)
        acc = jnp.where(acc > 0x100, 1, acc)
        return idx, acc, rng, cod, i + 1
    return body


# v2: + one-hot read
def v2(tab_ref, rows):
    def body(c):
        idx, acc, rng, cod, i = c
        for k in range(10):
            idx = jnp.where(acc > k, idx + 1, idx)
        idx = jnp.clip(idx, 0, ROWS - 1)
        sel = jnp.where(rows == idx[None], tab_ref[:], 0)
        p = jnp.sum(sel, axis=0)
        acc = (acc << 1) | (p & 1)
        acc = jnp.where(acc > 0x100, 1, acc)
        return idx, acc, rng, cod, i + 1
    return body


# v3: + uint arithmetic (bound/bit)
def v3(tab_ref, rows):
    def body(c):
        idx, acc, rng, cod, i = c
        for k in range(10):
            idx = jnp.where(acc > k, idx + 1, idx)
        idx = jnp.clip(idx, 0, ROWS - 1)
        sel = jnp.where(rows == idx[None], tab_ref[:], 0)
        p = jnp.sum(sel, axis=0)
        bound = (rng.astype(jnp.uint32) >> 11) * (p & 0x7FF).astype(jnp.uint32)
        bit = (cod.astype(jnp.uint32) >= bound).astype(jnp.int32)
        rng = jnp.where(bit == 1, rng - bound.astype(jnp.int32), rng | 1)
        cod = cod ^ bit
        acc = (acc << 1) | bit
        acc = jnp.where(acc > 0x100, 1, acc)
        return idx, acc, rng, cod, i + 1
    return body


# v4: + masked table write (full bitdecode)
def v4(tab_ref, rows):
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
    return body


# v5: v4 but table write via arithmetic blend instead of where-mask
def v5(tab_ref, rows):
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
        pm32 = (rows == idx[None]).astype(jnp.int32)
        tab_ref[:] = tab_ref[:] + (newp[None] - tab_ref[:]) * pm32
        rng = jnp.where(bit == 1, rng - bound.astype(jnp.int32), rng | 1)
        cod = cod ^ bit
        acc = (acc << 1) | bit
        acc = jnp.where(acc > 0x100, 1, acc)
        return idx, acc, rng, cod, i + 1
    return body


def _main_orig():
    for name, v in [("v1 idx-only", v1), ("v2 +onehot-read", v2),
                    ("v3 +uint-arith", v3), ("v4 +masked-write", v4),
                    ("v5 blend-write", v5)]:
        try_case(name, v)


# v2m: one-hot read via multiply-mask (no select, no splat operand)
def v2m(tab_ref, rows):
    def body(c):
        idx, acc, rng, cod, i = c
        for k in range(10):
            idx = jnp.where(acc > k, idx + 1, idx)
        idx = jnp.clip(idx, 0, ROWS - 1)
        sel = tab_ref[:] * (rows == idx[None]).astype(jnp.int32)
        p = jnp.sum(sel, axis=0)
        acc = (acc << 1) | (p & 1)
        acc = jnp.where(acc > 0x100, 1, acc)
        return idx, acc, rng, cod, i + 1
    return body


# v2max: select + max reduce
def v2max(tab_ref, rows):
    def body(c):
        idx, acc, rng, cod, i = c
        for k in range(10):
            idx = jnp.where(acc > k, idx + 1, idx)
        idx = jnp.clip(idx, 0, ROWS - 1)
        sel = jnp.where(rows == idx[None], tab_ref[:], 0)
        p = jnp.max(sel, axis=0)
        acc = (acc << 1) | (p & 1)
        acc = jnp.where(acc > 0x100, 1, acc)
        return idx, acc, rng, cod, i + 1
    return body


# v2bt: explicit broadcast_to of idx before compare
def v2bt(tab_ref, rows):
    def body(c):
        idx, acc, rng, cod, i = c
        for k in range(10):
            idx = jnp.where(acc > k, idx + 1, idx)
        idx = jnp.clip(idx, 0, ROWS - 1)
        idx3 = jnp.broadcast_to(idx[None], (ROWS, S, 128))
        sel = jnp.where(rows == idx3, tab_ref[:], 0)
        p = jnp.sum(sel, axis=0)
        acc = (acc << 1) | (p & 1)
        acc = jnp.where(acc > 0x100, 1, acc)
        return idx, acc, rng, cod, i + 1
    return body




# w1: reduce-only over the 3-D table (no carried-value interplay)
def w1(tab_ref, rows):
    def body(c):
        idx, acc, rng, cod, i = c
        p = jnp.sum(tab_ref[:], axis=0)
        acc = (acc << 1) | (p & 1)
        acc = jnp.where(acc > 0x100, 1, acc)
        return idx, acc, rng, cod, i + 1
    return body


# w2: compare with constant row id, then reduce
def w2(tab_ref, rows):
    def body(c):
        idx, acc, rng, cod, i = c
        sel = jnp.where(rows == 5, tab_ref[:], 0)
        p = jnp.sum(sel, axis=0)
        acc = (acc << 1) | (p & 1)
        acc = jnp.where(acc > 0x100, 1, acc)
        return idx, acc, rng, cod, i + 1
    return body


# w3: compare with carried idx, reduce the mask only (no table)
def w3(tab_ref, rows):
    def body(c):
        idx, acc, rng, cod, i = c
        idx = jnp.clip(idx + (acc & 1), 0, ROWS - 1)
        mask3 = (rows == idx[None]).astype(jnp.int32)
        p = jnp.sum(mask3, axis=0)
        acc = (acc << 1) | (p & 1)
        acc = jnp.where(acc > 0x100, 1, acc)
        return idx, acc, rng, cod, i + 1
    return body


# w4: 3-D compare with carried idx, no reduce (fold via static slice)
def w4(tab_ref, rows):
    def body(c):
        idx, acc, rng, cod, i = c
        idx = jnp.clip(idx + (acc & 1), 0, ROWS - 1)
        mask3 = (rows == idx[None]).astype(jnp.int32)
        p = mask3[0] + mask3[1]
        acc = (acc << 1) | (p & 1)
        acc = jnp.where(acc > 0x100, 1, acc)
        return idx, acc, rng, cod, i + 1
    return body




# w5: select table by carried idx + reduce (minimal idx update)
def w5(tab_ref, rows):
    def body(c):
        idx, acc, rng, cod, i = c
        idx = jnp.clip(idx + (acc & 1), 0, ROWS - 1)
        sel = jnp.where(rows == idx[None], tab_ref[:], 0)
        p = jnp.sum(sel, axis=0)
        acc = (acc << 1) | (p & 1)
        acc = jnp.where(acc > 0x100, 1, acc)
        return idx, acc, rng, cod, i + 1
    return body


# w6: multiply-mask table + reduce (minimal idx update)
def w6(tab_ref, rows):
    def body(c):
        idx, acc, rng, cod, i = c
        idx = jnp.clip(idx + (acc & 1), 0, ROWS - 1)
        sel = tab_ref[:] * (rows == idx[None]).astype(jnp.int32)
        p = jnp.sum(sel, axis=0)
        acc = (acc << 1) | (p & 1)
        acc = jnp.where(acc > 0x100, 1, acc)
        return idx, acc, rng, cod, i + 1
    return body


# w7: w6 but reduce via dot with ones? no — reduce over axis 1 reshaped
def w7(tab_ref, rows):
    def body(c):
        idx, acc, rng, cod, i = c
        idx = jnp.clip(idx + (acc & 1), 0, ROWS - 1)
        sel = tab_ref[:] * (rows == idx[None]).astype(jnp.int32)
        # accumulate in halves to avoid a single big multi_reduction
        h = ROWS // 2
        p = jnp.sum(sel[:h], axis=0) + jnp.sum(sel[h:], axis=0)
        acc = (acc << 1) | (p & 1)
        acc = jnp.where(acc > 0x100, 1, acc)
        return idx, acc, rng, cod, i + 1
    return body


# w8: like w3 (mask reduce, OK) but ALSO read table with const row
def w8(tab_ref, rows):
    def body(c):
        idx, acc, rng, cod, i = c
        idx = jnp.clip(idx + (acc & 1), 0, ROWS - 1)
        mask3 = (rows == idx[None]).astype(jnp.int32)
        p = jnp.sum(mask3 * 7, axis=0)
        q = jnp.sum(jnp.where(rows == 5, tab_ref[:], 0), axis=0)
        acc = (acc << 1) | ((p + q) & 1)
        acc = jnp.where(acc > 0x100, 1, acc)
        return idx, acc, rng, cod, i + 1
    return body


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else ""
    names = ["v1 idx-only", "v2 +onehot-read", "v3 +uint-arith",
             "v4 +masked-write", "v5 blend-write", "v2m mult-mask",
             "v2max max-reduce", "v2bt broadcast_to", "w1 reduce-only",
             "w2 const-cmp", "w3 mask-reduce", "w4 cmp-no-reduce",
             "w5 sel-tab-reduce", "w6 mult-tab-reduce",
             "w7 split-reduce", "w8 mask-plus-consttab"]
    for name in names:
        fn = globals()[name.split()[0]]
        if which in name:
            try_case(name, fn)