#!/usr/bin/env python3
"""Round-4 pass-cost probes for the gen-2 VMEM kernel.

Measures, on real TPU, the primitive costs that decide the round-4
kernel levers (docs/KERNEL_r03.md "round-4 levers"):

  selN        N chained full-table one-hot selects per iteration over a
              (784, 16, 128) i32 table (the production prob-table shape
              at L=2048). Marginal cost of N vs 1 tells us whether
              Mosaic fuses parallel selects and what one pass costs.
  par3        3 *independent* selects issued together (the TB=2 j=0
              pword/u0w/u1w shape) - auto-fusion test.
  blend_par3  the full current j=0 prob stage: one 2-deep blend write
              pass + 3 independent selects (what the kernel pays today).
  fused3      ONE manual traversal (fori_loop over 8-row blocks) with 3
              select accumulators - forced fusion.
  fusedb3     manual traversal doing blend write AND 3 selects in the
              same pass (load once, store once).
  i16_1       one select over the same table stored as (1568,16,128)
              i16 (same bytes, 2x elements per vreg) - native-i16 rate.
  i8_1        one select over (3136,16,128) i8 - native-i8 rate.
  wide4       block-compare trick: table viewed (196,4,16,128), compare
              once per 4-row block, sum block then 4-way extract.
  gather_taa  sublane take_along_axis (8,128) - availability + cost.

Run: python tools/probe_round4.py [case ...]
"""

import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lzma_rs_tpu.parallel import runtime as _rt  # enables compile cache

ITERS = 16384
ROWS = 784          # production PROB_WORDS at lc=0 NLIT=1 (approx)
S = 16              # L=2048 lane tiles
_I32 = jnp.int32


def timeit(name, build):
    try:
        fn, args, extra = build()

        def call(i):
            seed = jnp.full((S, 128), i + 1, _I32)
            return fn(*args, seed)

        t0 = time.perf_counter()
        jax.block_until_ready(call(0))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for i in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(call(i + 1))
            best = min(best, time.perf_counter() - t0)
        per_it = best * 1e6 / ITERS
        print(f"{name:14s} OK  {per_it:8.3f} us/it   "
              f"(compile {compile_s:.1f}s) {extra}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:200]
        print(f"{name:14s} FAIL {msg}", flush=True)


def _mk(kernel_body, scratches, out_dtype=_I32):
    """Common harness: while_loop(ITERS) around kernel_body(st, refs)."""

    def kernel(x_ref, seed_ref, o_ref, tab_ref, st_ref, *rest):
        tab_ref[:] = x_ref[:]
        st_ref[:] = jnp.zeros_like(st_ref)
        st_ref[0] = seed_ref[:]

        def body(c):
            kernel_body(tab_ref, st_ref, *rest)
            return c + 1

        jax.lax.while_loop(lambda c: c < ITERS, body, jnp.zeros((), _I32))
        o_ref[:] = st_ref[0]

    @jax.jit
    def fn(x, seed):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), _I32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=scratches,
        )(x, seed)

    return fn


def _idx_mix(st_ref, k, width):
    """Data-dependent index derived from slot k (defeats hoisting)."""
    v = st_ref[k]
    return jnp.clip((v * 40499 + (v >> 3)) & (width - 1) if (
        width & (width - 1)) == 0 else ((v * 40499) & 1023), 0, width - 1)


def sel_n(n):
    def build():
        tab_shape = (ROWS, S, 128)

        def body(tab_ref, st_ref):
            rows = jax.lax.broadcasted_iota(_I32, tab_shape, 0)
            acc = st_ref[0]
            for j in range(n):
                idx = _idx_mix(st_ref, 0, ROWS) + j
                idx = jnp.clip(idx, 0, ROWS - 1)
                sel = jnp.where(rows == idx[None], tab_ref[:], 0)
                v = jnp.sum(sel, axis=0)
                acc = acc + v  # chain
                st_ref[0] = acc & 0xFFFF
            st_ref[0] = acc & 0xFFFF

        fn = _mk(body, [pltpu.VMEM(tab_shape, _I32),
                        pltpu.VMEM((4, S, 128), _I32)])
        x = (jnp.arange(int(jnp.prod(jnp.array(tab_shape))), dtype=_I32)
         .reshape(tab_shape) % 2047)
        return fn, (x,), ""

    return build


def par3():
    def build():
        tab_shape = (ROWS, S, 128)

        def body(tab_ref, st_ref):
            rows = jax.lax.broadcasted_iota(_I32, tab_shape, 0)
            i0 = _idx_mix(st_ref, 0, ROWS)
            i1 = jnp.clip(i0 + 17, 0, ROWS - 1)
            i2 = jnp.clip(i0 + 33, 0, ROWS - 1)
            t = tab_ref[:]
            v0 = jnp.sum(jnp.where(rows == i0[None], t, 0), axis=0)
            v1 = jnp.sum(jnp.where(rows == i1[None], t, 0), axis=0)
            v2 = jnp.sum(jnp.where(rows == i2[None], t, 0), axis=0)
            st_ref[0] = (st_ref[0] + v0 + v1 + v2) & 0xFFFF

        fn = _mk(body, [pltpu.VMEM(tab_shape, _I32),
                        pltpu.VMEM((4, S, 128), _I32)])
        x = (jnp.arange(int(jnp.prod(jnp.array(tab_shape))), dtype=_I32)
         .reshape(tab_shape) % 2047)
        return fn, (x,), ""

    return build


def blend_par3():
    def build():
        tab_shape = (ROWS, S, 128)

        def body(tab_ref, st_ref):
            rows = jax.lax.broadcasted_iota(_I32, tab_shape, 0)
            i0 = _idx_mix(st_ref, 0, ROWS)
            i1 = jnp.clip(i0 + 17, 0, ROWS - 1)
            i2 = jnp.clip(i0 + 33, 0, ROWS - 1)
            pw0 = jnp.clip(i0 + 5, 0, ROWS - 1)
            pw1 = jnp.clip(i0 + 9, 0, ROWS - 1)
            w0 = st_ref[1]
            w1 = st_ref[2]
            tab_ref[:] = jnp.where(
                rows == pw1[None], w1[None],
                jnp.where(rows == pw0[None], w0[None], tab_ref[:]),
            )
            t = tab_ref[:]
            v0 = jnp.sum(jnp.where(rows == i0[None], t, 0), axis=0)
            v1 = jnp.sum(jnp.where(rows == i1[None], t, 0), axis=0)
            v2 = jnp.sum(jnp.where(rows == i2[None], t, 0), axis=0)
            st_ref[0] = (st_ref[0] + v0 + v1 + v2) & 0xFFFF
            st_ref[1] = (w0 + v0) & 0x7FF
            st_ref[2] = (w1 + v1) & 0x7FF

        fn = _mk(body, [pltpu.VMEM(tab_shape, _I32),
                        pltpu.VMEM((4, S, 128), _I32)])
        x = (jnp.arange(int(jnp.prod(jnp.array(tab_shape))), dtype=_I32)
         .reshape(tab_shape) % 2047)
        return fn, (x,), ""

    return build


def fused_n(n, with_blend, B=8):
    """Manual single traversal: fori over ROWS//B blocks, B-row static
    unroll inside; n select accumulators (+ optional 2-pending blend)."""

    def build():
        NB = ROWS // B
        tab_shape = (NB * B, S, 128)

        def body(tab_ref, st_ref):
            i0 = _idx_mix(st_ref, 0, NB * B)
            idxs = [jnp.clip(i0 + 17 * j, 0, NB * B - 1) for j in range(n)]
            pw0 = jnp.clip(i0 + 5, 0, NB * B - 1)
            pw1 = jnp.clip(i0 + 9, 0, NB * B - 1)
            w0 = st_ref[1]
            w1 = st_ref[2]

            def blk(b, accs):
                base = b * B
                blkv = tab_ref[pl.ds(base, B)]  # (B, S, 128)
                rows_b = jax.lax.broadcasted_iota(
                    _I32, (B, S, 128), 0
                ) + base
                if with_blend:
                    blkv = jnp.where(
                        rows_b == pw1[None], w1[None],
                        jnp.where(rows_b == pw0[None], w0[None], blkv),
                    )
                    tab_ref[pl.ds(base, B)] = blkv
                out = []
                for j in range(n):
                    sel = jnp.where(rows_b == idxs[j][None], blkv, 0)
                    out.append(accs[j] + jnp.sum(sel, axis=0))
                return tuple(out)

            accs = tuple(jnp.zeros((S, 128), _I32) for _ in range(n))
            accs = jax.lax.fori_loop(0, NB, blk, accs)
            st_ref[0] = (st_ref[0] + sum(accs)) & 0xFFFF
            if with_blend:
                st_ref[1] = (w0 + accs[0]) & 0x7FF
                st_ref[2] = (w1 + accs[1 % n]) & 0x7FF

        fn = _mk(body, [pltpu.VMEM(tab_shape, _I32),
                        pltpu.VMEM((4, S, 128), _I32)])
        x = (jnp.arange(int(jnp.prod(jnp.array(tab_shape))), dtype=_I32)
         .reshape(tab_shape) % 2047)
        return fn, (x,), f"B={B}"

    return build


def narrow_1(dtype, mult):
    """One select over the table stored as narrow ints (same bytes)."""

    def build():
        R = ROWS * mult
        tab_shape = (R, S, 128)

        def body(tab_ref, st_ref):
            rows = jax.lax.broadcasted_iota(_I32, tab_shape, 0)
            i0 = _idx_mix(st_ref, 0, R)
            sel = jnp.where(
                rows == i0[None], tab_ref[:], jnp.zeros_like(tab_ref)
            )
            v = jnp.sum(sel.astype(_I32), axis=0)
            st_ref[0] = (st_ref[0] + v) & 0xFFFF

        def kernel(x_ref, o_ref, tab_ref, st_ref):
            tab_ref[:] = x_ref[:]
            st_ref[:] = jnp.zeros_like(st_ref)

            def b(c):
                body(tab_ref, st_ref)
                return c + 1

            jax.lax.while_loop(lambda c: c < ITERS, b, jnp.zeros((), _I32))
            o_ref[:] = st_ref[0]

        @jax.jit
        def fn(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((S, 128), _I32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM(tab_shape, dtype),
                                pltpu.VMEM((4, S, 128), _I32)],
            )(x)

        import numpy as _np
        x = jnp.asarray((_np.arange(_np.prod(tab_shape)) % 97)
                        .reshape(tab_shape), dtype)
        return fn, (x,), f"rows={R}"

    return build


def wide4():
    def build():
        NB = ROWS // 4
        tab_shape = (NB, 4, S, 128)

        def body(tab_ref, st_ref):
            brows = jax.lax.broadcasted_iota(_I32, (NB, 1, S, 128), 0)
            i0 = _idx_mix(st_ref, 0, ROWS)
            hi = (i0 >> 2)[None, None]
            sel = jnp.where(
                brows == hi, tab_ref[:], 0
            )
            blk = jnp.sum(sel, axis=0)  # (4, S, 128)
            lo = i0 & 3
            v = jnp.where(
                lo == 0, blk[0],
                jnp.where(lo == 1, blk[1],
                          jnp.where(lo == 2, blk[2], blk[3])),
            )
            st_ref[0] = (st_ref[0] + v) & 0xFFFF

        fn = _mk(body, [pltpu.VMEM(tab_shape, _I32),
                        pltpu.VMEM((4, S, 128), _I32)])
        x = (jnp.arange(int(jnp.prod(jnp.array(tab_shape))), dtype=_I32)
         .reshape(tab_shape) % 2047)
        return fn, (x,), ""

    return build


def gather_taa():
    def build():
        tab_shape = (8, S, 128)

        def body(tab_ref, st_ref):
            idx = (st_ref[0] & 7)
            # per-(s,m) gather across the leading 8: reshape so the
            # gathered axis is the sublane axis of a (8,128) tile
            t0 = tab_ref[:, 0, :]  # (8, 128) one s-slice
            g = jnp.take_along_axis(
                t0, jnp.broadcast_to(idx[0][None, :] & 7, (8, 128)) % 8,
                axis=0,
            )
            st_ref[0] = (st_ref[0] + g[0][None, :]) & 0xFFFF

        fn = _mk(body, [pltpu.VMEM(tab_shape, _I32),
                        pltpu.VMEM((4, S, 128), _I32)])
        x = (jnp.arange(int(jnp.prod(jnp.array(tab_shape))), dtype=_I32)
         .reshape(tab_shape) % 2047)
        return fn, (x,), ""

    return build


def null_case():
    def build():
        def body(tab_ref, st_ref):
            st_ref[0] = (st_ref[0] * 5 + 1) & 0xFFFF

        fn = _mk(body, [pltpu.VMEM((8, S, 128), _I32),
                        pltpu.VMEM((4, S, 128), _I32)])
        x = jnp.zeros((8, S, 128), _I32)
        return fn, (x,), ""

    return build


CASES = {
    "null": null_case(),
    "sel1": sel_n(1),
    "sel2": sel_n(2),
    "sel3": sel_n(3),
    "sel4": sel_n(4),
    "par3": par3(),
    "blend_par3": blend_par3(),
    "fused3": fused_n(3, False),
    "fusedb3": fused_n(3, True),
    "fusedb3_B16": fused_n(3, True, B=16),
    "fusedb7": fused_n(7, True),
    "i16_1": narrow_1(jnp.int16, 2),
    "i8_1": narrow_1(jnp.int8, 4),
    "wide4": wide4(),
    "gather_taa": gather_taa(),
}


def main():
    names = sys.argv[1:] or list(CASES)
    print(f"devices: {jax.devices()}", flush=True)
    for name in names:
        timeit(name, CASES[name])




def sel_s(s_dim, rows, fold=1):
    """One select over (rows, s_dim, 128); fold>1 stores the table as
    (rows//fold, fold*s_dim, 128) and extracts the sub-block."""

    def build():
        R = rows // fold
        SS = fold * s_dim
        tab_shape = (R, SS, 128)

        def kernel(x_ref, seed_ref, o_ref, tab_ref, st_ref):
            tab_ref[:] = x_ref[:]
            st_ref[:] = jnp.zeros_like(st_ref)
            st_ref[0] = seed_ref[:, :s_dim, :][0]
            rowsb = jax.lax.broadcasted_iota(_I32, (R, SS, 128), 0)
            subi = jax.lax.broadcasted_iota(_I32, (SS, 128), 0) // s_dim

            def body(c):
                v = st_ref[0]
                idx = jnp.clip((v * 40499) & 2047, 0, rows - 1)
                hi = idx // fold
                lo = idx % fold
                # broadcast lane idx (s_dim,128) across the folded block
                hi_b = jnp.tile(hi, (fold, 1))
                sel = jnp.where(rowsb == hi_b[None], tab_ref[:], 0)
                blk = jnp.sum(sel, axis=0)  # (SS, 128)
                if fold == 1:
                    out = blk
                else:
                    lo_b = jnp.tile(lo, (fold, 1))
                    picked = jnp.where(subi == lo_b, blk, 0)
                    out = sum(
                        picked[f * s_dim:(f + 1) * s_dim]
                        for f in range(fold)
                    )
                st_ref[0] = (st_ref[0] + out) & 0xFFFF
                return c + 1

            jax.lax.while_loop(
                lambda c: c < ITERS, body, jnp.zeros((), _I32)
            )
            o_ref[:] = st_ref[0]

        @jax.jit
        def fn(x, seed):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((s_dim, 128), _I32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM(tab_shape, _I32),
                                pltpu.VMEM((4, s_dim, 128), _I32)],
            )(x, jnp.reshape(seed, (1, S, 128)))

        x = (jnp.arange(R * SS * 128, dtype=_I32)
             .reshape(tab_shape) % 2047)
        return fn, (x,), f"S={s_dim} rows={rows} fold={fold}"

    return build


def blend_mask(rows):
    """Masked-merge retire blend (5-op) vs plain 2-op blend + select:
    the cur_w write scheme candidate."""

    def build():
        tab_shape = (rows, S, 128)

        def body(tab_ref, st_ref):
            rowsb = jax.lax.broadcasted_iota(_I32, tab_shape, 0)
            v = st_ref[0]
            wwi = jnp.clip((v * 40499) & 1023, 0, rows - 1)
            www = st_ref[1]
            wwm = st_ref[2] | 0xFF
            t = tab_ref[:]
            merged = t ^ ((t ^ www[None]) & wwm[None])
            tab_ref[:] = jnp.where(rowsb == wwi[None], merged, t)
            # one port select rides along (parity-split half cost is
            # modelled separately)
            sel = jnp.where(rowsb == (wwi + 1)[None], tab_ref[:], 0)
            w0 = jnp.sum(sel, axis=0)
            st_ref[0] = (st_ref[0] + w0) & 0xFFFF
            st_ref[1] = w0
            st_ref[2] = (www >> 8) & 0xFFFF

        fn = _mk(body, [pltpu.VMEM(tab_shape, _I32),
                        pltpu.VMEM((4, S, 128), _I32)])
        x = (jnp.arange(rows * S * 128, dtype=_I32)
             .reshape(tab_shape) % 2047)
        return fn, (x,), f"rows={rows}"

    return build


def blend_oldw(rows):
    """Current write scheme: 2-op retire blend + old_w select + port
    select."""

    def build():
        tab_shape = (rows, S, 128)

        def body(tab_ref, st_ref):
            rowsb = jax.lax.broadcasted_iota(_I32, tab_shape, 0)
            v = st_ref[0]
            wwi = jnp.clip((v * 40499) & 1023, 0, rows - 1)
            www = st_ref[1]
            tab_ref[:] = jnp.where(rowsb == wwi[None], www[None],
                                   tab_ref[:])
            sel = jnp.where(rowsb == (wwi + 1)[None], tab_ref[:], 0)
            w0 = jnp.sum(sel, axis=0)
            sel2 = jnp.where(rowsb == (wwi + 2)[None], tab_ref[:], 0)
            old_w = jnp.sum(sel2, axis=0)
            st_ref[0] = (st_ref[0] + w0) & 0xFFFF
            st_ref[1] = (old_w & -256) | (w0 & 0xFF)

        fn = _mk(body, [pltpu.VMEM(tab_shape, _I32),
                        pltpu.VMEM((4, S, 128), _I32)])
        x = (jnp.arange(rows * S * 128, dtype=_I32)
             .reshape(tab_shape) % 2047)
        return fn, (x,), f"rows={rows}"

    return build


CASES["sel_s2"] = sel_s(2, 2048)
CASES["sel_s8"] = sel_s(8, 2048)
CASES["sel_s2f4"] = sel_s(2, 2048, fold=4)
CASES["blendmask512"] = blend_mask(512)
CASES["blendoldw512"] = blend_oldw(512)


if __name__ == "__main__":
    main()
