import sys
sys.path.insert(0, '/root/repo')
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 256
ROWS = 648
S = 8
NST = 8  # state slots


def try_case(name, build):
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
        per_lane = best * 1e9 / ITERS / lanes
        print(f"{name:44s} OK  {per_it:8.3f} us/it {per_lane:7.3f} ns/lane-bit")
    except Exception as e:
        msg = str(e)
        i = msg.find("Invalid relayout")
        j = msg.find("Not implemented")
        k2 = msg.find("Unimplemented")
        k = max(i, j, k2)
        print(f"{name:44s} FAIL {msg[k:k+160] if k>=0 else msg[:160]}")


# y1: ALL state in a scratch ref [NST, S, 128]; while carry = scalar only.
# Full bitdecode: one-hot table read by dynamic idx, adaptive update,
# masked write back, renorm-ish ops.
def y1(s_dim=S):
    Sd = s_dim
    L = Sd * 128

    def kernel(x_ref, o_ref, tab_ref, st_ref):
        tab_ref[:] = x_ref[:]
        st_ref[:] = jnp.zeros((NST, Sd, 128), jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (ROWS, Sd, 128), 0)

        def body(c):
            it = c
            idx = st_ref[0]
            acc = st_ref[1]
            rng = st_ref[2]
            cod = st_ref[3]
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
            st_ref[0] = idx
            st_ref[1] = acc
            st_ref[2] = rng
            st_ref[3] = cod
            return it + 1

        def cond(c):
            return c < ITERS

        jax.lax.while_loop(cond, body, jnp.zeros((), jnp.int32))
        o_ref[:] = st_ref[1]

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Sd, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((ROWS, Sd, 128), jnp.int32),
                            pltpu.VMEM((NST, Sd, 128), jnp.int32)],
        )(x)

    return fn, (jnp.full((ROWS, Sd, 128), 1024, jnp.int32),), L


# y2: same but state slots as SEPARATE [S,128] refs (no leading dim)
def y2():
    L = S * 128

    def kernel(x_ref, o_ref, tab_ref, idx_ref, acc_ref, rng_ref, cod_ref):
        tab_ref[:] = x_ref[:]
        idx_ref[:] = jnp.zeros((S, 128), jnp.int32)
        acc_ref[:] = jnp.zeros((S, 128), jnp.int32)
        rng_ref[:] = jnp.zeros((S, 128), jnp.int32)
        cod_ref[:] = jnp.zeros((S, 128), jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (ROWS, S, 128), 0)

        def body(c):
            it = c
            idx = idx_ref[:]
            acc = acc_ref[:]
            rng = rng_ref[:]
            cod = cod_ref[:]
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
            idx_ref[:] = idx
            acc_ref[:] = acc
            rng_ref[:] = rng
            cod_ref[:] = cod
            return it + 1

        def cond(c):
            return c < ITERS

        jax.lax.while_loop(cond, body, jnp.zeros((), jnp.int32))
        o_ref[:] = acc_ref[:]

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((ROWS, S, 128), jnp.int32)] +
                           [pltpu.VMEM((S, 128), jnp.int32)] * 4,
        )(x)

    return fn, (jnp.full((ROWS, S, 128), 1024, jnp.int32),), L




# y4: realistic step-body weight: ~500 tiny ops + 2 table passes +
# 2 window-port passes (ring 512 rows) + write port, state in refs
def y4(s_dim=8, nops=500):
    Sd = s_dim
    L = Sd * 128
    RW = 512

    def kernel(x_ref, o_ref, tab_ref, st_ref, ring_ref):
        tab_ref[:] = x_ref[:]
        st_ref[:] = jnp.zeros((16, Sd, 128), jnp.int32)
        ring_ref[:] = jnp.zeros((RW, Sd, 128), jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (ROWS, Sd, 128), 0)
        rrows = jax.lax.broadcasted_iota(jnp.int32, (RW, Sd, 128), 0)

        def body(c):
            it = c
            idx = st_ref[0]; acc = st_ref[1]; rng = st_ref[2]; cod = st_ref[3]
            a = st_ref[4]; b = st_ref[5]; d = st_ref[6]
            # ~nops tiny dependent ops (stand-in for DFA dispatch)
            for k in range(nops // 3):
                a = jnp.where(b > (k & 7), a + 1, a - d)
                b = (b ^ a) & 0xFFFF
                d = jnp.where(a > b, d | 1, d << 1)
            idx = jnp.clip(idx + (a & 1), 0, ROWS - 1)
            # prob read + write
            sel = jnp.where(rows == idx[None], tab_ref[:], 0)
            p = jnp.sum(sel, axis=0)
            bound = (rng.astype(jnp.uint32) >> 11) * (p & 0x7FF).astype(jnp.uint32)
            bit = (cod.astype(jnp.uint32) >= bound).astype(jnp.int32)
            newp = jnp.where(bit == 1, p - (p >> 5), p + 3)
            pm = rows == idx[None]
            tab_ref[:] = jnp.where(pm, newp[None], tab_ref[:])
            # window port: two ring reads + RMW write
            pw = (a & (RW - 1))
            w0 = jnp.sum(jnp.where(rrows == pw[None], ring_ref[:], 0), axis=0)
            w1 = jnp.sum(jnp.where(rrows == ((pw + 1) & (RW - 1))[None], ring_ref[:], 0), axis=0)
            old = jnp.sum(jnp.where(rrows == (b & (RW - 1))[None], ring_ref[:], 0), axis=0)
            neww = (old & ~0xFF) | (w0 & 0xFF) | (w1 & 0)
            wm = (rrows == (b & (RW - 1))[None]) & (bit == 1)[None]
            ring_ref[:] = jnp.where(wm, neww[None], ring_ref[:])
            rng = jnp.where(bit == 1, rng - bound.astype(jnp.int32), rng | 1)
            cod = cod ^ bit
            acc = (acc << 1) | bit
            acc = jnp.where(acc > 0x100, 1, acc)
            st_ref[0] = idx; st_ref[1] = acc; st_ref[2] = rng; st_ref[3] = cod
            st_ref[4] = a; st_ref[5] = b; st_ref[6] = d
            return it + 1

        def cond(c):
            return c < ITERS

        jax.lax.while_loop(cond, body, jnp.zeros((), jnp.int32))
        o_ref[:] = st_ref[1]

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Sd, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((ROWS, Sd, 128), jnp.int32),
                            pltpu.VMEM((16, Sd, 128), jnp.int32),
                            pltpu.VMEM((512, Sd, 128), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x)

    return fn, (jnp.full((ROWS, Sd, 128), 1024, jnp.int32),), L


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else ""
    if which in ("", "y1"):
        try_case("y1 state-in-ref [NST,S,128]", lambda: y1())
    if which in ("", "y2"):
        try_case("y2 state-in-4-refs [S,128]", y2)
    if which in ("", "y3"):
        try_case("y3 state-in-ref S=16", lambda: y1(16))
    if which in ("", "y4"):
        try_case("y4 real-weight S=8 nops=500", lambda: y4(8, 500))
    if which in ("", "y5"):
        try_case("y5 real-weight S=16 nops=500", lambda: y4(16, 500))
    if which in ("", "y6"):
        try_case("y6 real-weight S=8 nops=250", lambda: y4(8, 250))