"""Gen-2 VMEM Pallas decoder: 2-D lane tiles + state-in-refs.

Same DFA, tables, and host interface as ``ops/vmem_decoder.py`` (gen-1),
re-laid-out for how Mosaic actually assigns vector registers:

- **2-D lane tiles.** Gen-1 kept per-lane state as 1-D ``[L]`` vectors,
  which Mosaic lays out *sublane-replicated*: one vreg is (8, 128), so an
  ``[L]`` op does useful work in 1/8 of every vreg. Gen-2 lanes are
  ``[S, 128]`` tiles (L = S*128 independent segments), so every tiny DFA
  op retires 8x the lanes per issue slot (measured 6.5x cheaper per
  lane-op, ``tools/probe_lane2d.py``).
- **State in scratch refs, scalars in the loop carry.** Gen-1 carried ~23
  lane vectors through ``lax.while_loop``; at L=256 that is ~60 vregs,
  and the spills to the VMEM stack dominated the 6.9 us/step cost
  (docs/DESIGN.md). It also made layout inference fragile: splat-
  initialized carries get inferred fully-replicated and concrete body
  updates cannot relayout into them (the "Invalid relayout {0,0}"
  failures, ``tools/probe_lane2d_bisect.py``). Gen-2 keeps ALL lane state
  in one ``[NSLOT, S, 128]`` VMEM scratch ref; the while carries hold
  only scalars, so there is nothing to spill and nothing to infer.
  Measured on v5e (``tools/probe_state_in_ref.py``): a realistic-weight
  step body runs 0.35 us at 1024 lanes / 0.45 us at 2048 lanes versus
  gen-1's 6.9 us at 256 lanes.

Symbol semantics, the 19-node micro-op DFA, the packed probability /
window / ring layouts, chunk scheduling, and error codes are shared with
gen-1 (imported below) and mirror the executable spec (``models/spec.py``)
and the reference decoder:
  range coder:   /root/reference/src/decode/rangecoder.rs:93-152
  state machine: /root/reference/src/decode/lzma.rs:278-593
  LZMA2 resets:  /root/reference/src/decode/lzma2.rs:104-193

Bit-exactness is enforced by ``tests/test_vmem2_kernel.py`` (interpret
mode on CPU; compiled on TPU via the runtime dispatch tests).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lzma_rs_tpu.models.state import PROB_INIT
from lzma_rs_tpu.ops.vmem_decoder import (  # shared DFA/layout/constants
    ERR_EOF,
    ERR_EOS_EXTRA,
    ERR_DIST_OUT,
    ERR_MATCHDIST,
    ERR_NONE,
    ERR_RING,
    ERR_SHORT,
    ERR_SIZE,
    KernelConfig,
    LIT_ROW,
    N_ALIGN,
    N_CHUNK,
    N_COPY,
    N_DIRECT,
    N_DONE,
    N_ERROR,
    N_ISMATCH,
    N_ISREP,
    N_ISREP0LONG,
    N_ISREPG0,
    N_ISREPG1,
    N_ISREPG2,
    N_LEN_CHOICE,
    N_LEN_CHOICE2,
    N_LEN_TREE,
    N_LIT,
    N_LITM,
    N_POSSLOT,
    N_SPECPOS,
    _ABLATE,
    _after_lit,
    _after_match,
    _after_rep,
    _after_shortrep,
    hot_layout,
)

_I32 = jnp.int32
_U32 = jnp.uint32

# State-slot indices in the [NSLOT, S, M] scratch ref. The pw* slots are
# the deferred probability-write queue (TB=2): each step's two prob
# updates are held as (word index, word value) pairs and retired into the
# table by ONE blend traversal at the next step's first bit — reads in
# between see them via a per-lane fix-up. Index -1 = no pending write.
_SLOTS = (
    "node", "meta", "rng", "cod", "inp", "inend", "outp", "outend",
    "state", "rep0", "rep1", "rep2", "rep3", "acc", "cnt", "tmp", "rev",
    "length", "dist", "mbyte", "prevb", "tile_base",
    "pw0i", "pw0w", "pw1i", "pw1w", "wwi", "www", "pubi", "pubw",
    "pub2i", "pub2w",
    # LIT4-only pendings last: the scratch excludes these rows (and the
    # carry excludes the values) when the lit slots are off, keeping the
    # default graph byte-identical to the pre-LIT4 kernel
    "pw2i", "pw2w", "pw3i", "pw3w",
)
NSLOT = len(_SLOTS)
NSLOT_BASE = NSLOT - 4
_OUTP_SLOT = _SLOTS.index("outp")
_INP_SLOT = _SLOTS.index("inp")
_META_SLOT = _SLOTS.index("meta")
_NODE_SLOT = _SLOTS.index("node")
_TILEBASE_SLOT = _SLOTS.index("tile_base")
_PW0I_SLOT = _SLOTS.index("pw0i")
_PW0W_SLOT = _SLOTS.index("pw0w")
_PW1I_SLOT = _SLOTS.index("pw1i")
_PW1W_SLOT = _SLOTS.index("pw1w")
_PW2I_SLOT = _SLOTS.index("pw2i")
_PW2W_SLOT = _SLOTS.index("pw2w")
_PW3I_SLOT = _SLOTS.index("pw3i")
_PW3W_SLOT = _SLOTS.index("pw3w")
_WWI_SLOT = _SLOTS.index("wwi")
_WWW_SLOT = _SLOTS.index("www")
_PUBI_SLOT = _SLOTS.index("pubi")
_PUBW_SLOT = _SLOTS.index("pubw")
_PUB2I_SLOT = _SLOTS.index("pub2i")
_PUB2W_SLOT = _SLOTS.index("pub2w")


@dataclasses.dataclass(frozen=True)
class KernelConfig2(KernelConfig):
    """Gen-2 shape bucket. Identical fields; ``L`` should be a multiple
    of 128 on hardware (lanes fold into [L//128, 128] tiles). Smaller L
    is allowed for interpret-mode tests (folds into [1, L]).

    ``TB`` = tree bits decoded per step. At TB=2, lanes sitting in a
    multi-bit tree walk (literal trees, len/pos_slot/spec_pos/align
    trees, direct bits — where the NEXT probability index depends only
    on the bits accumulated so far) decode two bits per step, paying the
    probability passes twice but every other per-step pass (window port,
    window write, copy, chunk scheduling, loop overhead) once. Control
    bits (is_match/is_rep/... decisions that change the DFA node) stay
    one per step. A literal costs ~5 steps instead of 9."""

    L: int = 1024
    UNROLL: int = 2
    TB: int = 1
    #: 1 = the planner proved every lane's chunks are output-contiguous
    #: (no prefilled/stored chunks mid-lane), so the full-window path may
    #: keep the output word under construction in lane registers (same
    #: scheme ring mode always uses) instead of paying the O(W/4)
    #: old-word read-modify-write traversal each step.
    GAPFREE: int = 0
    #: 1 = two extra LIT-ONLY bit slots per step (j=2,3): literal lanes
    #: decode up to four tree bits per step, and the extra slots'
    #: probability reads traverse ONLY the literal region (LIT_W/2
    #: words) instead of the full table. Requires TB=2 and a TILE
    #: covering 4 bytes/step of renormalization input.
    LIT4: int = 0

    def __post_init__(self):
        super().__post_init__()
        # Lanes fold into [L//128, 128] vreg tiles; an L that is neither
        # a multiple of 128 nor <= 128 would produce a tile with a minor
        # axis > 128, which Mosaic cannot lower. Fail loudly at config
        # time (e.g. a bad LZMA_RS_TPU_VMEM_L override) instead of with
        # an opaque compile error.
        assert self.L % 128 == 0 or self.L <= 128, (
            f"KernelConfig2.L={self.L}: must be a multiple of 128 "
            "(hardware lane tiles) or <= 128 (interpret-mode tests)"
        )
        assert self.TB in (1, 2)
        assert not (self.LIT4 and self.TB != 2), "LIT4 requires TB=2"
        # The input-lookahead tile must cover a full maintenance period's
        # worst-case consumption (bytes/step = bits/step, one
        # renormalization per bit) plus row-alignment slack and the
        # chunk-setup margin.
        bps = 4 if self.LIT4 else self.TB
        assert self.TILE - 128 >= bps * self.MAINT + 16, (
            f"TILE={self.TILE} too small for {bps} bytes/step x MAINT="
            f"{self.MAINT} (need >= {128 + bps * self.MAINT + 16})"
        )


def _fold(L: int):
    """Lane-tile shape: (S, M) with M = 128 when possible."""
    if L % 128 == 0:
        return L // 128, 128
    return 1, L


def decode_segments_vmem2(
    inbuf,        # [W_IN//4, L] i32 — staged compressed bytes, LE-packed
    win_init,     # [W//4, L] i32 — prefilled with uncompressed chunks
    in_start,     # [K, L] i32 — lane-local chunk payload offsets
    in_end,       # [K, L] i32
    out_start,    # [K, L] i32 — lane-local output offset at chunk start
    out_end,      # [K, L] i32
    chunk_meta,   # [K, L] i32 — pack_chunk_meta(reset, lc, lp, pb, valid)
    *,
    config: KernelConfig2,
    max_iters: int,
    interpret: bool = False,
):
    """Decode all lanes to completion. Same contract as gen-1's
    ``decode_segments_vmem``: returns (win, err, outp, iters) with the
    2-D [rows, L] layout (lane tiles are internal)."""
    cfg = config
    W, W_IN, K, TILE = cfg.W, cfg.W_IN, cfg.K, cfg.TILE
    L = inbuf.shape[1]
    S, M = _fold(L)
    LIT_W = cfg.lit_w
    NPS = cfg.NPS

    HL = hot_layout(NPS)
    H_IS_MATCH = HL["is_match"]
    H_IS_REP = HL["is_rep"]
    H_G0 = HL["is_rep_g0"]
    H_G1 = HL["is_rep_g1"]
    H_G2 = HL["is_rep_g2"]
    H_REP0LONG = HL["is_rep_0long"]
    H_POS_SLOT = HL["pos_slot"]
    H_SPEC_POS = HL["spec_pos"]
    H_ALIGN = HL["align"]
    H_LEN = HL["len"]
    H_REP_LEN = HL["rep_len"]
    H_TOTAL = HL["total"]
    HOT_W = HL["padded"]
    L_LOW = HL["len_low"]
    L_MID = HL["len_mid"]
    L_HIGH = HL["len_high"]

    WIN_WORDS = W // 4
    IN_WORDS = W_IN // 4
    PROB_WORDS = (HOT_W + LIT_W) // 2  # 2 x 11-bit probs per i32 word
    PROB_PACKED = PROB_INIT | (PROB_INIT << 16)

    # Sublane fold factor: at S < 8 a (rows, S, M) vector op pads to a
    # full (8, 128) vreg (measured ~1.4x waste at S=2 even before the
    # 4x row count, tools/probe_round4.py sel_s*), so big tables store F
    # logical rows per physical row — phys[r // F, (r % F)*S + s, m] —
    # and every traversal runs over rows/F full vregs. S >= 8 keeps
    # F = 1 (no layout change for the flagship L=2048 config).
    # Fold only hardware-shaped tiles (M = 128): interpret-mode test
    # configs with L <= 128 keep F = 1 (the fold ops would slow the
    # elementwise interpreter ~5x for no coverage gain); the production
    # stock-64KiB geometry (L=256 -> S=2, M=128) folds at F=4 and is
    # exercised in interpret mode by tests/test_vmem2_kernel.py's
    # L=256 case.
    F = max(1, 8 // S) if (M == 128 and S >= 2) else 1
    FSH = max(F.bit_length() - 1, 0)
    FS = F * S
    F_P = F if PROB_WORDS % F == 0 else 1  # prob-table fold (divisibility)
    # HBM window mode (full-window path): the working halves already
    # hold the whole window in VMEM, so the (W/4, S, M) win_init input
    # and win output need not ALSO be VMEM-resident — GAPFREE plans have
    # provably-zero win_init (gap-free lanes carry no prefill) and the
    # outputs are the halves themselves, DMA'd to HBM in the epilogue.
    # Frees 2*W*L bytes of VMEM; the stock-64KiB bucket keeps L=256
    # (larger L buys nothing — per-lane step cost scales with the
    # lane-tile count, choose_vmem_config) and uses the freed VMEM as
    # headroom. Interpret mode takes the same path (the interpreter
    # emulates the DMA epilogue) so CPU tests cover it.
    HBM_WIN = (not cfg.RING) and bool(cfg.GAPFREE)
    # LIT4-only state rows live past the base layout; without the lit
    # slots the scratch (and the while-carry) is identical to the
    # pre-LIT4 kernel
    NSLOT_EFF = NSLOT if cfg.LIT4 else NSLOT_BASE
    TILE_WORDS = TILE // 4
    ROW_WORDS = 32  # 128 bytes per input row

    RW_WORDS = cfg.RING // 4 if cfg.RING else 0

    def kernel(
        in_ref, win_in_ref, is_ref, ie_ref, os_ref, oe_ref, meta_ref,
        *rest,
    ):
        # HBM_WIN replaces the single VMEM window output with two HBM
        # half outputs + a DMA semaphore pair at the end of scratch
        if HBM_WIN:
            (we_out, wo_out, err_ref, outp_ref, iters_ref,
             st_ref, prob_ref, tile_ref, *extra_scratch) = rest
            dma_sem = extra_scratch[-1]
            extra_scratch = extra_scratch[:-1]
            win_ref = None
        else:
            (win_ref, err_ref, outp_ref, iters_ref,
             st_ref, prob_ref, tile_ref, *extra_scratch) = rest
        # Ring storage is PARITY-SPLIT: even words in ring_e, odd words
        # in ring_o, each RW_WORDS/2 rows. The port needs two adjacent
        # words (pw_idx, pw_idx+1) every step — one lives in each half,
        # so the two port selects traverse RW_WORDS/2 rows each instead
        # of RW_WORDS: the port pass cost halves.
        ring_e = extra_scratch[0] if cfg.RING else None
        ring_o = extra_scratch[1] if cfg.RING else None
        RWH = RW_WORDS // 2 if cfg.RING else 0
        # Non-ring working window: parity-split (even/odd words) AND
        # sublane-folded halves. The port's two adjacent words come one
        # from each half, so the two port selects traverse W/8/F rows
        # each; win_ref itself is only the kernel output (epilogue).
        win_e = None if cfg.RING else extra_scratch[0]
        win_o = None if cfg.RING else extra_scratch[1]
        WH = 0 if cfg.RING else WIN_WORDS // 2 // F
        prob_ref[:] = jnp.full(
            (PROB_WORDS // F_P, F_P * S, M), PROB_PACKED, _I32
        )
        tile_ref[:] = jnp.zeros((TILE_WORDS, S, M), _I32)
        if cfg.RING:
            win_ref[:] = win_in_ref[:]
            ring_e[:] = jnp.zeros((RWH, S, M), _I32)
            ring_o[:] = jnp.zeros((RWH, S, M), _I32)
        elif HBM_WIN:
            # gap-free lanes carry no prefill: the window starts zero
            win_e[:] = jnp.zeros((WH, FS, M), _I32)
            win_o[:] = jnp.zeros((WH, FS, M), _I32)
        else:
            win2 = win_in_ref[:].reshape(WIN_WORDS // 2, 2, S, M)
            win_e[:] = win2[:, 0].reshape(WH, FS, M)
            win_o[:] = win2[:, 1].reshape(WH, FS, M)

        def _tile_lane(v):
            """(S, M) lane value -> (F*S, M) broadcast across fold slots."""
            return jnp.tile(v, (F, 1)) if F > 1 else v

        subi_f = (
            jax.lax.broadcasted_iota(_I32, (FS, M), 0) // S
            if F > 1 else None
        )

        def fold_read(table, idx, nrows, f):
            """Folded one-hot word read: table is (nrows//f, f*S, M),
            idx the logical (S, M) row; exact-sum recovery as in
            onehot_read_word."""
            if f == 1:
                rows = jax.lax.broadcasted_iota(_I32, (nrows, S, M), 0)
                return jnp.sum(
                    jnp.where(rows == idx[None], table, 0), axis=0
                )
            R = nrows // f
            rows = jax.lax.broadcasted_iota(_I32, (R, FS, M), 0)
            hi = _tile_lane(idx >> FSH)
            blk = jnp.sum(jnp.where(rows == hi[None], table, 0), axis=0)
            lo = _tile_lane(idx & (f - 1))
            picked = jnp.where(subi_f == lo, blk, 0)
            return jnp.sum(picked.reshape(f, S, M), axis=0)

        def fold_blend(table_ref, idx, val, nrows, f, idx2=None, val2=None):
            """Folded per-lane word write(s): table[idx] = val (and
            table[idx2] = val2, newest outermost); idx < 0 = no write.
            One traversal applies both pendings."""
            if f == 1:
                rows = jax.lax.broadcasted_iota(_I32, (nrows, S, M), 0)
                if idx2 is not None:
                    # nested single blend (newest outermost) — keeps the
                    # round-3 one-traversal structure Mosaic fuses well
                    table_ref[:] = jnp.where(
                        rows == idx2[None], val2[None],
                        jnp.where(
                            rows == idx[None], val[None], table_ref[:]
                        ),
                    )
                else:
                    table_ref[:] = jnp.where(
                        rows == idx[None], val[None], table_ref[:]
                    )
                return
            R = nrows // f
            rows = jax.lax.broadcasted_iota(_I32, (R, FS, M), 0)

            def mk(i):
                hi = _tile_lane(jnp.where(i >= 0, i >> FSH, -1))
                lo = subi_f == _tile_lane(i & (f - 1))
                return (rows == hi[None]) & lo[None]

            if idx2 is not None:
                table_ref[:] = jnp.where(
                    mk(idx2), _tile_lane(val2)[None],
                    jnp.where(
                        mk(idx), _tile_lane(val)[None], table_ref[:]
                    ),
                )
            else:
                table_ref[:] = jnp.where(
                    mk(idx), _tile_lane(val)[None], table_ref[:]
                )
        def fold_blend2_read2(
            table_ref, pend, r0i, r1i, nrows, f
        ):
            """One traversal over ``table_ref``: retire the pending
            word writes in ``pend`` (list of (idx, val), NEWEST LAST,
            negative index = none) and read TWO words from the blended
            view. Replaces the TB=2 j0 probability path's separate
            fold_blend + 2x fold_read — three full table passes — with
            one; the prob table is the single largest per-step
            traversal (NLIT tables dominate rows)."""
            if f == 1:
                rows = jax.lax.broadcasted_iota(_I32, (nrows, S, M), 0)
                # Nested selects NEWEST-OUTERMOST, inlined so the trace
                # is byte-identical to the round-4 expression (even an
                # extra inner-function NAME in the MLIR location
                # metadata perturbed Mosaic's schedule: the loop-built
                # variant measured 5.72 -> 6.38 us/step on identical
                # jaxprs).
                if len(pend) == 0:
                    blended = table_ref[:]
                elif len(pend) == 2:
                    (b0i, b0v), (b1i, b1v) = pend
                    blended = jnp.where(
                        rows == b1i[None], b1v[None],
                        jnp.where(
                            rows == b0i[None], b0v[None], table_ref[:]
                        ),
                    )
                else:
                    ((b0i, b0v), (b1i, b1v),
                     (b2i, b2v), (b3i, b3v)) = pend
                    blended = jnp.where(
                        rows == b3i[None], b3v[None],
                        jnp.where(
                            rows == b2i[None], b2v[None],
                            jnp.where(
                                rows == b1i[None], b1v[None],
                                jnp.where(
                                    rows == b0i[None], b0v[None],
                                    table_ref[:],
                                ),
                            ),
                        ),
                    )
                table_ref[:] = blended
                r0 = jnp.sum(
                    jnp.where(rows == r0i[None], blended, 0), axis=0
                )
                r1 = jnp.sum(
                    jnp.where(rows == r1i[None], blended, 0), axis=0
                )
                return r0, r1
            R = nrows // f
            rows = jax.lax.broadcasted_iota(_I32, (R, FS, M), 0)

            def mk(i):
                hi = _tile_lane(jnp.where(i >= 0, i >> FSH, -1))
                lo = subi_f == _tile_lane(i & (f - 1))
                return (rows == hi[None]) & lo[None]

            if len(pend) == 0:
                blended = table_ref[:]
            elif len(pend) == 2:
                (b0i, b0v), (b1i, b1v) = pend
                blended = jnp.where(
                    mk(b1i), _tile_lane(b1v)[None],
                    jnp.where(
                        mk(b0i), _tile_lane(b0v)[None], table_ref[:]
                    ),
                )
            else:
                ((b0i, b0v), (b1i, b1v), (b2i, b2v), (b3i, b3v)) = pend
                blended = jnp.where(
                    mk(b3i), _tile_lane(b3v)[None],
                    jnp.where(
                        mk(b2i), _tile_lane(b2v)[None],
                        jnp.where(
                            mk(b1i), _tile_lane(b1v)[None],
                            jnp.where(
                                mk(b0i), _tile_lane(b0v)[None],
                                table_ref[:],
                            ),
                        ),
                    ),
                )
            table_ref[:] = blended

            def rd(ridx):
                hi = _tile_lane(ridx >> FSH)
                blk = jnp.sum(
                    jnp.where(rows == hi[None], blended, 0), axis=0
                )
                lo = _tile_lane(ridx & (f - 1))
                picked = jnp.where(subi_f == lo, blk, 0)
                return jnp.sum(picked.reshape(f, S, M), axis=0)

            return rd(r0i), rd(r1i)

        LIT_W0 = HOT_W // 2          # first literal word (logical row)
        LIT_ROWS = LIT_W // 2        # literal-region words

        def lit_read2(l0, l1):
            """Fused pair of one-hot reads over the LITERAL region only
            (LOCAL word indices 0..LIT_ROWS): the lit-only bit slots
            (j=2,3) pay a LIT_ROWS-row pass instead of the full table.
            HOT_W is 16-padded and LIT_W0 % F_P == 0, so the region is
            a clean static slice in both plain and folded layouts."""
            base = LIT_W0 // F_P
            R = LIT_ROWS // F_P
            sl = prob_ref[base:base + R]
            if F_P == 1:
                rows = jax.lax.broadcasted_iota(_I32, (R, S, M), 0)
                r0 = jnp.sum(
                    jnp.where(rows == l0[None], sl, 0), axis=0
                )
                r1 = jnp.sum(
                    jnp.where(rows == l1[None], sl, 0), axis=0
                )
                return r0, r1
            rows = jax.lax.broadcasted_iota(_I32, (R, FS, M), 0)

            def rd(idx):
                hi = _tile_lane(idx >> FSH)
                blk = jnp.sum(
                    jnp.where(rows == hi[None], sl, 0), axis=0
                )
                lo = _tile_lane(idx & (F_P - 1))
                picked = jnp.where(subi_f == lo, blk, 0)
                return jnp.sum(picked.reshape(F_P, S, M), axis=0)

            return rd(l0), rd(l1)

        def fold_blend_read(table_ref, bidx, bval, ridx, nrows, f):
            """Fused per-half publish + port read: ONE traversal blends
            ``table[bidx] = bval`` (bidx < 0 = no write) and returns
            ``table[ridx]`` from the blended view. The write-back and
            the select ride the same pass over the rows (the round-4
            probes measured riders at ~0.4 us vs ~2.6 us for a separate
            full pass), halving the per-step window cost of the
            full-window path versus separate fold_blend + fold_read."""
            if f == 1:
                rows = jax.lax.broadcasted_iota(_I32, (nrows, S, M), 0)
                blended = jnp.where(
                    rows == bidx[None], bval[None], table_ref[:]
                )
                table_ref[:] = blended
                return jnp.sum(
                    jnp.where(rows == ridx[None], blended, 0), axis=0
                )
            R = nrows // f
            rows = jax.lax.broadcasted_iota(_I32, (R, FS, M), 0)
            bhi = _tile_lane(jnp.where(bidx >= 0, bidx >> FSH, -1))
            blo = subi_f == _tile_lane(bidx & (f - 1))
            blended = jnp.where(
                (rows == bhi[None]) & blo[None],
                _tile_lane(bval)[None], table_ref[:],
            )
            table_ref[:] = blended
            rhi = _tile_lane(ridx >> FSH)
            blk = jnp.sum(
                jnp.where(rows == rhi[None], blended, 0), axis=0
            )
            rlo = _tile_lane(ridx & (f - 1))
            picked = jnp.where(subi_f == rlo, blk, 0)
            return jnp.sum(picked.reshape(f, S, M), axis=0)

        zt = jnp.zeros((S, M), _I32)
        st_ref[:] = jnp.zeros((NSLOT_EFF, S, M), _I32)
        st_ref[_NODE_SLOT] = zt + N_CHUNK
        st_ref[2] = zt - 1  # rng = 0xFFFFFFFF
        st_ref[_PW0I_SLOT] = zt - 1  # no pending prob writes
        st_ref[_PW1I_SLOT] = zt - 1
        if cfg.LIT4:
            st_ref[_PW2I_SLOT] = zt - 1
            st_ref[_PW3I_SLOT] = zt - 1
        st_ref[_WWI_SLOT] = zt - 1  # no pending window/ring write
        st_ref[_PUBI_SLOT] = zt - 1  # no completed word awaiting publish
        st_ref[_PUB2I_SLOT] = zt - 1  # second publish slot (8-byte steps)

        def load_state():
            return tuple(st_ref[i] for i in range(NSLOT_EFF))

        def store_state(t):
            for i, v in enumerate(t):
                st_ref[i] = v

        def onehot_read_v(table, idx, width):
            """v[s,m] = table[idx[s,m], s, m]; values must be >= 0."""
            rows = jax.lax.broadcasted_iota(_I32, (width, S, M), 0)
            sel = jnp.where(rows == idx[None], table, 0)
            return jnp.max(sel, axis=0)

        def onehot_read_word(table, idx, width):
            """Packed-word read: exactly one element selected, rest zero;
            sum recovers the (possibly negative) word exactly."""
            rows = jax.lax.broadcasted_iota(_I32, (width, S, M), 0)
            sel = jnp.where(rows == idx[None], table, 0)
            return jnp.sum(sel, axis=0)

        def _extract_byte(word, k):
            # constant-shift 4-way select (per-lane variable shifts are
            # 2x slower in Mosaic, tools/probe_mosaic3.py P11)
            return jnp.where(
                k == 0, word & 0xFF,
                jnp.where(
                    k == 1, (word >> 8) & 0xFF,
                    jnp.where(k == 2, (word >> 16) & 0xFF,
                              (word >> 24) & 0xFF),
                ),
            )

        def in_byte(inp, tile_base):
            off = inp - tile_base
            word = onehot_read_word(tile_ref[:], off >> 2, TILE_WORDS)
            return _extract_byte(word, off & 3)

        def in_group(off):
            """32-bit little-endian group at tile offset ``off``: ONE
            traversal of the lookahead tile selects the two straddling
            words; alignment shifts assemble the group (same trick as the
            window port). Replaces up to four single-byte one-hot
            traversals per step."""
            i0 = off >> 2
            rows_t = jax.lax.broadcasted_iota(_I32, (TILE_WORDS, S, M), 0)
            s0 = jnp.where(rows_t == i0[None], tile_ref[:], 0)
            s1 = jnp.where(rows_t == (i0 + 1)[None], tile_ref[:], 0)
            wa = jnp.sum(s0, axis=0).astype(_U32)
            wb = jnp.sum(s1, axis=0).astype(_U32)
            a = off & 3
            return jnp.where(
                a == 0, wa,
                jnp.where(
                    a == 1, (wa >> 8) | (wb << 24),
                    jnp.where(
                        a == 2, (wa >> 16) | (wb << 16),
                        (wa >> 24) | (wb << 8),
                    ),
                ),
            )

        def refill(inp):
            """Row-aligned lookahead refill (see gen-1 docstring)."""
            if "refill" in _ABLATE:
                return
            row0 = (inp // 128)[None]
            n_rows = TILE // 128
            acc = [jnp.zeros((ROW_WORDS, S, M), _I32) for _ in range(n_rows)]
            for r in range(IN_WORDS // ROW_WORDS):
                chunk = in_ref[r * ROW_WORDS:(r + 1) * ROW_WORDS]
                for t in range(n_rows):
                    acc[t] = jnp.where(row0 + t == r, chunk, acc[t])
            tile_ref[:] = jnp.concatenate(acc, axis=0)

        def step(carry):
            # One DFA micro-op per lane. Pure function of the 22-slot
            # state tuple (values live in vregs between unrolled steps;
            # the inner loop loads/stores the slots once per UNROLL
            # group). Semantics identical to gen-1's step().
            if cfg.LIT4:
                (node0, meta0, rng, cod, inp, inend, outp, outend, state,
                 rep0, rep1, rep2, rep3, acc, cnt, tmp, rev, length, dist,
                 mbyte, prevb, tile_base, pw0i, pw0w, pw1i, pw1w,
                 wwi, www, pubi, pubw, pub2i, pub2w,
                 pw2i, pw2w, pw3i, pw3w) = carry
            else:
                (node0, meta0, rng, cod, inp, inend, outp, outend, state,
                 rep0, rep1, rep2, rep3, acc, cnt, tmp, rev, length, dist,
                 mbyte, prevb, tile_base, pw0i, pw0w, pw1i, pw1w,
                 wwi, www, pubi, pubw, pub2i, pub2w) = carry
                pw2i = pw2w = pw3i = pw3w = None
            err = meta0 & 15
            pending = (meta0 >> 4) & 3
            len_rep = (meta0 >> 6) & 1
            lit_ctx = (meta0 >> 7) & 7
            lc = (meta0 >> 10) & 15
            lp = (meta0 >> 14) & 7
            pb = (meta0 >> 17) & 7
            chunk_i = (meta0 >> 20) & 63
            imq = (meta0 >> 26) & 1  # is_match pre-consumed (copy chain)

            pos_state = outp & ((1 << pb) - 1)
            st4 = state * NPS + pos_state
            len_base = jnp.where(len_rep == 1, H_REP_LEN, H_LEN)

            # -------- Stage A/B x TB: bit-decode loop -------------------
            # j=0 serves every bit-consuming node (control + tree); j>=1
            # only lanes still inside an EVEN-BASE multi-bit tree walk
            # (len/pos_slot/align trees, plain literal trees, direct
            # bits).  For those, the second bit's two candidate entries
            # are (base + 2*acc, base + 2*acc + 1) — adjacent, and the
            # even base (hot_layout pads spec_pos for this) puts both in
            # ONE packed word, so ONE prefetch traversal at j=0 covers
            # bit 2 regardless of bit 1's value.  Matched literals
            # (N_LITM: candidates live in different 256-entry subtrees)
            # and spec_pos (mixed-parity walk bases) decode one bit per
            # step — measured cheaper than paying a third probability
            # pass every step for every lane (tools/probe_sym_stats.py:
            # litm1 model, -10% step-time on the tpu_profile corpus).
            # Tree accumulation (acc/cnt/rev/mbyte, LITM->LIT mismatch
            # drop) happens inside the loop; the node handlers below
            # consume the result via done predicates.
            node = node0
            litm0 = node0 == N_LITM
            bit0 = jnp.zeros_like(node0)
            # literal <-> is_match chaining (TB=2): a plain literal's
            # first tree bit rides j=1 of its is_match=0 step (A), and
            # the NEXT symbol's is_match bit rides j=1 of the step whose
            # j=0 bit completed a literal (B) — both successor entries
            # are pure functions of pre-step state, so the pair prefetch
            # covers them. A run of literals then costs 4.5 steps each
            # instead of 5 (is_match amortized into the tree steps).
            lit_state0 = ((outp & ((1 << lp) - 1)) << lc) + (
                prevb >> (8 - lc)
            )
            ca_mask = jnp.zeros_like(node0) == 1  # A fired this step
            cb_sel = ca_mask                      # B prefetch selected
            cb_mask = ca_mask                     # B bit consumed at j1
            bitB = bit0
            # chain C: copy lanes consume no bits, so the step whose
            # copy COMPLETES decodes the next symbol's is_match at j=0
            # (its entry depends only on state and the post-copy
            # position, both known pre-step). bit==1 proceeds straight
            # to N_ISREP; bit==0 sets the imq flag — the next step's
            # port serves the matched byte exactly like a normal
            # is_match step, minus the already-consumed bit.
            if cfg.TB == 2:
                kc_pre = jnp.clip(
                    jnp.minimum(
                        jnp.minimum(4 - (outp & 3), length),
                        outend - outp,
                    ), 1, 4,
                )
                copy_fin = (
                    (node0 == N_COPY) & (length > 0)
                    & (length <= kc_pre) & (outp < outend)
                    & (outp + kc_pre < outend) & (imq == 0)
                )
                if "chainC" in _ABLATE:
                    copy_fin = copy_fin & (node0 == N_ERROR)
                ismatch_c = jnp.clip(
                    H_IS_MATCH + state * NPS
                    + ((outp + kc_pre) & ((1 << pb) - 1)),
                    0, H_TOTAL - 1,
                )
            else:
                copy_fin = ca_mask
            imq_pend = (node0 == N_ISMATCH) & (imq == 1)
            d_sel = ca_mask   # chain-D prefetch selected (set at j=0)
            d_mask = ca_mask  # chain-D is_rep bit consumed at j1
            bitD = bit0
            # chain ladder E..H (round 5): every control node whose
            # likely successor's probability entry is a pure function of
            # pre-step state prefetches that entry as its pair word and
            # decodes the successor's bit at j=1 when the prediction
            # lands. Aftermaths run through the MERGED step-end handlers
            # (mask |= fired, bit -> bit2), so each chain costs only
            # mask/select lane ops — no extra table traversals.
            #   E: is_match(state>=7) bit1 -> is_rep        (matches)
            #   F: is_rep bit0            -> len_choice     (new match)
            #   Q: is_rep_g0 bit0         -> is_rep_0long   (rep0 path)
            #   O: is_rep_0long bit1      -> len_choice     (long rep0)
            #   G: len_choice BOTH: bit0 -> first low-tree bit (pair);
            #      bit1 -> len_choice2 (lives in j0's OWN pword — len
            #      bases are even, hot_layout)
            #   H: len_choice2 bit0       -> first mid-tree bit
            #   R: direct bits' last step -> first align bit (the align
            #      tree start is a FIXED entry; direct lanes never use
            #      the pair slot otherwise)
            #   P: len tree's last step -> first pos_slot bit, when
            #      len_state is already determined (mid tree: always 3;
            #      low tree with acc >= 6: lval >= 4 either way)
            sel_e = ca_mask
            sel_f = ca_mask
            sel_q = ca_mask
            sel_o = ca_mask
            sel_g = ca_mask
            sel_h = ca_mask
            sel_r = ca_mask
            sel_p = ca_mask
            fir_r = ca_mask
            fir_p = ca_mask
            fir_e = ca_mask
            fir_f = ca_mask
            fir_q = ca_mask
            fir_o = ca_mask
            fir_g0 = ca_mask
            fir_g1 = ca_mask
            fir_h = ca_mask
            bit2 = bit0
            lc_low = jnp.clip(
                len_base + L_LOW + pos_state * 8, 0, H_TOTAL - 2
            )
            lc_mid = jnp.clip(
                len_base + L_MID + pos_state * 8, 0, H_TOTAL - 2
            )
            # the step consumes at most TB input bytes, at inp and inp+1:
            # fetch both with one tile traversal instead of one per bit
            inp_step0 = inp
            ren_grp = in_group(inp - tile_base)
            # LIT4: two extra lit-only bit slots (j=2,3) whose reads
            # traverse ONLY the literal region — literal lanes decode up
            # to 4 bits/step while control lanes still pay the full-table
            # passes just twice
            NJ = (
                4 if (cfg.LIT4 and cfg.TB == 2
                      and "probread" not in _ABLATE
                      and "lit4" not in _ABLATE)
                else cfg.TB
            )
            for j in range(NJ):
                is_lit_j = (node == N_LIT) | (node == N_LITM)
                is_direct_j = node == N_DIRECT
                is_cnt_j = (
                    (node == N_LEN_TREE) | (node == N_POSSLOT)
                    | (node == N_SPECPOS) | is_direct_j | (node == N_ALIGN)
                )
                if j >= 2:
                    # lit-only slots: literal-tree continuation. j=2
                    # reads the table fresh (a LITM mismatch-drop at
                    # j<=1 continues as plain N_LIT here); j=3 decodes
                    # from j=2's prefetched pair, so lanes whose LITM
                    # status changed AT j=2 (mismatch drop) idle
                    active_j = is_lit_j & (acc < 0x100)
                    if j == 3:
                        active_j = active_j & (
                            (node == N_LITM) == litm_j2
                        )
                    is_prob_act = active_j
                    is_direct_act = active_j & ~active_j
                elif j == 0:
                    is_direct_act = is_direct_j
                    is_prob_act = (node <= N_ALIGN) & ~is_direct_j
                    if cfg.TB == 2:
                        is_prob_act = (
                            is_prob_act & ~imq_pend
                        ) | copy_fin
                    active_j = is_prob_act | is_direct_act
                else:
                    cb_live = cb_sel & (acc >= 0x100)
                    d_live = d_sel & (bit0 == 1)
                    e_live = sel_e & (bit0 == 1)
                    f_live = sel_f & (bit0 == 0)
                    q_live = sel_q & (bit0 == 0)
                    o_live = sel_o & (bit0 == 1)
                    g1_live = sel_g & (bit0 == 1)
                    cont = (
                        ((node == N_LIT) & ~litm0 & (acc < 0x100))
                        # matched literals pair too (round 5): j1's
                        # match bit is known at j0 from the mbyte
                        # register, so the prefetched pair covered the
                        # right subtree; a j0 mismatch DROPPED the lane
                        # to N_LIT (wrong pair — stay idle at j1)
                        | ((node == N_LITM) & litm0 & (acc < 0x100))
                        | (((node == N_LEN_TREE) | (node == N_POSSLOT)
                            | (node == N_SPECPOS)
                            | (node == N_ALIGN) | is_direct_j)
                           & (cnt > 0))
                        | cb_live | d_live
                        | e_live | f_live | q_live | o_live | g1_live
                    )
                    active_j = cont & (node != N_ERROR)
                    is_direct_act = is_direct_j & active_j
                    is_prob_act = active_j & ~is_direct_j

                match_bit_j = (mbyte >> 7) & 1
                hot_idx = tmp + acc  # LEN_TREE / POSSLOT / SPECPOS / ALIGN
                if j == 0:
                    # control-node overrides: only reachable on the first
                    # bit (control nodes never continue past one bit)
                    for cond_, val in (
                        (node == N_ISMATCH, H_IS_MATCH + st4),
                        (node == N_ISREP, H_IS_REP + state),
                        (node == N_ISREPG0, H_G0 + state),
                        (node == N_ISREP0LONG, H_REP0LONG + st4),
                        (node == N_ISREPG1, H_G1 + state),
                        (node == N_ISREPG2, H_G2 + state),
                        (node == N_LEN_CHOICE, len_base),
                        (node == N_LEN_CHOICE2, len_base + 1),
                    ):
                        hot_idx = jnp.where(cond_, val, hot_idx)
                hot_idx = jnp.clip(hot_idx, 0, H_TOTAL - 1)
                if cfg.TB == 2 and j == 0:
                    hot_idx = jnp.where(copy_fin, ismatch_c, hot_idx)
                lit_idx = jnp.where(
                    node == N_LITM, ((1 + match_bit_j) << 8) + acc, acc
                )
                lit_idx = jnp.clip(
                    lit_ctx * LIT_ROW + lit_idx, 0, LIT_W - 1
                )
                pidx = jnp.where(is_lit_j, HOT_W + lit_idx, hot_idx)
                pword_idx = pidx >> 1
                phalf = pidx & 1
                if "probread" in _ABLATE:
                    pword = pword_idx * 0 + PROB_PACKED
                    if cfg.TB == 2 and j == 0:
                        uw = pword
                        pair_idx = pidx
                        pair_word = pword_idx
                elif cfg.TB == 2:
                    if j == 0:
                        # the previous step's pending prob writes retire
                        # inside the SAME traversal as this step's two
                        # reads (fold_blend2_read2 below): the selects
                        # read the blended view, so no fix-ups needed
                        if "probwrite" not in _ABLATE:
                            # pw2/pw3 exist only when the LIT4 slots run
                            # — never pay their blend passes otherwise
                            pend = [(pw0i, pw0w), (pw1i, pw1w)]
                            pw0i = zt - 1
                            pw1i = zt - 1
                            if NJ == 4:
                                pend += [(pw2i, pw2w), (pw3i, pw3w)]
                                pw2i = zt - 1
                                pw3i = zt - 1
                        else:
                            pend = []
                        # Pair prefetch: the SECOND bit's two candidate
                        # entries are (base + 2*acc, base + 2*acc + 1)
                        # for every even-base tree (len/pos_slot/align,
                        # plain literal) — adjacent entries in ONE packed
                        # word.  A single extra traversal replaces the
                        # round-3 two-candidate prefetch; bit 1's value
                        # just picks the half (phalf = bit0).
                        acc2 = acc << 1
                        pair_hot = jnp.clip(tmp + acc2, 0, H_TOTAL - 2)
                        pair_lit = jnp.clip(
                            lit_ctx * LIT_ROW + acc2, 0, LIT_W - 2
                        )
                        # matched-literal pair: j1's subtree selector is
                        # the NEXT match bit — bit 6 of the current
                        # mbyte (bit 7 is j0's) — known now; its two
                        # candidates (1+mb)<<8 | 2*acc | {0,1} are
                        # adjacent. Valid only if j0 does NOT mismatch-
                        # drop to the plain tree (cont handles that).
                        mb1 = (mbyte >> 6) & 1
                        pair_litm = jnp.clip(
                            lit_ctx * LIT_ROW + ((1 + mb1) << 8) + acc2,
                            0, LIT_W - 2,
                        )
                        # chain A: is_match (state<7) may start a plain
                        # literal at j=1 — its first tree entry is
                        # row + 1. chain B: a literal whose 8th bit
                        # lands at j=0 (acc >= 0x80) chains the next
                        # symbol's is_match bit; that entry is a pure
                        # function of after_lit(state) and outp+1.
                        ca_cand = (node == N_ISMATCH) & (state < 7)
                        if "chainA" in _ABLATE:
                            ca_cand = ca_cand & (node == N_ERROR)
                        # chain D: the copy-completion step decodes
                        # is_match at j=0 (chain C); when that bit is 1
                        # the successor is is_rep, whose entry depends
                        # only on state — decode it at j=1 of the SAME
                        # step (two chained control bits per copy end).
                        d_sel = copy_fin
                        if "chainD" in _ABLATE:
                            d_sel = d_sel & (node == N_ERROR)
                        pair_start = jnp.clip(
                            lit_state0 * LIT_ROW + 1, 0, LIT_W - 1
                        )
                        cb_sel = (
                            is_lit_j & (acc >= 0x80)
                            & (outp + 1 < outend)
                        )
                        if "chainB" in _ABLATE:
                            cb_sel = cb_sel & (node == N_ERROR)
                        ismatch_next = jnp.clip(
                            H_IS_MATCH + _after_lit(state) * NPS
                            + ((outp + 1) & ((1 << pb) - 1)),
                            0, H_TOTAL - 1,
                        )
                        if "chainL" not in _ABLATE:
                            # imq lanes consume no bit at j0 (the
                            # is_match bit was the copy step's) — their
                            # j1 must stay idle
                            sel_e = (
                                (node == N_ISMATCH) & (state >= 7)
                                & (imq == 0)
                            )
                            sel_f = node == N_ISREP
                            sel_q = node == N_ISREPG0
                            sel_o = node == N_ISREP0LONG
                            sel_g = node == N_LEN_CHOICE
                            sel_h = node == N_LEN_CHOICE2
                            sel_r = (node == N_DIRECT) & (cnt == 1)
                            # len tree's final bit at j0 with len_state
                            # already fixed: mid tree (rev==8 => lval
                            # >= 8) always; low tree (rev==0) only when
                            # acc >= 6 (lval >= 4 either way). rev==16
                            # is the 8-bit high tree: it ends at j1.
                            sel_p = (
                                (node == N_LEN_TREE) & (cnt == 1)
                                & (len_rep == 0)
                                & ((rev == 8) | ((rev == 0) & (acc >= 6)))
                            )
                        ladder_idx = jnp.where(
                            sel_e, H_IS_REP + state,
                            jnp.where(
                                sel_f, H_LEN,
                                jnp.where(
                                    sel_q, H_REP0LONG + st4,
                                    jnp.where(
                                        sel_o, H_REP_LEN,
                                        jnp.where(
                                            sel_g, lc_low + 1,
                                            jnp.where(
                                                sel_h, lc_mid + 1,
                                                jnp.where(
                                                    sel_r, H_ALIGN + 1,
                                                    jnp.where(
                                                        sel_p,
                                                        H_POS_SLOT + 193,
                                                        pair_hot,
                                                    ),
                                                ),
                                            ),
                                        ),
                                    ),
                                ),
                            ),
                        )
                        pair_idx = jnp.where(
                            cb_sel, ismatch_next,
                            jnp.where(
                                node == N_LIT, HOT_W + pair_lit,
                                jnp.where(
                                    node == N_LITM, HOT_W + pair_litm,
                                    jnp.where(
                                        ca_cand, HOT_W + pair_start,
                                        jnp.where(
                                            copy_fin, H_IS_REP + state,
                                            ladder_idx,
                                        ),
                                    ),
                                ),
                            ),
                        )
                        pair_word = pair_idx >> 1
                        pword, uw = fold_blend2_read2(
                            prob_ref, pend,
                            pword_idx, pair_word, PROB_WORDS, F_P,
                        )
                    elif j == 2:
                        # lit-only slot: fresh reads over the literal
                        # region alone; pair prefetch for j=3 (same
                        # even-base adjacency as j0's). Register
                        # fix-ups cover the rare cross-subtree word
                        # collisions with this step's earlier updates.
                        litm_j2 = node == N_LITM
                        acc2l = acc << 1
                        mb3 = (mbyte >> 6) & 1
                        pair_l = jnp.where(
                            litm_j2, ((1 + mb3) << 8) + acc2l, acc2l
                        )
                        pair_l = jnp.clip(
                            lit_ctx * LIT_ROW + pair_l, 0, LIT_W - 2
                        )
                        pword_raw, uw2 = lit_read2(
                            lit_idx >> 1, pair_l >> 1
                        )
                        pword = jnp.where(
                            pword_idx == pw1i, pw1w,
                            jnp.where(
                                pword_idx == pw0i, pw0w, pword_raw
                            ),
                        )
                        pair_word3 = (HOT_W + pair_l) >> 1
                        uw2 = jnp.where(
                            pair_word3 == pw1i, pw1w,
                            jnp.where(pair_word3 == pw0i, pw0w, uw2),
                        )
                    elif j == 3:
                        # entry = lit row + current acc — inside j=2's
                        # prefetched pair word by construction
                        pword = jnp.where(pword_idx == pw2i, pw2w, uw2)
                    else:
                        # j == 1: no table traversal — the prefetched
                        # pair word holds both candidates; bit1's own
                        # update may share the word (register fix-up).
                        # Exact-entry chains take pair_idx verbatim; the
                        # G bit1 path (len_choice2) reads j0's OWN word:
                        # len bases are even so len_choice2 = base+1
                        # shares the word j0 just read and updated.
                        zero_off = (
                            cb_sel | d_sel | sel_e | sel_f | sel_q
                            | sel_o | sel_g | sel_h | sel_r | sel_p
                        )
                        pidx = pair_idx + jnp.where(zero_off, 0, bit0)
                        pidx = jnp.where(g1_live, len_base + 1, pidx)
                        pword_idx = pidx >> 1
                        phalf = pidx & 1
                        pword = jnp.where(pword_idx == pw0i, pw0w, uw)
                else:
                    pword = fold_read(prob_ref[:], pword_idx,
                                      PROB_WORDS, F_P)
                p = jnp.where(
                    phalf == 1, (pword >> 16) & 0xFFFF, pword & 0xFFFF
                ).astype(_U32)

                rng_u = rng.astype(_U32)
                cod_u = cod.astype(_U32)
                bound = (rng_u >> 11) * p
                prob_bit = (cod_u >= bound).astype(_I32)
                new_p = jnp.where(
                    prob_bit == 1, p - (p >> 5),
                    p + ((_U32(0x800) - p) >> 5),
                ).astype(_I32)

                new_pword = jnp.where(
                    phalf == 1,
                    (pword & 0xFFFF) | (new_p << 16),
                    (pword & jnp.int32(-0x10000)) | new_p,
                )
                if "probwrite" not in _ABLATE:
                    if cfg.TB == 2:
                        # enqueue; the next step's first bit retires it
                        if j == 0:
                            pw0i = jnp.where(is_prob_act, pword_idx, -1)
                            pw0w = new_pword
                        elif j == 1:
                            pw1i = jnp.where(is_prob_act, pword_idx, -1)
                            pw1w = new_pword
                        elif j == 2:
                            pw2i = jnp.where(is_prob_act, pword_idx, -1)
                            pw2w = new_pword
                        else:
                            pw3i = jnp.where(is_prob_act, pword_idx, -1)
                            pw3w = new_pword
                    else:
                        fold_blend(
                            prob_ref,
                            jnp.where(is_prob_act, pword_idx, -1),
                            new_pword, PROB_WORDS, F_P,
                        )

                rng_p = jnp.where(prob_bit == 1, rng_u - bound, bound)
                cod_p = jnp.where(prob_bit == 1, cod_u - bound, cod_u)

                rng_d = rng_u >> 1
                dir_bit = (cod_u >= rng_d).astype(_I32)
                cod_d = jnp.where(dir_bit == 1, cod_u - rng_d, cod_u)

                bit = jnp.where(is_prob_act, prob_bit, dir_bit)
                rng_u = jnp.where(
                    is_prob_act, rng_p,
                    jnp.where(is_direct_act, rng_d, rng_u),
                )
                cod_u = jnp.where(
                    is_prob_act, cod_p,
                    jnp.where(is_direct_act, cod_d, cod_u),
                )

                # renormalize (one input byte per bit when range shrinks)
                need = active_j & (rng_u < _U32(1 << 24))
                can = inp < inend
                eof = need & ~can
                err = jnp.where(eof & (err == ERR_NONE), ERR_EOF, err)
                node = jnp.where(eof, N_ERROR, node)
                do = need & can
                if NJ == 4:
                    byte_in = _extract_byte(
                        ren_grp, jnp.clip(inp - inp_step0, 0, 3)
                    ).astype(_U32)
                else:
                    byte_in = jnp.where(
                        inp == inp_step0, ren_grp & 0xFF,
                        (ren_grp >> 8) & 0xFF,
                    ).astype(_U32)
                rng_u = jnp.where(do, rng_u << 8, rng_u)
                cod_u = jnp.where(do, (cod_u << 8) ^ byte_in, cod_u)
                inp = jnp.where(do, inp + 1, inp)
                rng = rng_u.astype(_I32)
                cod = cod_u.astype(_I32)

                # in-loop tree accumulation (error lanes skip their bit)
                okj = active_j & ~eof
                m_lit = okj & is_lit_j
                m_litm = okj & (node == N_LITM)
                m_cnt = okj & is_cnt_j
                if cfg.TB == 2 and j == 1:
                    # B lanes consumed the next symbol's is_match bit at
                    # j=1: their acc holds the finished literal (feeds
                    # lit_emit below) and must not shift further
                    m_lit = m_lit & ~cb_sel
                    m_litm = m_litm & ~cb_sel
                m_rev = okj & ((node == N_SPECPOS) | (node == N_ALIGN))
                acc = jnp.where(m_lit | m_cnt, (acc << 1) | bit, acc)
                rev = jnp.where(m_rev, rev | (bit * mbyte), rev)
                mbyte = jnp.where(
                    m_litm, (mbyte << 1) & 0xFF,
                    jnp.where(m_rev, mbyte << 1, mbyte),
                )
                cnt = jnp.where(m_cnt, cnt - 1, cnt)
                # matched-literal mismatch: drop to the plain literal tree
                drop = m_litm & (acc < 0x100) & (bit != match_bit_j)
                node = jnp.where(drop, N_LIT, node)
                if j == 0:
                    bit0 = bit
                    if cfg.TB == 2 and "probread" not in _ABLATE:
                        # chain A fires: the literal starts NOW; j=1
                        # decodes its first tree bit from the prefetched
                        # pair word
                        ca_mask = (
                            okj & (node == N_ISMATCH) & (bit == 0)
                            & (state < 7)
                        )
                        if "chainA" in _ABLATE:
                            ca_mask = ca_mask & (node == N_ERROR)
                        node = jnp.where(ca_mask, N_LIT, node)
                        acc = jnp.where(ca_mask, 1, acc)
                        lit_ctx = jnp.where(ca_mask, lit_state0, lit_ctx)
                        # chains G/H tree starts: the len_choice(2) bit
                        # just decoded 0 — enter the low/mid tree NOW so
                        # j=1 consumes its first bit via the prefetched
                        # pair (generic tree continuation)
                        fir_g0 = okj & sel_g & (bit == 0)
                        node = jnp.where(fir_g0, N_LEN_TREE, node)
                        tmp = jnp.where(fir_g0, lc_low, tmp)
                        fir_h = okj & sel_h & (bit == 0)
                        node = jnp.where(fir_h, N_LEN_TREE, node)
                        tmp = jnp.where(fir_h, lc_mid, tmp)
                        gh = fir_g0 | fir_h
                        cnt = jnp.where(gh, 3, cnt)
                        acc = jnp.where(gh, 1, acc)
                        rev = jnp.where(fir_g0, 0, jnp.where(fir_h, 8, rev))
                        # chain R: the last direct bit landed at j0 —
                        # enter the align tree now (its start entry is
                        # the prefetched pair); dist takes the complete
                        # direct accumulator
                        fir_r = okj & sel_r
                        node = jnp.where(fir_r, N_ALIGN, node)
                        dist = jnp.where(fir_r, dist + (acc << 4), dist)
                        tmp = jnp.where(fir_r, H_ALIGN, tmp)
                        mbyte = jnp.where(fir_r, 1, mbyte)
                        # chain P: the len tree finished at j0 with
                        # len_state pinned at 3 — enter pos_slot now
                        fir_p = okj & sel_p
                        node = jnp.where(fir_p, N_POSSLOT, node)
                        length = jnp.where(fir_p, rev + acc - 8, length)
                        state = jnp.where(
                            fir_p, _after_match(state), state
                        )
                        tmp = jnp.where(fir_p, H_POS_SLOT + 192, tmp)
                        rp_ = fir_r | fir_p
                        cnt = jnp.where(fir_r, 4, jnp.where(fir_p, 6, cnt))
                        acc = jnp.where(rp_, 1, acc)
                        rev = jnp.where(fir_r, 0, rev)
                elif j == 1 and cfg.TB == 2:
                    cb_mask = okj & cb_sel
                    bitB = bit
                    d_mask = okj & d_live
                    bitD = bit
                    fir_e = okj & e_live
                    fir_f = okj & f_live
                    fir_q = okj & q_live
                    fir_o = okj & o_live
                    fir_g1 = okj & g1_live
                    bit2 = bit  # the shared second control bit

            bit = bit0  # control handlers consume the first bit
            ok = node != N_ERROR

            def end_symbol(mask, node, err, outp_v):
                over = mask & (outp_v > outend)
                err = jnp.where(over & (err == ERR_NONE), ERR_SIZE, err)
                node = jnp.where(over, N_ERROR, node)
                chunk_done = mask & ~over & (outp_v == outend)
                node = jnp.where(chunk_done, N_CHUNK, node)
                cont = mask & ~over & ~chunk_done
                node = jnp.where(cont, N_ISMATCH, node)
                return node, err

            # --- N_ISMATCH ----------------------------------------------
            m = ok & (node0 == N_ISMATCH)
            # imq: the bit was consumed by the copy's final step — this
            # step only performs the bit==0 aftermath (the port below
            # serves the matched byte, as for any is_match step)
            m0 = m & ((bit == 0) | (imq == 1))
            lit_state = lit_state0  # outp/prevb unchanged since the loop
            matched = m0 & (state >= 7)
            bad_md = matched & (rep0 + 1 > outp)
            err = jnp.where(bad_md & (err == ERR_NONE), ERR_MATCHDIST, err)
            node = jnp.where(bad_md, N_ERROR, node)
            matched = matched & ~bad_md
            if cfg.RING:
                far_ml = matched & (rep0 + 1 > cfg.RING)
                err = jnp.where(far_ml & (err == ERR_NONE), ERR_RING, err)
                node = jnp.where(far_ml, N_ERROR, node)
                matched = matched & ~far_ml
                bad_md = bad_md | far_ml
            start_lit = m0 & ~bad_md
            # chain-A lanes already started (acc holds 1..3 tree bits
            # from j=1); the handler only re-states node/lit_ctx for them
            acc = jnp.where(start_lit & ~ca_mask, 1, acc)
            node = jnp.where(
                start_lit, jnp.where(state >= 7, N_LITM, N_LIT), node
            )
            node = jnp.where(m & (bit == 1) & (imq == 0), N_ISREP, node)
            imq = jnp.where(m, 0, imq)  # flag consumed

            lit_ctx = jnp.where(start_lit, lit_state, lit_ctx)

            # --- N_LIT / N_LITM (tree bits consumed in-loop) --------------
            done_lit = (
                ok & ((node0 == N_LIT) | (node0 == N_LITM))
                & (acc >= 0x100)
            )

            lit_emit = (acc - 0x100) & 0xFF
            state = jnp.where(done_lit, _after_lit(state), state)

            # --- N_ISREP (merged: chain E rode is_match=1's j=1) ----------
            rep_bit = jnp.where(fir_e, bit2, bit)
            m = ok & ((node0 == N_ISREP) | fir_e)
            m0 = m & (rep_bit == 0)
            rep3 = jnp.where(m0, rep2, rep3)
            rep2 = jnp.where(m0, rep1, rep2)
            rep1 = jnp.where(m0, rep0, rep1)
            len_rep = jnp.where(m0, 0, len_rep)
            node = jnp.where(m0, N_LEN_CHOICE, node)
            node = jnp.where(m & (rep_bit == 1), N_ISREPG0, node)

            # --- N_ISREPG0 ------------------------------------------------
            m = ok & (node0 == N_ISREPG0)
            node = jnp.where(m & (bit == 0), N_ISREP0LONG, node)
            node = jnp.where(m & (bit == 1), N_ISREPG1, node)

            # --- N_ISREP0LONG (merged: chain Q rode is_rep_g0=0's j=1) ----
            ol_bit = jnp.where(fir_q, bit2, bit)
            m = ok & ((node0 == N_ISREP0LONG) | fir_q)
            short = m & (ol_bit == 0)
            state = jnp.where(short, _after_shortrep(state), state)
            long0 = m & (ol_bit == 1)
            len_rep = jnp.where(long0, 1, len_rep)
            node = jnp.where(long0, N_LEN_CHOICE, node)

            # --- N_ISREPG1 ------------------------------------------------
            m = ok & (node0 == N_ISREPG1)
            sel1 = m & (bit == 0)
            r0, r1 = rep0, rep1
            rep0 = jnp.where(sel1, r1, rep0)
            rep1 = jnp.where(sel1, r0, rep1)
            len_rep = jnp.where(sel1, 1, len_rep)
            node = jnp.where(sel1, N_LEN_CHOICE, node)
            node = jnp.where(m & (bit == 1), N_ISREPG2, node)

            # --- N_ISREPG2 ------------------------------------------------
            m = ok & (node0 == N_ISREPG2)
            sel2 = m & (bit == 0)
            sel3 = m & (bit == 1)
            r0, r1, r2, r3 = rep0, rep1, rep2, rep3
            rep0 = jnp.where(sel2, r2, jnp.where(sel3, r3, rep0))
            rep1 = jnp.where(sel2 | sel3, r0, rep1)
            rep2 = jnp.where(sel2 | sel3, r1, rep2)
            rep3 = jnp.where(sel3, r2, rep3)
            len_rep = jnp.where(m, 1, len_rep)
            node = jnp.where(m, N_LEN_CHOICE, node)

            # --- N_LEN_CHOICE (merged: chains F/O delivered the choice
            # bit at j=1; chains G0/G1 consumed it at j=0 — skip) --------
            lc_bit = jnp.where(fir_f | fir_o, bit2, bit)
            lc_base = jnp.where(
                fir_f, H_LEN, jnp.where(fir_o, H_REP_LEN, len_base)
            )
            m = ok & (
                ((node0 == N_LEN_CHOICE) & ~fir_g0 & ~fir_g1)
                | fir_f | fir_o
            )
            low = m & (lc_bit == 0)
            tmp = jnp.where(low, lc_base + L_LOW + pos_state * 8, tmp)
            cnt = jnp.where(low, 3, cnt)
            acc = jnp.where(low, 1, acc)
            rev = jnp.where(low, 0, rev)  # rev doubles as len_add
            node = jnp.where(low, N_LEN_TREE, node)
            node = jnp.where(m & (lc_bit == 1), N_LEN_CHOICE2, node)

            # --- N_LEN_CHOICE2 (merged: chain G1 decoded it at j=1 from
            # j0's own pword; chain H consumed its bit at j=0 — skip) ----
            lc2_bit = jnp.where(fir_g1, bit2, bit)
            m = ok & (((node0 == N_LEN_CHOICE2) & ~fir_h) | fir_g1)
            mid = m & (lc2_bit == 0)
            high = m & (lc2_bit == 1)
            tmp = jnp.where(mid, len_base + L_MID + pos_state * 8, tmp)
            tmp = jnp.where(high, len_base + L_HIGH, tmp)
            cnt = jnp.where(mid, 3, jnp.where(high, 8, cnt))
            acc = jnp.where(m, 1, acc)
            rev = jnp.where(mid, 8, jnp.where(high, 16, rev))
            node = jnp.where(m, N_LEN_TREE, node)

            # --- N_LEN_TREE -----------------------------------------------
            m = ok & (node0 == N_LEN_TREE)
            done_len = m & (cnt == 0)
            tree_size = jnp.where(rev >= 16, 256, 8)
            lval = rev + acc - tree_size  # 0..271
            length = jnp.where(done_len, lval, length)
            repdone = done_len & (len_rep == 1)
            state = jnp.where(repdone, _after_rep(state), state)
            matchdone = done_len & (len_rep == 0)
            state = jnp.where(matchdone, _after_match(state), state)
            len_state = jnp.minimum(length, 3)
            tmp = jnp.where(matchdone, H_POS_SLOT + len_state * 64, tmp)
            cnt = jnp.where(matchdone, 6, cnt)
            acc = jnp.where(matchdone, 1, acc)
            node = jnp.where(matchdone, N_POSSLOT, node)

            # --- N_POSSLOT ------------------------------------------------
            m = ok & (node0 == N_POSSLOT)
            done_ps = m & (cnt == 0)
            pos_slot = acc - 64
            small = done_ps & (pos_slot < 4)
            big = done_ps & (pos_slot >= 4)
            ndirect = (pos_slot >> 1) - 1
            base_dist = (2 | (pos_slot & 1)) << jnp.clip(ndirect, 0, 30)
            dist = jnp.where(big, base_dist, dist)
            midrange = big & (pos_slot < 14)
            tmp = jnp.where(
                midrange, H_SPEC_POS + (base_dist - 4), tmp
            )
            cnt = jnp.where(midrange, ndirect, cnt)
            acc = jnp.where(midrange, 1, acc)
            rev = jnp.where(midrange, 0, rev)
            mbyte = jnp.where(midrange, 1, mbyte)  # mbyte = reverse bitpos
            node = jnp.where(midrange, N_SPECPOS, node)
            vast = big & (pos_slot >= 14)
            cnt = jnp.where(vast, ndirect - 4, cnt)
            acc = jnp.where(vast, 0, acc)
            node = jnp.where(vast, N_DIRECT, node)

            # --- N_SPECPOS ------------------------------------------------
            m = ok & (node0 == N_SPECPOS)
            done_sp = m & (cnt == 0)

            # --- N_DIRECT -------------------------------------------------
            m = ok & (node0 == N_DIRECT)
            done_d = m & (cnt == 0)
            dist = jnp.where(done_d, dist + (acc << 4), dist)
            tmp = jnp.where(done_d, H_ALIGN, tmp)
            cnt = jnp.where(done_d, 4, cnt)
            acc = jnp.where(done_d, 1, acc)
            rev = jnp.where(done_d, 0, rev)
            mbyte = jnp.where(done_d, 1, mbyte)
            node = jnp.where(done_d, N_ALIGN, node)

            # --- N_ALIGN --------------------------------------------------
            m = ok & (node0 == N_ALIGN)
            done_al = m & (cnt == 0)

            # -------- merged distance finish + copy start ------------------
            fin = small | done_sp | done_al
            dfield = jnp.where(small, pos_slot, dist + rev)
            marker = fin & (dfield == -1)  # 0xFFFFFFFF as i32
            fin_ok = marker & (cod == 0) & (inp >= inend)
            size_mm = fin_ok & (outp != outend)
            err = jnp.where(size_mm & (err == ERR_NONE), ERR_SIZE, err)
            node = jnp.where(size_mm, N_ERROR, node)
            node = jnp.where(fin_ok & ~size_mm, N_CHUNK, node)
            bad_eos = marker & ~fin_ok
            err = jnp.where(bad_eos & (err == ERR_NONE), ERR_EOS_EXTRA, err)
            node = jnp.where(bad_eos, N_ERROR, node)
            normal = fin & ~marker
            rep0 = jnp.where(normal, dfield, rep0)

            sc = short | repdone | normal
            sc_len = jnp.where(short, 1, length + 2)
            sc_dist = rep0 + 1  # == dfield + 1 for `normal` (just set)
            bad = sc & ((sc_dist > outp) | (sc_dist < 1))
            err = jnp.where(bad & (err == ERR_NONE), ERR_DIST_OUT, err)
            node = jnp.where(bad, N_ERROR, node)
            good = sc & ~bad
            if cfg.RING:
                ring_far = good & (sc_dist > cfg.RING)
                err = jnp.where(
                    ring_far & (err == ERR_NONE), ERR_RING, err
                )
                node = jnp.where(ring_far, N_ERROR, node)
                good = good & ~ring_far
            node = jnp.where(good, N_COPY, node)
            length = jnp.where(good, sc_len, length)
            dist = jnp.where(good, sc_dist, dist)

            # -------- Stage D: copy lanes move up to 4 bytes ---------------
            # Copy-start fusion (round 5): the distance-finish section
            # above runs BEFORE this stage, so a match that completed its
            # distance THIS step (`good`) moves its first bytes now — a
            # shortrep completes in the same step as its control bits —
            # instead of burning a whole step entering N_COPY.
            m = (node0 == N_COPY) | good
            over = m & (outp >= outend) & (length > 0)
            err = jnp.where(over & (err == ERR_NONE), ERR_SIZE, err)
            node = jnp.where(over, N_ERROR, node)
            m_w = m & ~over
            k_copy = jnp.minimum(
                jnp.minimum(4 - (outp & 3), length), outend - outp
            )
            k_copy = jnp.clip(k_copy, 1, 4)
            # 8-byte copy steps: a word-aligned destination with >8 bytes
            # left retires TWO full output words per step when the 8
            # source bytes are already in the port's two fetched words —
            # dist a multiple of 4 (aligned source, a==0) or dist 1/2
            # (the 4-byte replication group repeats with period dividing
            # 4, so the second word equals the first). length > 8
            # strictly: the copy never COMPLETES on an 8-byte step, so
            # the copy-end chains (copy_fin/imq) are untouched. Only the
            # register-resident output-word modes can absorb two whole
            # words per step (ring / GAPFREE).
            if (cfg.RING or cfg.GAPFREE) and "m8" not in _ABLATE:
                m8 = (
                    m_w & ((outp & 3) == 0) & (length > 8)
                    & (outp + 8 <= outend)
                    & (((dist & 3) == 0) | (dist <= 2))
                )
            else:
                m8 = jnp.zeros_like(node0) == 1  # old-word RMW path: never
            k_copy = jnp.where(m8, 8, k_copy)
            nadv = jnp.where(m_w, k_copy, 1)  # literal lanes emit 1 byte
            length = jnp.where(m_w, length - nadv, length)
            copy_done = m_w & (length == 0)
            node, err = end_symbol(
                done_lit | copy_done, node, err, outp + nadv
            )
            if cfg.TB == 2:
                # chain C: the copy completed and its j=0 bit was the
                # next symbol's is_match. bit==1 proceeds to N_ISREP now;
                # bit==0 keeps node=N_ISMATCH with the imq flag (next
                # step reads the matched byte through the port and
                # starts the literal without re-decoding the bit).
                cfm = copy_fin & copy_done & ok
                node = jnp.where(cfm & (bit0 == 1), N_ISREP, node)
                imq = jnp.where(cfm & (bit0 == 0), 1, imq)
                # chain D aftermath: the is_rep bit rode j=1 of this
                # same copy step; apply N_ISREP's transitions now
                # (overriding the N_ISREP node chain C just set)
                dm = d_mask & cfm
                d0m = dm & (bitD == 0)
                rep3 = jnp.where(d0m, rep2, rep3)
                rep2 = jnp.where(d0m, rep1, rep2)
                rep1 = jnp.where(d0m, rep0, rep1)
                len_rep = jnp.where(d0m, 0, len_rep)
                node = jnp.where(d0m, N_LEN_CHOICE, node)
                node = jnp.where(dm & (bitD == 1), N_ISREPG0, node)
                # chain B: the next symbol's is_match bit was consumed at
                # j=1 (cb_mask); override end_symbol's N_ISMATCH with the
                # decided successor. bit==0 starts the next PLAIN literal
                # (after_lit(state) < 7 always) with its context built
                # from the byte just emitted.
                cbm = cb_mask & done_lit
                lit_ctx_b = (
                    ((outp + 1) & ((1 << lp) - 1)) << lc
                ) + (lit_emit >> (8 - lc))
                to_lit = cbm & (bitB == 0)
                to_rep = cbm & (bitB == 1)
                node = jnp.where(
                    to_lit, N_LIT, jnp.where(to_rep, N_ISREP, node)
                )
                acc = jnp.where(to_lit, 1, acc)
                lit_ctx = jnp.where(to_lit, lit_ctx_b, lit_ctx)
            outp_w = outp  # emit position, before Stage E retargets outp

            # -------- Stage E: chunk setup ---------------------------------
            m = node0 == N_CHUNK
            ci = jnp.clip(chunk_i, 0, K - 1)

            def sched(ref):
                return onehot_read_v(ref[:], ci, K)

            cmeta = sched(meta_ref)
            have = m & (chunk_i < K) & (((cmeta >> 12) & 1) == 1)
            node = jnp.where(m & ~have, N_DONE, node)

            cin = sched(is_ref)
            cend = sched(ie_ref)
            cout_start = sched(os_ref)
            cout_end = sched(oe_ref)
            creset = cmeta & 3
            clc = (cmeta >> 2) & 15
            clp = (cmeta >> 6) & 7
            cpb = (cmeta >> 9) & 7

            too_short = have & (cend - cin < 5)
            err = jnp.where(too_short & (err == ERR_NONE), ERR_SHORT, err)
            node = jnp.where(too_short, N_ERROR, node)
            ready = have & ~too_short

            covered = (
                (cin >= tile_base)
                & (cin + 5 + (4 if cfg.LIT4 else cfg.TB) * cfg.MAINT + 8
                   <= tile_base + TILE)
            )
            # Reset chunks park the lane (pending=1); the table blend runs
            # at the next maintenance boundary (same protocol as gen-1 —
            # an unconditional per-step blend would add a full prob pass).
            want_tbl = ready & (creset == 1) & (pending == 0)
            pending = jnp.where(want_tbl, 1, pending)
            go = ready & covered & ((creset == 0) | (pending == 2))
            wait = ready & ~go
            inp = jnp.where(wait & ~covered, cin, inp)

            reg_reset = go & (creset == 1)
            state = jnp.where(reg_reset, 0, state)
            rep0 = jnp.where(reg_reset, 0, rep0)
            rep1 = jnp.where(reg_reset, 0, rep1)
            rep2 = jnp.where(reg_reset, 0, rep2)
            rep3 = jnp.where(reg_reset, 0, rep3)
            pending = jnp.where(go, 0, pending)
            lc = jnp.where(go, clc, lc)
            lp = jnp.where(go, clp, lp)
            pb = jnp.where(go, cpb, pb)

            cgrp = in_group(cin + 1 - tile_base)
            code0 = (
                ((cgrp & 0xFF) << 24)
                | (((cgrp >> 8) & 0xFF) << 16)
                | (((cgrp >> 16) & 0xFF) << 8)
                | ((cgrp >> 24) & 0xFF)
            ).astype(_I32)
            rng = jnp.where(go, -1, rng)  # 0xFFFFFFFF
            cod = jnp.where(go, code0, cod)
            inp = jnp.where(go, cin + 5, inp)
            inend = jnp.where(go, cend, inend)
            outp = jnp.where(go, cout_start, outp)
            outend = jnp.where(go, cout_end, outend)
            chunk_i = jnp.where(go, chunk_i + 1, chunk_i)
            node = jnp.where(go, N_ISMATCH, node)
            insta_done = go & (cout_start == cout_end)
            node = jnp.where(insta_done, N_CHUNK, node)

            # -------- shared window READ port (one traversal per step) ----
            is_copy = (node0 == N_COPY) | good  # incl. fused copy starts
            is_chunkn = node0 == N_CHUNK
            port_pos = jnp.where(
                is_copy, outp_w - dist,
                jnp.where(is_chunkn, cout_start - 1, outp_w - 1 - rep0),
            )
            port_pos = jnp.clip(port_pos, 0, W - 1)
            pw_idx = port_pos >> 2
            # retire last step's pending window write here, merged with
            # the port pass: one blend traversal applies it and the port
            # selects read the blended view (deferring removes the
            # separate RMW write traversal the window write used to pay).
            # Ring mode: wwi/www persist as the word-under-construction
            # (full contents in-register), so the write section below
            # merges new bytes with register ops instead of re-reading
            # the ring — the blend is idempotent and simply re-publishes
            # the growing word each step, into its parity half.
            if cfg.RING:
                rows_h = jax.lax.broadcasted_iota(_I32, (RWH, S, M), 0)
                blended_e = ring_e[:]
                blended_o = ring_o[:]
                if "winwrite" not in _ABLATE:
                    # publish only COMPLETED words: a partially-built
                    # word must not clobber its ring slot early — the
                    # slot still holds the word from RING bytes back,
                    # and a copy at dist close to RING reads those top
                    # bytes (the round-4 ring-miss regression). The word
                    # under construction stays register-resident; the
                    # port splices it below. Republish is idempotent.
                    # two pending completed words at most (an 8-byte
                    # step's pair is consecutive, so they always land in
                    # different parity halves — one blend each)
                    pv = pubi >= 0
                    p2v = pub2i >= 0
                    pslot = pubi & (RW_WORDS - 1)
                    p2slot = pub2i & (RW_WORDS - 1)
                    pe1 = pv & ((pslot & 1) == 0)
                    pe2 = p2v & ((p2slot & 1) == 0)
                    ie = jnp.where(
                        pe1, pslot >> 1, jnp.where(pe2, p2slot >> 1, -1)
                    )
                    ve = jnp.where(pe1, pubw, pub2w)
                    po1 = pv & ((pslot & 1) == 1)
                    po2 = p2v & ((p2slot & 1) == 1)
                    io = jnp.where(
                        po1, pslot >> 1, jnp.where(po2, p2slot >> 1, -1)
                    )
                    vo = jnp.where(po1, pubw, pub2w)
                    # keep the blended VALUES for the port sums below:
                    # the read then rides the same traversal as the
                    # publish instead of re-reading the stored halves
                    blended_e = jnp.where(
                        rows_h == ie[None], ve[None], blended_e
                    )
                    blended_o = jnp.where(
                        rows_h == io[None], vo[None], blended_o
                    )
                    ring_e[:] = blended_e
                    ring_o[:] = blended_o
            else:
                # publish indices for the pending word (its parity
                # half), plus an 8-byte step's second completed word
                # (consecutive => opposite parity, so each half still
                # takes exactly one blend index). GAPFREE keeps the
                # register word resident (same protocol as ring mode);
                # otherwise it re-arms next write. The blends are FUSED
                # into the port reads below (fold_blend_read) — one
                # traversal per half does publish + read.
                we1 = ((wwi & 1) == 0) & (wwi >= 0)
                p2v = pub2i >= 0
                pe2 = p2v & ((pub2i & 1) == 0)
                ie = jnp.where(
                    we1, wwi >> 1, jnp.where(pe2, pub2i >> 1, -1)
                )
                ve = jnp.where(we1, www, pub2w)
                wo1 = ((wwi & 1) == 1) & (wwi >= 0)
                po2 = p2v & ((pub2i & 1) == 1)
                io = jnp.where(
                    wo1, wwi >> 1, jnp.where(po2, pub2i >> 1, -1)
                )
                vo = jnp.where(wo1, www, pub2w)
                if "winwrite" in _ABLATE:
                    ie = zt - 1
                    io = zt - 1
                elif "port" in _ABLATE:
                    # port pass ablated: publish still must happen
                    fold_blend(win_e, ie, ve, WIN_WORDS // 2, F)
                    fold_blend(win_o, io, vo, WIN_WORDS // 2, F)
                if not cfg.GAPFREE and "winwrite" not in _ABLATE:
                    wwi = zt - 1
            if "port" in _ABLATE:
                w0 = pw_idx * 0
                w1 = w0
            elif cfg.RING:
                r0_ = pw_idx & (RW_WORDS - 1)
                r1_ = (pw_idx + 1) & (RW_WORDS - 1)
                p0 = r0_ & 1
                re = jnp.where(p0 == 0, r0_, r1_) >> 1
                ro = jnp.where(p0 == 0, r1_, r0_) >> 1
                we = jnp.sum(
                    jnp.where(rows_h == re[None], blended_e, 0), axis=0
                )
                wo = jnp.sum(
                    jnp.where(rows_h == ro[None], blended_o, 0), axis=0
                )
                w0 = jnp.where(p0 == 0, we, wo)
                w1 = jnp.where(p0 == 0, wo, we)
                # register-word splice: reads that target the word under
                # construction (absolute index match — slot aliases from
                # RING bytes back correctly fall through to the ring)
                w0 = jnp.where(pw_idx == wwi, www, w0)
                w1 = jnp.where(pw_idx + 1 == wwi, www, w1)
            else:
                r0_ = pw_idx
                r1_ = jnp.minimum(pw_idx + 1, WIN_WORDS - 1)
                p0 = r0_ & 1
                re = jnp.where(p0 == 0, r0_, r1_) >> 1
                ro = jnp.where(p0 == 0, r1_, r0_) >> 1
                we = fold_blend_read(win_e, ie, ve, re, WIN_WORDS // 2, F)
                wo = fold_blend_read(win_o, io, vo, ro, WIN_WORDS // 2, F)
                w0 = jnp.where(p0 == 0, we, wo)
                w1 = jnp.where(p0 == 0, wo, we)
            port_byte = _extract_byte(w0, port_pos & 3)
            mbyte = jnp.where(matched, port_byte, mbyte)
            w0u = w0.astype(_U32)
            w1u = w1.astype(_U32)
            a = port_pos & 3
            grp = jnp.where(
                a == 0, w0u,
                jnp.where(
                    a == 1, (w0u >> 8) | (w1u << 24),
                    jnp.where(
                        a == 2, (w0u >> 16) | (w1u << 16),
                        (w0u >> 24) | (w1u << 8),
                    ),
                ),
            )
            b0 = grp & 0xFF
            grp = jnp.where(
                dist == 1, b0 * _U32(0x01010101),
                jnp.where(
                    dist == 2, (grp & 0xFFFF) * _U32(0x00010001),
                    jnp.where(
                        dist == 3, (grp & 0xFFFFFF) | (b0 << 24), grp
                    ),
                ),
            )
            # second source group for 8-byte copy steps (m8): an aligned
            # source (dist % 4 == 0 -> a == 0) takes the port's second
            # word directly; dist 1/2/4 groups repeat with period
            # dividing 4, so the second word equals the first
            grp2 = jnp.where(dist >= 8, w1u, grp)

            # -------- combined window write (literal emit OR copy group) --
            wmask = done_lit | m_w
            wcnt = jnp.where(m_w, k_copy, 1)
            wval = jnp.where(done_lit, lit_emit.astype(_U32), grp)
            bmask = jnp.where(
                wcnt == 1, _U32(0xFF),
                jnp.where(
                    wcnt == 2, _U32(0xFFFF),
                    jnp.where(wcnt == 3, _U32(0xFFFFFF), _U32(0xFFFFFFFF)),
                ),
            )
            k = outp_w & 3
            data_u = wval & bmask
            placed = jnp.where(
                k == 0, data_u,
                jnp.where(
                    k == 1, data_u << 8,
                    jnp.where(k == 2, data_u << 16, data_u << 24),
                ),
            )
            maskp = jnp.where(
                k == 0, bmask,
                jnp.where(
                    k == 1, bmask << 8,
                    jnp.where(k == 2, bmask << 16, bmask << 24),
                ),
            )
            widx = outp_w >> 2
            if "winwrite" in _ABLATE:
                pass
            elif cfg.RING:
                # Register-resident output word (ABSOLUTE index): ring
                # mode implies gap-free lanes, so a write either
                # continues the word under construction (widx == wwi) or
                # starts a fresh word at byte 0. Crossing hands the
                # completed word to the publish slot (applied by the
                # next step's port blend); the fresh word stays in
                # registers so the ring slot keeps serving its
                # RING-bytes-back content until the new word completes.
                same = widx == wwi
                crossed = wmask & ~same
                pubi = jnp.where(crossed, wwi, pubi)
                pubw = jnp.where(crossed, www, pubw)
                base = jnp.where(same, www, 0).astype(_U32)
                new_w = ((base & ~maskp) | placed).astype(_I32)
                # 8-byte steps complete TWO words: widx (= new_w — the
                # aligned full-mask write) goes to the second publish
                # slot, widx+1 (grp2) becomes the register word. pub2i
                # lives exactly one step (published by the next step's
                # blend, then cleared) so a stale entry can never stomp
                # its ring slot after the ring wraps.
                pub2i = jnp.where(m8, widx, zt - 1)
                pub2w = jnp.where(m8, new_w, pub2w)
                wwi = jnp.where(wmask, jnp.where(m8, widx + 1, widx), wwi)
                www = jnp.where(
                    wmask,
                    jnp.where(m8, grp2.astype(_I32), new_w), www,
                )
            elif cfg.GAPFREE:
                # planner-proved gap-free: same register-resident word
                # scheme as ring mode, on the full window
                widx_t = widx
                same = widx_t == wwi
                base = jnp.where(same, www, 0).astype(_U32)
                new_w = ((base & ~maskp) | placed).astype(_I32)
                pub2i = jnp.where(m8, widx_t, zt - 1)
                pub2w = jnp.where(m8, new_w, pub2w)
                wwi = jnp.where(
                    wmask, jnp.where(m8, widx_t + 1, widx_t), wwi
                )
                www = jnp.where(
                    wmask,
                    jnp.where(m8, grp2.astype(_I32), new_w), www,
                )
            else:
                widx_t = widx
                p_w = widx_t & 1
                oe = fold_read(win_e[:], widx_t >> 1, WIN_WORDS // 2, F)
                oo = fold_read(win_o[:], widx_t >> 1, WIN_WORDS // 2, F)
                old_w = jnp.where(p_w == 0, oe, oo)
                new_w = (
                    (old_w.astype(_U32) & ~maskp) | placed
                ).astype(_I32)
                # enqueue; the next step's port pass retires it (reads in
                # between never target the in-flight output word: port
                # positions are < outp for copies/matched literals and
                # the chunk-gap read is a completed position)
                wwi = jnp.where(wmask, widx_t, -1)
                www = new_w
            outp = jnp.where(wmask, outp + wcnt, outp)

            lastb = jnp.where(
                wcnt == 1, wval & 0xFF,
                jnp.where(
                    wcnt == 2, (wval >> 8) & 0xFF,
                    jnp.where(
                        wcnt == 3, (wval >> 16) & 0xFF,
                        jnp.where(
                            wcnt == 8, (grp2 >> 24) & 0xFF,
                            (wval >> 24) & 0xFF,
                        ),
                    ),
                ),
            ).astype(_I32)
            first = go & (cout_start == 0)
            gap_go = go & (cout_start != outp_w) & (cout_start > 0)
            prevb = jnp.where(wmask, lastb, prevb)
            prevb = jnp.where(gap_go, port_byte, prevb)
            prevb = jnp.where(first, 0, prevb)

            meta = (err | (pending << 4) | (len_rep << 6)
                    | (lit_ctx << 7) | (lc << 10) | (lp << 14)
                    | (pb << 17) | (chunk_i << 20) | (imq << 26))
            out_t = (node, meta, rng, cod, inp, inend, outp, outend,
                     state, rep0, rep1, rep2, rep3, acc, cnt, tmp, rev,
                     length, dist, mbyte, prevb, tile_base,
                     pw0i, pw0w, pw1i, pw1w,
                     wwi, www, pubi, pubw, pub2i, pub2w)
            if cfg.LIT4:
                return out_t + (pw2i, pw2w, pw3i, pw3w)
            return out_t

        def flush_pending_window():
            """Apply the deferred window/ring write held in the wwi/www
            slots (normally retired by the next step's port pass); must
            run before any bulk read of the window — maintenance and
            final ring flushes, and the kernel epilogue (win_ref is the
            output buffer)."""
            wwi_s = st_ref[_WWI_SLOT]
            www_s = st_ref[_WWW_SLOT]
            pub2i_s = st_ref[_PUB2I_SLOT]
            pub2w_s = st_ref[_PUB2W_SLOT]
            if cfg.RING:
                # publish the pending COMPLETED word(s) (idempotent; an
                # 8-byte step leaves a second one in pub2); the word
                # under construction stays register-resident — its
                # written bytes reach the full window via ring_flush's
                # direct merge, never the ring (see the write section)
                pubi_s = st_ref[_PUBI_SLOT]
                pubw_s = st_ref[_PUBW_SLOT]
                rows_h = jax.lax.broadcasted_iota(_I32, (RWH, S, M), 0)
                pv = pubi_s >= 0
                p2v = pub2i_s >= 0
                pslot = pubi_s & (RW_WORDS - 1)
                p2slot = pub2i_s & (RW_WORDS - 1)
                pe1 = pv & ((pslot & 1) == 0)
                pe2 = p2v & ((p2slot & 1) == 0)
                ie = jnp.where(
                    pe1, pslot >> 1, jnp.where(pe2, p2slot >> 1, -1)
                )
                ve = jnp.where(pe1, pubw_s, pub2w_s)
                po1 = pv & ((pslot & 1) == 1)
                po2 = p2v & ((p2slot & 1) == 1)
                io = jnp.where(
                    po1, pslot >> 1, jnp.where(po2, p2slot >> 1, -1)
                )
                vo = jnp.where(po1, pubw_s, pub2w_s)
                ring_e[:] = jnp.where(
                    rows_h == ie[None], ve[None], ring_e[:]
                )
                ring_o[:] = jnp.where(
                    rows_h == io[None], vo[None], ring_o[:]
                )
            else:
                we1 = ((wwi_s & 1) == 0) & (wwi_s >= 0)
                pe2 = (pub2i_s >= 0) & ((pub2i_s & 1) == 0)
                ie = jnp.where(
                    we1, wwi_s >> 1, jnp.where(pe2, pub2i_s >> 1, -1)
                )
                ve = jnp.where(we1, www_s, pub2w_s)
                wo1 = ((wwi_s & 1) == 1) & (wwi_s >= 0)
                po2 = (pub2i_s >= 0) & ((pub2i_s & 1) == 1)
                io = jnp.where(
                    wo1, wwi_s >> 1, jnp.where(po2, pub2i_s >> 1, -1)
                )
                vo = jnp.where(wo1, www_s, pub2w_s)
                fold_blend(win_e, ie, ve, WIN_WORDS // 2, F)
                fold_blend(win_o, io, vo, WIN_WORDS // 2, F)
                if not cfg.GAPFREE:
                    st_ref[_WWI_SLOT] = jnp.zeros((S, M), _I32) - 1

        def ring_flush(outp):
            """Bulk-copy the ring's resident range into the full window;
            identical semantics to gen-1 (see its docstring). The
            parity halves interleave back to stream order here (leading-
            dim reshape, amortized over a maintenance period)."""
            ring_full = jnp.stack(
                [ring_e[:], ring_o[:]], axis=1
            ).reshape(RW_WORDS, S, M)
            hi = outp[None]
            lo_w = (jnp.maximum(outp - cfg.RING, 0)[None] + 3) >> 2
            rows_r = jax.lax.broadcasted_iota(_I32, (RW_WORDS, S, M), 0)
            for b in range(WIN_WORDS // RW_WORDS):
                w = rows_r + b * RW_WORDS
                t = jnp.clip(hi - w * 4, 0, 4)  # bytes to take from ring
                take = (w >= lo_w).astype(_I32)
                bm = jnp.where(
                    t == 0, 0,
                    jnp.where(
                        t == 1, 0xFF,
                        jnp.where(
                            t == 2, 0xFFFF,
                            jnp.where(t == 3, 0xFFFFFF, -1),
                        ),
                    ),
                ) * take
                blk = win_ref[b * RW_WORDS:(b + 1) * RW_WORDS]
                merged = (blk & ~bm) | (ring_full & bm)
                win_ref[b * RW_WORDS:(b + 1) * RW_WORDS] = merged
            # the register-resident word under construction never touched
            # the ring: merge its written bytes (< outp) straight into
            # the window (one full-window pass per maintenance period)
            cur_i = st_ref[_WWI_SLOT]
            cur_w = st_ref[_WWW_SLOT]
            rows_w = jax.lax.broadcasted_iota(_I32, (WIN_WORDS, S, M), 0)
            tcur = jnp.clip(outp - cur_i * 4, 0, 4)
            bmc = jnp.where(
                tcur == 0, 0,
                jnp.where(
                    tcur == 1, 0xFF,
                    jnp.where(
                        tcur == 2, 0xFFFF,
                        jnp.where(tcur == 3, 0xFFFFFF, -1),
                    ),
                ),
            )
            win_ref[:] = jnp.where(
                rows_w == cur_i[None],
                (win_ref[:] & ~bmc[None]) | (cur_w[None] & bmc[None]),
                win_ref[:],
            )

        def outer_body(carry):
            it, _ = carry
            # maintenance: input-tile refill, parked prob-table resets,
            # ring flush — all at body top level on ref state
            inp = st_ref[_INP_SLOT]
            refill(inp)
            st_ref[_TILEBASE_SLOT] = (inp // 128) * 128
            meta = st_ref[_META_SLOT]
            pending = (meta >> 4) & 3
            if cfg.TB == 2:
                # retire outstanding deferred prob writes BEFORE the
                # parked-reset blend below wipes the table — a stale
                # pending applied after a reset would resurrect old state
                fold_blend(
                    prob_ref, st_ref[_PW0I_SLOT], st_ref[_PW0W_SLOT],
                    PROB_WORDS, F_P,
                    idx2=st_ref[_PW1I_SLOT], val2=st_ref[_PW1W_SLOT],
                )
                if cfg.LIT4:
                    fold_blend(
                        prob_ref, st_ref[_PW2I_SLOT], st_ref[_PW2W_SLOT],
                        PROB_WORDS, F_P,
                        idx2=st_ref[_PW3I_SLOT], val2=st_ref[_PW3W_SLOT],
                    )
                    st_ref[_PW2I_SLOT] = jnp.zeros((S, M), _I32) - 1
                    st_ref[_PW3I_SLOT] = jnp.zeros((S, M), _I32) - 1
                neg1 = jnp.zeros((S, M), _I32) - 1
                st_ref[_PW0I_SLOT] = neg1
                st_ref[_PW1I_SLOT] = neg1
            p32 = (pending == 1).astype(_I32)
            if F_P > 1:
                p32 = jnp.tile(p32, (F_P, 1))
            prob_ref[:] = prob_ref[:] + (
                PROB_PACKED - prob_ref[:]
            ) * p32[None]
            st_ref[_META_SLOT] = jnp.where(
                pending == 1, (meta & ~0x30) | (2 << 4), meta
            )
            flush_pending_window()
            if cfg.RING and "flush" not in _ABLATE:
                ring_flush(st_ref[_OUTP_SLOT])

            def inner_cond(jc):
                return jc < cfg.MAINT

            def inner_body(jc):
                t = load_state()
                for _ in range(cfg.UNROLL):
                    t = step(t)
                store_state(t)
                return jc + cfg.UNROLL

            jax.lax.while_loop(inner_cond, inner_body, jnp.int32(0))
            node = st_ref[_NODE_SLOT]
            if "spin" in _ABLATE:
                active = jnp.int32(1)
            else:
                active = jnp.max(jnp.where(node < N_DONE, 1, 0))
            return (it + cfg.MAINT, active)

        def cond(carry):
            it, active = carry
            return (active == 1) & (it < max_iters)

        final_it, _ = jax.lax.while_loop(
            cond, outer_body, (jnp.zeros((), _I32), jnp.int32(1))
        )
        flush_pending_window()
        if cfg.RING:
            ring_flush(st_ref[_OUTP_SLOT])  # final partial-period flush
        elif HBM_WIN:
            # stream the halves to HBM; the wrapper interleaves (one
            # cheap XLA pass) to keep the external (W/4, L) contract
            d0 = pltpu.make_async_copy(win_e, we_out, dma_sem.at[0])
            d1 = pltpu.make_async_copy(win_o, wo_out, dma_sem.at[1])
            d0.start()
            d1.start()
            d0.wait()
            d1.wait()
        else:
            # interleave the parity halves back to stream order (leading-
            # dim reshapes are layout no-ops; the stack is one bulk copy)
            e_un = win_e[:].reshape(WIN_WORDS // 2, S, M)
            o_un = win_o[:].reshape(WIN_WORDS // 2, S, M)
            win_ref[:] = jnp.stack(
                [e_un, o_un], axis=1
            ).reshape(WIN_WORDS, S, M)
        err_ref[:] = (st_ref[_META_SLOT] & 15)[None]
        outp_ref[:] = st_ref[_OUTP_SLOT][None]
        iters_ref[:] = (jnp.zeros((S, M), _I32) + final_it)[None]

    half_shape = (WIN_WORDS // 2 // F, FS, M)
    small = jax.ShapeDtypeStruct((1, S, M), jnp.int32)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    if HBM_WIN:
        out_shapes = (
            jax.ShapeDtypeStruct(half_shape, jnp.int32),
            jax.ShapeDtypeStruct(half_shape, jnp.int32),
            small, small, small,  # err, outp, iters
        )
        out_specs = (
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            vspec, vspec, vspec,
        )
        win_in_spec = pl.BlockSpec(memory_space=pltpu.ANY)  # unused
        extra = [pltpu.VMEM(half_shape, jnp.int32)] * 2 + [
            pltpu.SemaphoreType.DMA((2,))
        ]
    else:
        out_shapes = (
            jax.ShapeDtypeStruct((WIN_WORDS, S, M), jnp.int32),
            small, small, small,
        )
        out_specs = (vspec,) * 4
        win_in_spec = vspec
        extra = (
            [pltpu.VMEM((RW_WORDS // 2, S, M), jnp.int32)] * 2
            if cfg.RING else
            [pltpu.VMEM(half_shape, jnp.int32)] * 2
        )
    if HBM_WIN:
        # the kernel never reads win_init (gap-free => zero prefill):
        # accept a tiny dummy so callers skip materializing W*L zeros
        win_in_arr = win_init.reshape(-1, S, M)
    else:
        win_in_arr = win_init.reshape(WIN_WORDS, S, M)
    results = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        in_specs=[vspec, win_in_spec] + [vspec] * 5,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((NSLOT_EFF, S, M), jnp.int32),  # lane state slots
            pltpu.VMEM((PROB_WORDS // F_P, F_P * S, M), jnp.int32),
            pltpu.VMEM((TILE_WORDS, S, M), jnp.int32),  # input lookahead
        ] + extra,
        interpret=interpret,
    )(
        inbuf.reshape(IN_WORDS, S, M),
        win_in_arr,
        in_start.reshape(K, S, M),
        in_end.reshape(K, S, M),
        out_start.reshape(K, S, M),
        out_end.reshape(K, S, M),
        chunk_meta.reshape(K, S, M),
    )
    if HBM_WIN:
        we_h, wo_h, err, outp, iters = results
        e_un = we_h.reshape(WIN_WORDS // 2, S, M)
        o_un = wo_h.reshape(WIN_WORDS // 2, S, M)
        win = jnp.stack([e_un, o_un], axis=1).reshape(WIN_WORDS, S, M)
    else:
        win, err, outp, iters = results
    return (
        win.reshape(WIN_WORDS, L),
        err.reshape(1, L),
        outp.reshape(1, L),
        iters.reshape(1, L),
    )
