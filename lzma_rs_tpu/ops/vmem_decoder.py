"""VMEM-resident Pallas decoder: the high-throughput TPU compute path.

The XLA lane kernel (``ops/lane_decoder.py``) keeps its probability tables
and LZ window in HBM; every micro-op pays an HBM gather/scatter that XLA
serializes per lane (~0.5 us/lane/iter, docs/DESIGN.md). This kernel holds
*everything* in VMEM and expresses every data-dependent access as a masked
one-hot select, which the VPU executes at ~2e12 element-ops/s (measured:
``tools/probe_mosaic.py``, docs/DESIGN.md "Mosaic probe results"):

- probability tables: one flat "hot" table (everything except literals,
  1847 entries/lane, padded to 2048) plus the literal table
  (``NLIT x 768``/lane). A hot bit costs a one-hot read + write over
  ``[L, 2048]`` (~0.3 us per 128 lanes). Literal symbols extract their
  768-entry context row into a working tile at symbol start, walk their
  8-11 bits against the tile, and the row merges back when the next
  literal starts (amortized over the symbol's bits).
- the LZ window *is* the output, stored **packed**: ``[L, W/4]`` int32
  words (4 little-endian bytes each). Mosaic reduces only over
  i32/f32, and packing also cuts every window one-hot to a quarter of
  the elements. Byte reads extract from the gathered word; byte writes
  read-modify-write the target word. ``W`` bounds the dict-reset segment
  size this kernel accepts — the "TPU profile" (archives whose reset
  segments are <= W, e.g. produced by our encoder with
  ``block_size <= W``) decodes here; bigger-dict streams fall back to the
  XLA lane kernel or the native host engine.
- compressed input is staged per lane, packed the same way
  (``[L, W_IN/4]`` i32), and read through a 256-byte lookahead tile,
  refilled for all lanes every MAINT=64 iterations (consumption is <= 1
  byte/lane/iteration by construction, so a row-aligned tile always
  covers the next MAINT reads).

Lanes = independent dict-reset segments, exactly as in the XLA kernel;
the 19-node micro-op DFA and all symbol semantics mirror the executable
spec (``models/spec.py``) and the reference decoder:
  range coder:   /root/reference/src/decode/rangecoder.rs:93-152
  state machine: /root/reference/src/decode/lzma.rs:278-593
  LZMA2 resets:  /root/reference/src/decode/lzma2.rs:104-193

Bit-exactness versus the spec is enforced by tests (interpret mode on
CPU; compiled on TPU).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lzma_rs_tpu.models.state import PROB_INIT

# Perf-ablation switches (tools/probe_step_cost.py): comma-separated list
# in LZMA_RS_TPU_ABLATE disables kernel components to attribute per-step
# cost. "spin" makes the while-loop ignore lane completion (pure cost
# measurement; output is garbage). Never set in production.
import os as _os

_ABLATE = frozenset(
    filter(None, _os.environ.get("LZMA_RS_TPU_ABLATE", "").split(","))
)

# Node ids (same DFA as ops/lane_decoder.py).
N_ISMATCH = 0
N_LIT = 1
N_LITM = 2
N_ISREP = 3
N_ISREPG0 = 4
N_ISREP0LONG = 5
N_ISREPG1 = 6
N_ISREPG2 = 7
N_LEN_CHOICE = 8
N_LEN_CHOICE2 = 9
N_LEN_TREE = 10
N_POSSLOT = 11
N_SPECPOS = 12
N_DIRECT = 13
N_ALIGN = 14
N_COPY = 15
N_CHUNK = 16
N_DONE = 17
N_ERROR = 18

# Error codes (shared with lane_decoder's host mapping).
ERR_NONE = 0
ERR_EOF = 1
ERR_DIST_OUT = 2
ERR_DIST_DICT = 3
ERR_SIZE = 4
ERR_EOS_EXTRA = 5
ERR_SHORT = 6
ERR_MATCHDIST = 7
# Ring-mode only: a (valid) match distance exceeds the resident ring.
# Not corruption — the host retries the batch on the full-window kernel.
ERR_RING = 8

# ---------------------------------------------------------------------------
# Hot probability table layout (per lane): everything except literals.
# Parameterized by NPS (pos-state count): the reference sizes is_match /
# is_rep_0long / len low+mid trees for 16 pos_states, but archives with
# pb <= 2 only ever touch 4 — packing them (NPS=4) shrinks the hot table
# from 1847 to 1175 entries, cutting every probability one-hot pass by
# ~30%. NPS=16 reproduces the reference layout exactly.
# ---------------------------------------------------------------------------


def hot_layout(nps: int) -> dict:
    """Offsets of each probability group in the packed hot table (nps = pos-state width); mirrors models/state.py's flat layout minus the literal block."""
    o = {}
    pos = 0

    def take(name, n):
        nonlocal pos
        o[name] = pos
        pos += n

    take("is_match", 12 * nps)
    take("is_rep", 12)
    take("is_rep_g0", 12)
    take("is_rep_g1", 12)
    take("is_rep_g2", 12)
    take("is_rep_0long", 12 * nps)
    take("pos_slot", 4 * 64)
    # The kernels place slot s's reverse tree at offset base_dist - 4
    # instead of the reference's packed base_dist - pos_slot: every
    # subtree base is then EVEN (closed form — for base = (2|(s&1))<<nd
    # the even-aligned cumulative offset IS base-4), so the TB=2 pair
    # prefetch covers spec_pos second bits too (the two candidates
    # base+2*acc, base+2*acc+1 share one packed word). Still bijective
    # and non-overlapping; costs 123 (+1 pad) entries instead of 115.
    # The table is kernel-private (init-only), so the arrangement is
    # free to differ from the reference layout.
    take("spec_pos", 124)
    take("align", 16)
    len_size = 2 + nps * 8 * 2 + 256  # choice, choice2, low, mid, high
    take("len", len_size)
    take("rep_len", len_size)
    o["total"] = pos
    o["padded"] = (pos + 15) & ~15
    # len-coder internal offsets
    o["len_low"] = 2
    o["len_mid"] = 2 + nps * 8
    o["len_high"] = 2 + nps * 8 * 2
    return o


LIT_ROW = 0x300           # 768 entries per literal context

_I32 = jnp.int32
_U32 = jnp.uint32

# State transitions in closed arithmetic form (2-4 vector ops instead of
# an 11-deep select chain each; validated against models/state.py tables
# by tests/test_vmem_kernel.py bit-exactness):
#   after_lit:      0..3 -> 0, 4..9 -> s-3, 10..11 -> s-6
#   after_match:    <7 -> 7,  else 10
#   after_rep:      <7 -> 8,  else 11
#   after_shortrep: <7 -> 9,  else 11


def _after_lit(state):
    return jnp.maximum(0, state - 3 - 3 * (state >= 10).astype(_I32))


def _after_match(state):
    return 7 + 3 * (state >= 7).astype(_I32)


def _after_rep(state):
    return 8 + 3 * (state >= 7).astype(_I32)


def _after_shortrep(state):
    return 9 + 2 * (state >= 7).astype(_I32)


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    """Static shape bucket. VMEM ~= L*(W + W_IN + 4*(NLIT*768 + 2048 + 768
    + 256)) bytes; the default (128, 16384, 16384, 8) is ~12 MB.

    ``RING`` > 0 selects the ring-window mode: all window reads (match
    sources, matched-literal bytes) and the read-modify-write output port
    hit a VMEM ring of the most recent RING bytes, and the ring bulk-
    flushes to the full output window once per maintenance period. The
    per-step window passes shrink from O(W/4) to O(RING/4) rows — the
    dominant cost at W=16K. Requires match distances <= RING (the kernel
    flags ERR_RING otherwise and the host retries on the full-window
    kernel; archives from ``xz_compress(tpu_profile=True)`` are encoded
    with ``dist_cap=RING`` so they always stay on the ring path) and
    gap-free segments (no mid-segment stored chunks — the ring never
    learns prefilled bytes)."""

    L: int = 128        # lanes (independent dict-reset segments)
    W: int = 16384      # window/output bytes per lane (max segment size)
    W_IN: int = 16384   # staged compressed input bytes per lane
    NLIT: int = 8       # literal contexts (1 << (lc+lp)); lc+lp <= 3
    K: int = 8          # max chunks per lane
    TILE: int = 256     # input lookahead tile width
    MAINT: int = 64     # lookahead refill period (consumption <= 1 B/step)
    UNROLL: int = 2     # steps per inner while iteration (divides MAINT)
    RING: int = 0       # resident-history bytes (0 = full-window mode)
    NPS: int = 16       # pos-state table width (4 for pb <= 2 archives)

    def __post_init__(self):
        assert self.NPS in (4, 16)
        assert self.K <= 63  # chunk_i rides 6 bits of the meta carry
        if self.RING:
            assert self.RING % 4 == 0 and self.RING & (self.RING - 1) == 0
            assert self.RING <= self.W
            assert self.W % self.RING == 0
            # dirty bytes per maintenance period (<= 4 B/step) plus the
            # flush's word-rounded low edge must fit the ring
            assert 4 * self.MAINT + 4 <= self.RING

    @property
    def lit_w(self) -> int:
        return self.NLIT * LIT_ROW


def pack_chunk_meta(reset_state, lcs, lps, pbs, valid):
    """Pack the five small per-chunk fields into one [K, L] i32 table so
    chunk setup (Stage E) pays one one-hot pass instead of five."""
    return (
        (reset_state & 3)
        | (lcs << 2)
        | (lps << 6)
        | (pbs << 9)
        | (valid << 12)
    )


def decode_segments_vmem(
    inbuf,        # [W_IN//4, L] i32 — staged compressed bytes, LE-packed
    win_init,     # [W//4, L] i32 — prefilled with uncompressed chunks
    in_start,     # [K, L] i32 — lane-local chunk payload offsets
    in_end,       # [K, L] i32
    out_start,    # [K, L] i32 — lane-local output offset at chunk start
    out_end,      # [K, L] i32
    chunk_meta,   # [K, L] i32 — pack_chunk_meta(reset, lc, lp, pb, valid)
    *,
    config: KernelConfig,
    max_iters: int,
    interpret: bool = False,
):
    """Decode all lanes to completion. Returns (win, err, outp, iters)."""
    cfg = config
    L, W, W_IN, K, TILE = cfg.L, cfg.W, cfg.W_IN, cfg.K, cfg.TILE
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
    TILE_WORDS = TILE // 4
    ROW_WORDS = 32  # 128 bytes per input row

    RW_WORDS = cfg.RING // 4 if cfg.RING else 0

    def kernel(
        in_ref, win_in_ref, is_ref, ie_ref, os_ref, oe_ref, meta_ref,
        win_ref, err_ref, outp_ref, iters_ref,
        prob_ref, tile_ref, *extra_scratch,
    ):
        ring_ref = extra_scratch[0] if cfg.RING else None
        win_ref[:] = win_in_ref[:]
        prob_ref[:] = jnp.full((PROB_WORDS, L), PROB_PACKED, _I32)
        tile_ref[:] = jnp.zeros((TILE_WORDS, L), _I32)
        if cfg.RING:
            ring_ref[:] = jnp.zeros((RW_WORDS, L), _I32)


        # All tables are stored TRANSPOSED — [W, L] with lanes on the
        # minor axis — because Mosaic cannot relayout a loop-carried
        # [L] vector onto sublanes ([:, None] transposes do not lower);
        # broadcasting along the major axis () is free.

        def onehot_read_v(table, idx, width):
            """v[l] = table[idx[l], l]; idx [L]; values must be >= 0."""
            rows = jax.lax.broadcasted_iota(_I32, (width, L), 0)
            sel = jnp.where(rows == idx[None, :], table, 0)
            return jnp.max(sel, axis=0)

        def onehot_read_word(table, idx, width):
            """Packed-word read: exactly one element is selected and the
            rest are zero, so a sum reduce recovers the (possibly
            negative) word exactly."""
            rows = jax.lax.broadcasted_iota(_I32, (width, L), 0)
            sel = jnp.where(rows == idx[None, :], table, 0)
            return jnp.sum(sel, axis=0)

        def _extract_byte(word, k):
            # constant-shift 4-way select: per-lane variable shifts are
            # 2x slower in Mosaic (tools/probe_mosaic3.py P11)
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

        def refill(inp):
            """Row-aligned lookahead: tile[l, :] = packed
            inbuf[l, a : a + TILE] with a = (inp[l] // 128) * 128, via one
            one-hot row select per input row. Coverage after refill:
            >= TILE - 128 bytes past inp, enough for MAINT steps of
            1-byte reads plus rc-init."""
            if "refill" in _ABLATE:
                return
            row0 = (inp // 128)[None, :]
            n_rows = TILE // 128
            acc = [jnp.zeros((ROW_WORDS, L), _I32) for _ in range(n_rows)]
            for r in range(IN_WORDS // ROW_WORDS):
                chunk = in_ref[r * ROW_WORDS:(r + 1) * ROW_WORDS, :]
                for t in range(n_rows):
                    acc[t] = jnp.where(row0 + t == r, chunk, acc[t])
            tile_ref[:] = jnp.concatenate(acc, axis=0)

        def step(_, carry):
            # one DFA micro-op per lane; runs MAINT times per outer
            # maintenance iteration (see the loop nest at the bottom —
            # refill cannot live under pl.when: broadcasts of carried
            # vectors inside a when-region hit an unimplemented Mosaic
            # replication relayout, while the same code at while-body
            # top level lowers fine)
            (node0, meta0, rng, cod, inp, inend, outp, outend, state,
             rep0, rep1, rep2, rep3, acc, cnt, tmp, rev, length, dist,
             mbyte, prevb, tile_base, it) = carry
            # Cold fields share one packed carry (8 fewer loop-carried
            # vectors = 16 fewer vregs at L=256; unpack/repack is ~30
            # cheap VPU ops, spills to the VMEM stack are not).
            err = meta0 & 15
            pending = (meta0 >> 4) & 3
            len_rep = (meta0 >> 6) & 1
            lit_ctx = (meta0 >> 7) & 7
            lc = (meta0 >> 10) & 15
            lp = (meta0 >> 14) & 7
            pb = (meta0 >> 17) & 7
            chunk_i = (meta0 >> 20) & 63

            is_prob = (node0 <= N_ALIGN) & (node0 != N_DIRECT)
            is_lit_node = (node0 == N_LIT) | (node0 == N_LITM)
            is_direct = node0 == N_DIRECT
            active_bit = is_prob | is_direct

            pos_state = outp & ((1 << pb) - 1)
            st4 = state * NPS + pos_state

            # -------- Stage A: probability index + one bit ----------------
            match_bit0 = (mbyte >> 7) & 1
            len_base = jnp.where(len_rep == 1, H_REP_LEN, H_LEN)
            # `tmp` holds the tree base for LEN/POS/SPEC/ALIGN walks.
            # (where-chain, not jnp.select: select lowers via argmax,
            # which Mosaic only supports for f32)
            hot_idx = tmp + acc  # N_LEN_TREE, N_POSSLOT, N_SPECPOS, N_ALIGN
            for cond, val in (
                (node0 == N_ISMATCH, H_IS_MATCH + st4),
                (node0 == N_ISREP, H_IS_REP + state),
                (node0 == N_ISREPG0, H_G0 + state),
                (node0 == N_ISREP0LONG, H_REP0LONG + st4),
                (node0 == N_ISREPG1, H_G1 + state),
                (node0 == N_ISREPG2, H_G2 + state),
                (node0 == N_LEN_CHOICE, len_base),
                (node0 == N_LEN_CHOICE2, len_base + 1),
            ):
                hot_idx = jnp.where(cond, val, hot_idx)
            hot_idx = jnp.clip(hot_idx, 0, H_TOTAL - 1)
            # Literal probs live in the same packed table behind the hot
            # entries, addressed with a fused context*row index — a
            # per-symbol working-row swap costs ~5 full row passes per
            # step (measured 2x the whole rest of the kernel); direct
            # access costs one table read + one blended write. Two
            # 11-bit probabilities pack per i32 word (halves the pass).
            lit_idx = jnp.where(
                node0 == N_LITM, ((1 + match_bit0) << 8) + acc, acc
            )
            lit_idx = jnp.clip(
                lit_ctx * LIT_ROW + lit_idx, 0, LIT_W - 1
            )
            pidx = jnp.where(is_lit_node, HOT_W + lit_idx, hot_idx)
            pword_idx = pidx >> 1
            phalf = pidx & 1
            if "probread" in _ABLATE:
                pword = pword_idx * 0 + PROB_PACKED
            else:
                pword = onehot_read_word(prob_ref[:], pword_idx,
                                         PROB_WORDS)
            p = jnp.where(
                phalf == 1, (pword >> 16) & 0xFFFF, pword & 0xFFFF
            ).astype(_U32)

            rng_u = rng.astype(_U32)
            cod_u = cod.astype(_U32)
            bound = (rng_u >> 11) * p
            prob_bit = (cod_u >= bound).astype(_I32)
            new_p = jnp.where(
                prob_bit == 1, p - (p >> 5), p + ((_U32(0x800) - p) >> 5)
            ).astype(_I32)

            new_pword = jnp.where(
                phalf == 1,
                (pword & 0xFFFF) | (new_p << 16),
                (pword & jnp.int32(-0x10000)) | new_p,
            )
            prob_rows = jax.lax.broadcasted_iota(_I32, (PROB_WORDS, L), 0)
            if "probwrite" not in _ABLATE:
                pm = (prob_rows == pword_idx[None, :]) & is_prob[None, :]
                prob_ref[:] = jnp.where(pm, new_pword[None, :], prob_ref[:])

            rng_p = jnp.where(prob_bit == 1, rng_u - bound, bound)
            cod_p = jnp.where(prob_bit == 1, cod_u - bound, cod_u)

            rng_d = rng_u >> 1
            dir_bit = (cod_u >= rng_d).astype(_I32)
            cod_d = jnp.where(dir_bit == 1, cod_u - rng_d, cod_u)

            bit = jnp.where(is_prob, prob_bit, dir_bit)
            rng_u = jnp.where(
                is_prob, rng_p, jnp.where(is_direct, rng_d, rng_u)
            )
            cod_u = jnp.where(
                is_prob, cod_p, jnp.where(is_direct, cod_d, cod_u)
            )

            # -------- Stage B: renormalize --------------------------------
            need = active_bit & (rng_u < _U32(1 << 24))
            can = inp < inend
            eof = need & ~can
            err = jnp.where(eof & (err == ERR_NONE), ERR_EOF, err)
            node = jnp.where(eof, N_ERROR, node0)
            do = need & can
            byte_in = in_byte(inp, tile_base).astype(_U32)
            rng_u = jnp.where(do, rng_u << 8, rng_u)
            cod_u = jnp.where(do, (cod_u << 8) ^ byte_in, cod_u)
            inp = jnp.where(do, inp + 1, inp)
            rng = rng_u.astype(_I32)
            cod = cod_u.astype(_I32)

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


            # --- N_ISMATCH -------------------------------------------------
            m = ok & (node0 == N_ISMATCH)
            m0 = m & (bit == 0)
            # prev byte comes from the carried register (kept current by
            # the write section below), NOT a window pass
            lit_state = ((outp & ((1 << lp) - 1)) << lc) + (
                prevb >> (8 - lc)
            )
            matched = m0 & (state >= 7)
            bad_md = matched & (rep0 + 1 > outp)
            err = jnp.where(bad_md & (err == ERR_NONE), ERR_MATCHDIST, err)
            node = jnp.where(bad_md, N_ERROR, node)
            matched = matched & ~bad_md
            if cfg.RING:
                # matched-literal byte beyond the resident ring: bail to
                # the full-window kernel (host retries on ERR_RING)
                far_ml = matched & (rep0 + 1 > cfg.RING)
                err = jnp.where(far_ml & (err == ERR_NONE), ERR_RING, err)
                node = jnp.where(far_ml, N_ERROR, node)
                matched = matched & ~far_ml
                bad_md = bad_md | far_ml
            # matched byte is read by the shared window port below
            start_lit = m0 & ~bad_md
            acc = jnp.where(start_lit, 1, acc)
            node = jnp.where(
                start_lit, jnp.where(state >= 7, N_LITM, N_LIT), node
            )
            node = jnp.where(m & (bit == 1), N_ISREP, node)

            lit_ctx = jnp.where(start_lit, lit_state, lit_ctx)

            # --- N_LITM ----------------------------------------------------
            m = ok & (node0 == N_LITM)
            acc = jnp.where(m, (acc << 1) | bit, acc)
            mbyte = jnp.where(m, (mbyte << 1) & 0xFF, mbyte)
            done_litm = m & (acc >= 0x100)
            drop = m & ~done_litm & (bit != match_bit0)
            node = jnp.where(drop, N_LIT, node)

            # --- N_LIT -----------------------------------------------------
            m = ok & (node0 == N_LIT)
            acc = jnp.where(m, (acc << 1) | bit, acc)
            done_lit = (m & (acc >= 0x100)) | done_litm

            lit_emit = (acc - 0x100) & 0xFF
            state = jnp.where(done_lit, _after_lit(state), state)
            # end_symbol runs merged with copy_done in Stage D;
            # outp advances below, in the combined window write

            # --- N_ISREP ---------------------------------------------------
            m = ok & (node0 == N_ISREP)
            m0 = m & (bit == 0)
            rep3 = jnp.where(m0, rep2, rep3)
            rep2 = jnp.where(m0, rep1, rep2)
            rep1 = jnp.where(m0, rep0, rep1)
            len_rep = jnp.where(m0, 0, len_rep)
            node = jnp.where(m0, N_LEN_CHOICE, node)
            node = jnp.where(m & (bit == 1), N_ISREPG0, node)

            # --- N_ISREPG0 -------------------------------------------------
            m = ok & (node0 == N_ISREPG0)
            node = jnp.where(m & (bit == 0), N_ISREP0LONG, node)
            node = jnp.where(m & (bit == 1), N_ISREPG1, node)

            # --- N_ISREP0LONG ---------------------------------------------
            m = ok & (node0 == N_ISREP0LONG)
            short = m & (bit == 0)
            state = jnp.where(short, _after_shortrep(state), state)
            # (copy starts via the merged start_copy below)
            long0 = m & (bit == 1)
            len_rep = jnp.where(long0, 1, len_rep)
            node = jnp.where(long0, N_LEN_CHOICE, node)

            # --- N_ISREPG1 -------------------------------------------------
            m = ok & (node0 == N_ISREPG1)
            sel1 = m & (bit == 0)
            r0, r1 = rep0, rep1
            rep0 = jnp.where(sel1, r1, rep0)
            rep1 = jnp.where(sel1, r0, rep1)
            len_rep = jnp.where(sel1, 1, len_rep)
            node = jnp.where(sel1, N_LEN_CHOICE, node)
            node = jnp.where(m & (bit == 1), N_ISREPG2, node)

            # --- N_ISREPG2 -------------------------------------------------
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

            # --- N_LEN_CHOICE ----------------------------------------------
            m = ok & (node0 == N_LEN_CHOICE)
            low = m & (bit == 0)
            tmp = jnp.where(low, len_base + L_LOW + pos_state * 8, tmp)
            cnt = jnp.where(low, 3, cnt)
            acc = jnp.where(low, 1, acc)
            rev = jnp.where(low, 0, rev)  # rev doubles as len_add
            node = jnp.where(low, N_LEN_TREE, node)
            node = jnp.where(m & (bit == 1), N_LEN_CHOICE2, node)

            # --- N_LEN_CHOICE2 ---------------------------------------------
            m = ok & (node0 == N_LEN_CHOICE2)
            mid = m & (bit == 0)
            high = m & (bit == 1)
            tmp = jnp.where(mid, len_base + L_MID + pos_state * 8, tmp)
            tmp = jnp.where(high, len_base + L_HIGH, tmp)
            cnt = jnp.where(mid, 3, jnp.where(high, 8, cnt))
            acc = jnp.where(m, 1, acc)
            rev = jnp.where(mid, 8, jnp.where(high, 16, rev))
            node = jnp.where(m, N_LEN_TREE, node)

            # --- N_LEN_TREE ------------------------------------------------
            m = ok & (node0 == N_LEN_TREE)
            acc = jnp.where(m, (acc << 1) | bit, acc)
            cnt = jnp.where(m, cnt - 1, cnt)
            done_len = m & (cnt == 0)
            tree_size = jnp.where(rev >= 16, 256, 8)
            lval = rev + acc - tree_size  # 0..271
            length = jnp.where(done_len, lval, length)
            repdone = done_len & (len_rep == 1)
            state = jnp.where(repdone, _after_rep(state), state)
            # (copy starts via the merged start_copy below)
            matchdone = done_len & (len_rep == 0)
            state = jnp.where(matchdone, _after_match(state), state)
            len_state = jnp.minimum(length, 3)
            tmp = jnp.where(matchdone, H_POS_SLOT + len_state * 64, tmp)
            cnt = jnp.where(matchdone, 6, cnt)
            acc = jnp.where(matchdone, 1, acc)
            node = jnp.where(matchdone, N_POSSLOT, node)

            # --- N_POSSLOT -------------------------------------------------
            m = ok & (node0 == N_POSSLOT)
            acc = jnp.where(m, (acc << 1) | bit, acc)
            cnt = jnp.where(m, cnt - 1, cnt)
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

            # --- N_SPECPOS -------------------------------------------------
            m = ok & (node0 == N_SPECPOS)
            acc = jnp.where(m, (acc << 1) | bit, acc)
            rev = jnp.where(m, rev | (bit * mbyte), rev)
            mbyte = jnp.where(m, mbyte << 1, mbyte)
            cnt = jnp.where(m, cnt - 1, cnt)
            done_sp = m & (cnt == 0)

            # --- N_DIRECT --------------------------------------------------
            m = ok & (node0 == N_DIRECT)
            acc = jnp.where(m, (acc << 1) | bit, acc)
            cnt = jnp.where(m, cnt - 1, cnt)
            done_d = m & (cnt == 0)
            dist = jnp.where(done_d, dist + (acc << 4), dist)
            tmp = jnp.where(done_d, H_ALIGN, tmp)
            cnt = jnp.where(done_d, 4, cnt)
            acc = jnp.where(done_d, 1, acc)
            rev = jnp.where(done_d, 0, rev)
            mbyte = jnp.where(done_d, 1, mbyte)
            node = jnp.where(done_d, N_ALIGN, node)

            # --- N_ALIGN ---------------------------------------------------
            m = ok & (node0 == N_ALIGN)
            acc = jnp.where(m, (acc << 1) | bit, acc)
            rev = jnp.where(m, rev | (bit * mbyte), rev)
            mbyte = jnp.where(m, mbyte << 1, mbyte)
            cnt = jnp.where(m, cnt - 1, cnt)
            done_al = m & (cnt == 0)

            # -------- merged distance finish + copy start -------------------
            # One instantiation serves POSSLOT(small)/SPECPOS/ALIGN
            # finishes and the short-rep / rep-len copy starts — the
            # masks are disjoint by node, and a single pass saves ~60
            # vector-op issues per step.
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
            # sc_dist < 1 catches i32 wraparound of corrupt huge
            # distances (valid segments keep dist <= W < 2^31)
            bad = sc & ((sc_dist > outp) | (sc_dist < 1))
            err = jnp.where(bad & (err == ERR_NONE), ERR_DIST_OUT, err)
            node = jnp.where(bad, N_ERROR, node)
            good = sc & ~bad
            if cfg.RING:
                # valid distance beyond the ring: not corruption — flag
                # ERR_RING so the host retries on the full-window kernel
                ring_far = good & (sc_dist > cfg.RING)
                err = jnp.where(ring_far & (err == ERR_NONE), ERR_RING, err)
                node = jnp.where(ring_far, N_ERROR, node)
                good = good & ~ring_far
            node = jnp.where(good, N_COPY, node)
            length = jnp.where(good, sc_len, length)
            dist = jnp.where(good, sc_dist, dist)

            # -------- Stage D: copy lanes move up to 4 bytes ----------------
            # (the source word pair is read by the shared window port
            # below). Per step a copy lane emits k bytes, where k keeps
            # the write inside one dest word and inside the match/chunk;
            # dist < 4 overlaps are handled by period-replicating the
            # source group, so k never depends on dist.
            m = node0 == N_COPY
            over = m & (outp >= outend) & (length > 0)
            err = jnp.where(over & (err == ERR_NONE), ERR_SIZE, err)
            node = jnp.where(over, N_ERROR, node)
            m_w = m & ~over
            k_copy = jnp.minimum(
                jnp.minimum(4 - (outp & 3), length), outend - outp
            )
            k_copy = jnp.clip(k_copy, 1, 4)
            nadv = jnp.where(m_w, k_copy, 1)  # literal lanes emit 1 byte
            length = jnp.where(m_w, length - nadv, length)
            copy_done = m_w & (length == 0)
            node, err = end_symbol(
                done_lit | copy_done, node, err, outp + nadv
            )
            outp_w = outp  # emit position, before Stage E retargets outp

            # -------- Stage E: chunk setup ----------------------------------
            m = node0 == N_CHUNK
            ci = jnp.clip(chunk_i, 0, K - 1)

            def sched(ref):
                return onehot_read_v(ref[:], ci, K)

            # Per-chunk fields come from [K, L] table reads. A direct row
            # load (``ref[0, :]``) of a lane count does NOT lower here:
            # carried 1-D vectors live sublane-REPLICATED, a row load is
            # sublane-concrete, and mixing the two needs Mosaic's
            # unimplemented "Sublane broadcast" relayout. Sublane
            # reductions (the one-hot reads) produce replicated values,
            # so sched() is safe. The five small fields (reset/lc/lp/pb/
            # valid) ride one packed table (pack_chunk_meta), so chunk
            # setup costs 5 passes, not 9.
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

            # input coverage: rc-init plus one maintenance period must fit
            # inside the tile; otherwise point `inp` at the chunk and wait
            # for the next refill.
            covered = (
                (cin >= tile_base)
                & (cin + 5 + cfg.MAINT + 8 <= tile_base + TILE)
            )
            # Probability-table resets cannot happen here: a masked table
            # write under pl.when hits Mosaic's unimplemented relayout
            # ("Sublane broadcast") of captured carried vectors, and an
            # unconditional blend would triple the per-step cost. Instead
            # a reset chunk PARKS the lane (pending=1); the blend runs at
            # the next maintenance boundary (outer_body top level, where
            # the same broadcast lowers fine), which flips pending to 2.
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

            b1 = in_byte(cin + 1, tile_base).astype(_U32)
            b2 = in_byte(cin + 2, tile_base).astype(_U32)
            b3 = in_byte(cin + 3, tile_base).astype(_U32)
            b4 = in_byte(cin + 4, tile_base).astype(_U32)
            code0 = ((b1 << 24) | (b2 << 16) | (b3 << 8) | b4).astype(_I32)
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

            # -------- shared window READ port (one traversal per step) -----
            # Row pair selected by node0 — the three users are mutually
            # exclusive per lane:
            #   N_COPY    -> match source group (4 bytes) (outp - dist)
            #   N_ISMATCH -> matched-literal byte         (outp - 1 - rep0)
            #   N_CHUNK   -> prev byte for a chunk that resumes after a
            #                prefilled gap                (cout_start - 1)
            is_copy = node0 == N_COPY
            is_chunkn = node0 == N_CHUNK
            port_pos = jnp.where(
                is_copy, outp_w - dist,
                jnp.where(is_chunkn, cout_start - 1, outp_w - 1 - rep0),
            )
            port_pos = jnp.clip(port_pos, 0, W - 1)
            pw_idx = port_pos >> 2
            if "port" in _ABLATE:
                pw_rows = jax.lax.broadcasted_iota(
                    _I32, (RW_WORDS if cfg.RING else WIN_WORDS, L), 0
                )
                w0 = pw_idx * 0
                w1 = w0
            elif cfg.RING:
                # ring-resident history: positions in [outp - RING, outp)
                # live at word (pos >> 2) mod RW_WORDS. All port users are
                # ring-bounded (dist/rep0 checked above; gap-resume chunks
                # are excluded from ring plans by the runtime gate).
                pw_rows = jax.lax.broadcasted_iota(_I32, (RW_WORDS, L), 0)
                r0 = pw_idx & (RW_WORDS - 1)
                r1 = (pw_idx + 1) & (RW_WORDS - 1)
                w0 = jnp.sum(
                    jnp.where(pw_rows == r0[None, :], ring_ref[:], 0),
                    axis=0,
                )
                w1 = jnp.sum(
                    jnp.where(pw_rows == r1[None, :], ring_ref[:], 0),
                    axis=0,
                )
            else:
                pw_rows = jax.lax.broadcasted_iota(_I32, (WIN_WORDS, L), 0)
                w0 = jnp.sum(
                    jnp.where(pw_rows == pw_idx[None, :], win_ref[:], 0),
                    axis=0,
                )
                pw1 = jnp.minimum(pw_idx + 1, WIN_WORDS - 1)
                w1 = jnp.sum(
                    jnp.where(pw_rows == pw1[None, :], win_ref[:], 0),
                    axis=0,
                )
            port_byte = _extract_byte(w0, port_pos & 3)
            mbyte = jnp.where(matched, port_byte, mbyte)
            # 4-byte little-endian group starting at port_pos (unaligned:
            # constant-shift 4-way select; per-lane variable shifts are
            # 2x slower in Mosaic)
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
            # dist < 4: only the first `dist` source bytes exist yet;
            # period-replicate them so all 4 group bytes are valid
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

            # -------- combined window write (literal emit OR copy group) ---
            # packed read-modify-write of the dest word: wcnt bytes of
            # wval land at byte offset (outp & 3); k_copy keeps the span
            # inside one word
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
                widx_r = widx & (RW_WORDS - 1)
                old_w = onehot_read_word(ring_ref[:], widx_r, RW_WORDS)
                new_w = (
                    (old_w.astype(_U32) & ~maskp) | placed
                ).astype(_I32)
                sel = (pw_rows == widx_r[None, :]) & wmask[None, :]
                ring_ref[:] = jnp.where(sel, new_w[None, :], ring_ref[:])
            else:
                old_w = onehot_read_word(win_ref[:], widx, WIN_WORDS)
                new_w = (
                    (old_w.astype(_U32) & ~maskp) | placed
                ).astype(_I32)
                sel = (pw_rows == widx[None, :]) & wmask[None, :]
                win_ref[:] = jnp.where(sel, new_w[None, :], win_ref[:])
            outp = jnp.where(wmask, outp + wcnt, outp)

            # prev-byte register: LAST emitted byte of the group;
            # reloaded from the window when a chunk resumes after a
            # prefilled gap; 0 at the start of a fresh segment.
            lastb = jnp.where(
                wcnt == 1, wval & 0xFF,
                jnp.where(
                    wcnt == 2, (wval >> 8) & 0xFF,
                    jnp.where(
                        wcnt == 3, (wval >> 16) & 0xFF, (wval >> 24) & 0xFF
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
                    | (pb << 17) | (chunk_i << 20))
            return (node, meta, rng, cod, inp, inend, outp, outend, state,
                    rep0, rep1, rep2, rep3, acc, cnt, tmp, rev, length,
                    dist, mbyte, prevb, tile_base, it + 1)

        def ring_flush(outp):
            """Bulk-copy the ring's whole resident range
            [max(outp - RING, 0), outp) into the full output window,
            byte-precise at the high edge (the word containing ``outp``
            may also hold prefill/slack bytes that must survive). Dirty
            bytes per period are <= 4*MAINT <= RING, so re-flushing the
            already-flushed tail is an idempotent rewrite of identical
            bytes — which keeps the loop free of a flush-watermark carry
            (an unused inner-loop carry would be inferred replicated and
            its concrete update could not relayout into it). One full
            window traversal per maintenance period — amortized to
            ~W/MAINT elem-ops per step versus O(W) per step for
            full-window ports."""
            hi = outp[None, :]
            # Low edge rounds UP to a word boundary: the partial low word
            # mixes epoch-ahead ring bytes that must not overwrite already
            # -flushed output. The skipped <=3 bytes were flushed by an
            # earlier boundary (flushes land every <= 4*MAINT << RING
            # bytes of progress).
            lo_w = (jnp.maximum(outp - cfg.RING, 0)[None, :] + 3) >> 2
            rows_r = jax.lax.broadcasted_iota(_I32, (RW_WORDS, L), 0)
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
                blk = win_ref[b * RW_WORDS:(b + 1) * RW_WORDS, :]
                merged = (blk & ~bm) | (ring_ref[:] & bm)
                win_ref[b * RW_WORDS:(b + 1) * RW_WORDS, :] = merged

        def outer_body(carry):
            # maintenance at while-body top level (NOT under pl.when —
            # see step()'s note), then MAINT DFA micro-ops. Input
            # consumption is <= 1 byte/step, so the freshly aligned tile
            # covers every read until the next refill. The inner loop is
            # a while_loop, not fori/scan: vectors carried across a scan
            # boundary hit Mosaic's unimplemented sublane broadcast.
            inp = carry[4]
            refill(inp)
            tile_base = (inp // 128) * 128
            # apply parked probability-table resets (pending 1 -> 2);
            # pending lives in the packed meta carry at bits 4-5
            meta = carry[1]
            pending = (meta >> 4) & 3
            p32 = (pending == 1).astype(_I32)[None, :]
            prob_ref[:] = prob_ref[:] + (PROB_PACKED - prob_ref[:]) * p32
            meta = jnp.where(pending == 1, (meta & ~0x30) | (2 << 4), meta)
            # carry layout: node0(0), meta(1), ..., prevb(20),
            # tile_base(21), it(22)
            carry = carry[:1] + (meta,) + carry[2:21] + (tile_base,) \
                + carry[22:]
            if cfg.RING and "flush" not in _ABLATE:
                ring_flush(carry[6])
            j0 = jnp.int32(0)

            def inner_cond(jc):
                return jc[0] < cfg.MAINT

            def inner_body(jc):
                j, inner = jc
                for _ in range(cfg.UNROLL):
                    inner = step(None, inner)
                return (j + cfg.UNROLL, inner)

            _, carry = jax.lax.while_loop(inner_cond, inner_body,
                                          (j0, carry))
            return carry

        def cond(carry):
            node = carry[0]
            it = carry[-1]
            if "spin" in _ABLATE:
                return it < max_iters
            active = jnp.max(jnp.where(node < N_DONE, 1, 0))
            return (active == 1) & (it < max_iters)

        z = jnp.zeros((L,), _I32)
        init = (
            jnp.full((L,), N_CHUNK, _I32),   # node
            z,                                  # meta (packed cold fields)
            jnp.full((L,), -1, _I32),         # rng
            z,                                  # cod
            z,                                  # inp
            z,                                  # inend
            z,                                  # outp
            z,                                  # outend
            z,                                  # state
            z, z, z, z,                         # rep0..rep3
            z,                                  # acc
            z,                                  # cnt
            z,                                  # tmp (tree base)
            z,                                  # rev (len_add / rev bits)
            z,                                  # length
            z,                                  # dist
            z,                                  # mbyte
            z,                                  # prevb (last output byte)
            z,                                  # tile_base
            jnp.zeros((), _I32),                # it (scalar step counter)
        )
        final = jax.lax.while_loop(cond, outer_body, init)
        if cfg.RING:
            # final partial-period flush (lanes finish mid-period)
            ring_flush(final[6])
        err_ref[:] = (final[1] & 15)[None, :]  # err = meta bits 0-3
        outp_ref[:] = final[6][None, :]
        iters_ref[:] = (jnp.zeros((L,), _I32) + final[-1])[None, :]

    out_shapes = (
        jax.ShapeDtypeStruct((W // 4, L), jnp.int32),  # win (packed, transposed)
        jax.ShapeDtypeStruct((1, L), jnp.int32),     # err
        jax.ShapeDtypeStruct((1, L), jnp.int32),     # outp
        jax.ShapeDtypeStruct((1, L), jnp.int32),     # iters
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        # v5e has 128 MiB of VMEM; the default 16 MiB scoped limit is what
        # capped lane count at L=256 (the while-loop's register spills live
        # on the VMEM stack, which scales with L). Raising the limit lets
        # larger lane batches amortize the fixed per-step cost.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shapes
        ),
        scratch_shapes=[
            pltpu.VMEM((PROB_WORDS, L), jnp.int32),
            pltpu.VMEM((TILE // 4, L), jnp.int32),   # input lookahead
        ] + (
            [pltpu.VMEM((cfg.RING // 4, L), jnp.int32)]  # history ring
            if cfg.RING else []
        ),
        interpret=interpret,
    )(
        inbuf, win_init, in_start, in_end, out_start, out_end, chunk_meta,
    )
