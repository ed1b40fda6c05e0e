"""Lane-parallel LZMA decoder: the TPU compute path.

The reference decodes one bit at a time through a loop-carried dependency
(``/root/reference/src/decode/rangecoder.rs:93-120``) — unvectorizable
within one stream. The TPU-native design restructures the decoder as a
**micro-op state machine over independent lanes**: every vector lane decodes
one independent work unit (an LZMA2 dict-reset segment / `.xz` block /
raw-LZMA stream), and all lanes execute the same micro-op per iteration —
one range-coder bit, one match-copy byte, or one chunk setup — with
per-lane control encoded as a node id and predicated updates (SoA registers
of shape ``[L]``).

Algorithmic behavior mirrors the executable spec (``models/spec.py``);
bit-exactness versus the spec and the reference corpus is enforced by
tests.

Memory model:
- input bytes: one flat uint8 array (the compressed stream); lanes read
  via per-lane cursors (gather),
- output bytes: one flat uint8 array covering the final decompressed
  stream **plus one trailing dump slot** for masked-off scatters; each lane
  owns a disjoint absolute range, so assembly is free and LZ window reads
  are gathers into the same array,
- probabilities: ``[L, NPROBS]`` uint16 with an **epoch-versioned** reset
  scheme — per-entry version tags make an LZMA2 state reset O(1) (bump the
  lane's epoch) instead of a row fill (the reference refills its arrays,
  lzma.rs:216-249; on a vector machine that would cost L x NPROBS per
  reset iteration).

The whole kernel is a ``lax.while_loop`` under ``jit``; it runs identically
on CPU (tests, virtual-device sharding) and TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lzma_rs_tpu.models.state import LAYOUT_LCLP4 as L4
from lzma_rs_tpu.models.state import (
    LEN_HIGH,
    LEN_LOW,
    LEN_MID,
    PROB_INIT,
    STATE_AFTER_LIT,
    STATE_AFTER_MATCH,
    STATE_AFTER_REP,
    STATE_AFTER_SHORTREP,
)

NPROBS = L4.total

# Micro-op nodes. DONE/ERROR are the highest ids: active = node < N_DONE.
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

# Error codes surfaced to the host (mapped to reference error strings there).
ERR_NONE = 0
ERR_EOF = 1        # input exhausted mid-symbol ("failed to fill whole buffer")
ERR_DIST_OUT = 2   # LZ distance beyond output size
ERR_DIST_DICT = 3  # LZ distance beyond dictionary size
ERR_SIZE = 4       # Expected unpacked size of N but decompressed to M
ERR_EOS_EXTRA = 5  # EOS marker but more bytes are available
ERR_SHORT = 6      # chunk too short for range-coder init
ERR_MATCHDIST = 7  # matched-literal distance beyond output

_U32 = jnp.uint32
_I32 = jnp.int32

_LIT_NEXT = jnp.asarray(STATE_AFTER_LIT, dtype=_I32)
_MATCH_NEXT = jnp.asarray(STATE_AFTER_MATCH, dtype=_I32)
_REP_NEXT = jnp.asarray(STATE_AFTER_REP, dtype=_I32)
_SHORTREP_NEXT = jnp.asarray(STATE_AFTER_SHORTREP, dtype=_I32)

# Register names forming the while_loop carry (all [L] unless noted).
_REGS = [
    "node", "err", "rng", "cod", "inp", "inend", "outp", "outend",
    "state", "rep0", "rep1", "rep2", "rep3",
    "acc", "cnt", "tmp", "rev", "length", "dist", "mbyte",
    "lit_base", "tree_base", "tree_size", "len_base", "rep_flag",
    "chunk_i", "lc", "lp", "pb",
    "probs", "vers", "epoch",  # [L,NPROBS] u16, [L,NPROBS] u16, [L] i32
    "out",  # [OUT+1] u8 (last element = dump slot)
]


def decode_lanes(
    inbytes,      # [IN] u8 flat compressed bytes
    out_init,     # [OUT+1] u8, prefilled with uncompressed chunks + dump slot
    in_start,     # [L,K] i32 absolute offset of chunk payload (incl. rc init)
    in_end,       # [L,K] i32
    out_start,    # [L,K] i32 absolute output offset at chunk start
    out_end,      # [L,K] i32
    reset_state,  # [L,K] i32 (1 = reset probs/state/reps before chunk)
    lcs, lps, pbs,  # [L,K] i32 props in force for the chunk
    nchunks,      # [L] i32
    seg_base,     # [L] i32 absolute output offset of the lane's segment
    size_known,   # [L] i32 (0 = raw stream terminated by EOS marker)
    dict_size,    # [L] u32
    max_iters=None,
    unroll=1,     # micro-ops per while-loop iteration (amortizes loop cost)
):
    """Run all lanes to completion. Returns (out, err, outp, niters)."""
    L = int(nchunks.shape[0])
    OUTP1 = out_init.shape[0]
    dump = OUTP1 - 1
    IN = inbytes.shape[0]

    i32z = jnp.zeros((L,), _I32)
    u32z = jnp.zeros((L,), _U32)
    R = dict(
        node=jnp.full((L,), N_CHUNK, _I32),
        err=i32z,
        rng=jnp.full((L,), 0xFFFFFFFF, _U32),
        cod=u32z,
        inp=i32z,
        inend=i32z,
        outp=out_start[:, 0],
        outend=i32z,
        state=i32z,
        rep0=u32z, rep1=u32z, rep2=u32z, rep3=u32z,
        acc=i32z, cnt=i32z, tmp=i32z, rev=i32z,
        length=i32z, dist=u32z, mbyte=i32z,
        lit_base=i32z, tree_base=i32z, tree_size=i32z,
        len_base=i32z, rep_flag=i32z,
        chunk_i=i32z,
        lc=i32z, lp=i32z, pb=i32z,
        probs=jnp.full((L, NPROBS), PROB_INIT, jnp.uint16),
        vers=jnp.zeros((L, NPROBS), jnp.uint16),
        epoch=i32z,  # epoch 0 == vers 0 -> all entries valid at init
        out=out_init,
        iters=jnp.zeros((), _I32),
    )
    lane_ids = jnp.arange(L, dtype=_I32)

    def in_at(idx):
        return inbytes[jnp.clip(idx, 0, IN - 1)].astype(_U32)

    def step(R):
        R = dict(R)
        node0 = R["node"]
        err = R["err"]
        segbase = seg_base
        out = R["out"]

        is_prob = (node0 <= N_ALIGN) & (node0 != N_DIRECT)
        is_direct = node0 == N_DIRECT
        active_bit = is_prob | is_direct

        local = R["outp"] - segbase
        pos_state = local & ((1 << R["pb"]) - 1)
        st4 = (R["state"] << 4) + pos_state

        # ---------------- Stage A: probability index + one bit ----------
        acc = R["acc"]
        match_bit0 = (R["mbyte"] >> 7) & 1
        pidx = jnp.select(
            [
                node0 == N_ISMATCH,
                node0 == N_LIT,
                node0 == N_LITM,
                node0 == N_ISREP,
                node0 == N_ISREPG0,
                node0 == N_ISREP0LONG,
                node0 == N_ISREPG1,
                node0 == N_ISREPG2,
                node0 == N_LEN_CHOICE,
                node0 == N_LEN_CHOICE2,
            ],
            [
                L4.is_match + st4,
                R["lit_base"] + acc,
                R["lit_base"] + ((1 + match_bit0) << 8) + acc,
                L4.is_rep + R["state"],
                L4.is_rep_g0 + R["state"],
                L4.is_rep_0long + st4,
                L4.is_rep_g1 + R["state"],
                L4.is_rep_g2 + R["state"],
                R["len_base"],
                R["len_base"] + 1,
            ],
            # N_LEN_TREE, N_POSSLOT, N_SPECPOS, N_ALIGN all walk tree_base+acc
            R["tree_base"] + acc,
        )
        pidx = jnp.clip(pidx, 0, NPROBS - 1)

        raw_p = R["probs"][lane_ids, pidx].astype(_U32)
        tag = R["vers"][lane_ids, pidx].astype(_I32)
        cur_epoch = R["epoch"]
        p = jnp.where(tag == (cur_epoch & 0xFFFF), raw_p, _U32(PROB_INIT))

        bound = (R["rng"] >> 11) * p
        prob_bit = (R["cod"] >= bound).astype(_I32)
        new_p = jnp.where(
            prob_bit == 1, p - (p >> 5), p + ((_U32(0x800) - p) >> 5)
        )
        # predicated write-back (each lane owns its row: no index dups)
        wb_p = jnp.where(is_prob, new_p, raw_p).astype(jnp.uint16)
        wb_v = jnp.where(is_prob, (cur_epoch & 0xFFFF), tag).astype(jnp.uint16)
        R["probs"] = R["probs"].at[lane_ids, pidx].set(wb_p)
        R["vers"] = R["vers"].at[lane_ids, pidx].set(wb_v)

        rng_p = jnp.where(prob_bit == 1, R["rng"] - bound, bound)
        cod_p = jnp.where(prob_bit == 1, R["cod"] - bound, R["cod"])

        rng_d = R["rng"] >> 1
        dir_bit = (R["cod"] >= rng_d).astype(_I32)
        cod_d = jnp.where(dir_bit == 1, R["cod"] - rng_d, R["cod"])

        bit = jnp.where(is_prob, prob_bit, dir_bit)
        rng = jnp.where(is_prob, rng_p, jnp.where(is_direct, rng_d, R["rng"]))
        cod = jnp.where(is_prob, cod_p, jnp.where(is_direct, cod_d, R["cod"]))

        # ---------------- Stage B: renormalize --------------------------
        need = active_bit & (rng < _U32(1 << 24))
        can = R["inp"] < R["inend"]
        eof = need & ~can
        err = jnp.where(eof & (err == ERR_NONE), ERR_EOF, err)
        node = jnp.where(eof, N_ERROR, node0)
        do = need & can
        byte_in = in_at(R["inp"])
        rng = jnp.where(do, rng << 8, rng)
        cod = jnp.where(do, (cod << 8) ^ byte_in, cod)
        R["inp"] = jnp.where(do, R["inp"] + 1, R["inp"])
        R["rng"], R["cod"] = rng, cod

        ok = node != N_ERROR

        # Local mutable registers.
        outp = R["outp"]
        state = R["state"]
        rep0, rep1, rep2, rep3 = R["rep0"], R["rep1"], R["rep2"], R["rep3"]
        cnt, tmp, rev = R["cnt"], R["tmp"], R["rev"]
        length, dist, mbyte = R["length"], R["dist"], R["mbyte"]
        lit_base, tree_base, tree_size = (
            R["lit_base"], R["tree_base"], R["tree_size"],
        )
        len_base, rep_flag = R["len_base"], R["rep_flag"]

        def end_symbol(mask, node, err, outp_v, cod_v, inp_v):
            """After a completed symbol: chunk end / stream end / continue."""
            over = mask & (size_known == 1) & (outp_v > R["outend"])
            err = jnp.where(over & (err == ERR_NONE), ERR_SIZE, err)
            node = jnp.where(over, N_ERROR, node)
            chunk_done = (
                mask & ~over & (size_known == 1) & (outp_v == R["outend"])
            )
            node = jnp.where(chunk_done, N_CHUNK, node)
            fin = (
                mask & ~over & (size_known == 0)
                & (cod_v == 0) & (inp_v >= R["inend"])
            )
            node = jnp.where(fin, N_DONE, node)
            cont = mask & ~over & ~chunk_done & ~fin
            node = jnp.where(cont, N_ISMATCH, node)
            return node, err

        def start_copy(mask, node, err, new_len, new_dist, outp_v):
            """Validate distance, set len/dist, enter copy mode."""
            loc = (outp_v - segbase).astype(_U32)
            bad_dict = mask & (new_dist > dict_size)
            bad_out = mask & ~bad_dict & (new_dist > loc)
            err = jnp.where(bad_dict & (err == ERR_NONE), ERR_DIST_DICT, err)
            err = jnp.where(bad_out & (err == ERR_NONE), ERR_DIST_OUT, err)
            bad = bad_dict | bad_out
            node = jnp.where(mask & bad, N_ERROR, node)
            node = jnp.where(mask & ~bad, N_COPY, node)
            ln = jnp.where(mask & ~bad, new_len, length)
            ds = jnp.where(mask & ~bad, new_dist, dist)
            return node, err, ln, ds

        # --- N_ISMATCH ---------------------------------------------------
        m = ok & (node0 == N_ISMATCH)
        m0 = m & (bit == 0)
        prev_byte = jnp.where(
            local > 0, out[jnp.clip(outp - 1, 0, dump)].astype(_I32), 0
        )
        lit_state = ((local & ((1 << R["lp"]) - 1)) << R["lc"]) + (
            prev_byte >> (8 - R["lc"])
        )
        lit_base = jnp.where(m0, L4.lit + lit_state * 0x300, lit_base)
        acc = jnp.where(m0, 1, acc)
        matched = m0 & (state >= 7)
        mdist = rep0 + _U32(1)
        bad_md = matched & (mdist > local.astype(_U32))
        err = jnp.where(bad_md & (err == ERR_NONE), ERR_MATCHDIST, err)
        node = jnp.where(bad_md, N_ERROR, node)
        matched = matched & ~bad_md
        msrc = jnp.clip(outp - 1 - rep0.astype(_I32), 0, dump)
        mbyte = jnp.where(matched, out[msrc].astype(_I32), mbyte)
        node = jnp.where(
            m0 & ~bad_md, jnp.where(state >= 7, N_LITM, N_LIT), node
        )
        node = jnp.where(m & (bit == 1), N_ISREP, node)

        # --- N_LITM ------------------------------------------------------
        m = ok & (node0 == N_LITM)
        acc = jnp.where(m, (acc << 1) | bit, acc)
        mbyte = jnp.where(m, (mbyte << 1) & 0xFF, mbyte)
        done_litm = m & (acc >= 0x100)
        drop = m & ~done_litm & (bit != match_bit0)
        node = jnp.where(drop, N_LIT, node)

        # --- N_LIT -------------------------------------------------------
        m = ok & (node0 == N_LIT)
        acc = jnp.where(m, (acc << 1) | bit, acc)
        done_lit = (m & (acc >= 0x100)) | done_litm

        emit = (acc - 0x100).astype(jnp.uint8)
        idxw = jnp.where(done_lit, outp, dump)
        out = out.at[idxw].set(jnp.where(done_lit, emit, out[dump]))
        outp = jnp.where(done_lit, outp + 1, outp)
        state = jnp.where(
            done_lit, _LIT_NEXT[jnp.clip(state, 0, 11)], state
        )
        node, err = end_symbol(done_lit, node, err, outp, cod, R["inp"])

        # --- N_ISREP -----------------------------------------------------
        m = ok & (node0 == N_ISREP)
        m0 = m & (bit == 0)
        rep3 = jnp.where(m0, rep2, rep3)
        rep2 = jnp.where(m0, rep1, rep2)
        rep1 = jnp.where(m0, rep0, rep1)
        len_base = jnp.where(m0, L4.len_coder, len_base)
        rep_flag = jnp.where(m0, 0, rep_flag)
        node = jnp.where(m0, N_LEN_CHOICE, node)
        node = jnp.where(m & (bit == 1), N_ISREPG0, node)

        # --- N_ISREPG0 ---------------------------------------------------
        m = ok & (node0 == N_ISREPG0)
        node = jnp.where(m & (bit == 0), N_ISREP0LONG, node)
        node = jnp.where(m & (bit == 1), N_ISREPG1, node)

        # --- N_ISREP0LONG ------------------------------------------------
        m = ok & (node0 == N_ISREP0LONG)
        short = m & (bit == 0)
        state = jnp.where(short, _SHORTREP_NEXT[jnp.clip(state, 0, 11)], state)
        node, err, length, dist = start_copy(
            short, node, err, jnp.ones_like(length), rep0 + _U32(1), outp
        )
        long0 = m & (bit == 1)
        len_base = jnp.where(long0, L4.rep_len_coder, len_base)
        rep_flag = jnp.where(long0, 1, rep_flag)
        node = jnp.where(long0, N_LEN_CHOICE, node)

        # --- N_ISREPG1 ---------------------------------------------------
        m = ok & (node0 == N_ISREPG1)
        sel1 = m & (bit == 0)
        r0, r1 = rep0, rep1
        rep0 = jnp.where(sel1, r1, rep0)
        rep1 = jnp.where(sel1, r0, rep1)
        len_base = jnp.where(sel1, L4.rep_len_coder, len_base)
        rep_flag = jnp.where(sel1, 1, rep_flag)
        node = jnp.where(sel1, N_LEN_CHOICE, node)
        node = jnp.where(m & (bit == 1), N_ISREPG2, node)

        # --- N_ISREPG2 ---------------------------------------------------
        m = ok & (node0 == N_ISREPG2)
        sel2 = m & (bit == 0)
        sel3 = m & (bit == 1)
        r0, r1, r2, r3 = rep0, rep1, rep2, rep3
        rep0 = jnp.where(sel2, r2, jnp.where(sel3, r3, rep0))
        rep1 = jnp.where(sel2 | sel3, r0, rep1)
        rep2 = jnp.where(sel2 | sel3, r1, rep2)
        rep3 = jnp.where(sel3, r2, rep3)
        len_base = jnp.where(m, L4.rep_len_coder, len_base)
        rep_flag = jnp.where(m, 1, rep_flag)
        node = jnp.where(m, N_LEN_CHOICE, node)

        # --- N_LEN_CHOICE ------------------------------------------------
        m = ok & (node0 == N_LEN_CHOICE)
        low = m & (bit == 0)
        tree_base = jnp.where(
            low, len_base + LEN_LOW + pos_state * 8, tree_base
        )
        tree_size = jnp.where(low, 8, tree_size)
        cnt = jnp.where(low, 3, cnt)
        acc = jnp.where(low, 1, acc)
        tmp = jnp.where(low, 0, tmp)  # len_add
        node = jnp.where(low, N_LEN_TREE, node)
        node = jnp.where(m & (bit == 1), N_LEN_CHOICE2, node)

        # --- N_LEN_CHOICE2 -----------------------------------------------
        m = ok & (node0 == N_LEN_CHOICE2)
        mid = m & (bit == 0)
        high = m & (bit == 1)
        tree_base = jnp.where(
            mid, len_base + LEN_MID + pos_state * 8, tree_base
        )
        tree_base = jnp.where(high, len_base + LEN_HIGH, tree_base)
        tree_size = jnp.where(mid, 8, jnp.where(high, 256, tree_size))
        cnt = jnp.where(mid, 3, jnp.where(high, 8, cnt))
        acc = jnp.where(m, 1, acc)
        tmp = jnp.where(mid, 8, jnp.where(high, 16, tmp))
        node = jnp.where(m, N_LEN_TREE, node)

        # --- N_LEN_TREE --------------------------------------------------
        m = ok & (node0 == N_LEN_TREE)
        acc = jnp.where(m, (acc << 1) | bit, acc)
        cnt = jnp.where(m, cnt - 1, cnt)
        done_len = m & (cnt == 0)
        lval = tmp + acc - tree_size  # 0..271
        length = jnp.where(done_len, lval, length)
        repdone = done_len & (rep_flag == 1)
        state = jnp.where(repdone, _REP_NEXT[jnp.clip(state, 0, 11)], state)
        node, err, length, dist = start_copy(
            repdone, node, err, length + 2, rep0 + _U32(1), outp
        )
        matchdone = done_len & (rep_flag == 0)
        state = jnp.where(
            matchdone, _MATCH_NEXT[jnp.clip(state, 0, 11)], state
        )
        len_state = jnp.minimum(length, 3)
        tree_base = jnp.where(
            matchdone, L4.pos_slot + len_state * 64, tree_base
        )
        tree_size = jnp.where(matchdone, 64, tree_size)
        cnt = jnp.where(matchdone, 6, cnt)
        acc = jnp.where(matchdone, 1, acc)
        node = jnp.where(matchdone, N_POSSLOT, node)

        def finish_distance(mask, node, err, dist_field, length, dist,
                            rep0_v):
            """Completed distance decode (lzma.rs:370-390)."""
            marker = mask & (dist_field == _U32(0xFFFFFFFF))
            fin_ok = marker & (cod == 0) & (R["inp"] >= R["inend"])
            size_mm = fin_ok & (size_known == 1) & (outp != R["outend"])
            err = jnp.where(size_mm & (err == ERR_NONE), ERR_SIZE, err)
            node = jnp.where(size_mm, N_ERROR, node)
            clean = fin_ok & ~size_mm
            node = jnp.where(clean & (size_known == 1), N_CHUNK, node)
            node = jnp.where(clean & (size_known == 0), N_DONE, node)
            bad_eos = marker & ~fin_ok
            err = jnp.where(bad_eos & (err == ERR_NONE), ERR_EOS_EXTRA, err)
            node = jnp.where(bad_eos, N_ERROR, node)

            normal = mask & ~marker
            rep0_v = jnp.where(normal, dist_field, rep0_v)
            node, err, ln, ds = start_copy(
                normal, node, err, length + 2, dist_field + _U32(1), outp
            )
            return node, err, ln, ds, rep0_v

        # --- N_POSSLOT ---------------------------------------------------
        m = ok & (node0 == N_POSSLOT)
        acc = jnp.where(m, (acc << 1) | bit, acc)
        cnt = jnp.where(m, cnt - 1, cnt)
        done_ps = m & (cnt == 0)
        pos_slot = acc - 64
        small = done_ps & (pos_slot < 4)
        node, err, length, dist, rep0 = finish_distance(
            small, node, err, pos_slot.astype(_U32), length, dist, rep0
        )
        big = done_ps & (pos_slot >= 4)
        ndirect = (pos_slot >> 1) - 1
        base_dist = ((2 | (pos_slot & 1)).astype(_U32)
                     << jnp.clip(ndirect, 0, 31).astype(_U32))
        dist = jnp.where(big, base_dist, dist)
        midrange = big & (pos_slot < 14)
        tree_base = jnp.where(
            midrange,
            L4.spec_pos + (base_dist.astype(_I32) - pos_slot),
            tree_base,
        )
        cnt = jnp.where(midrange, ndirect, cnt)
        acc = jnp.where(midrange, 1, acc)
        rev = jnp.where(midrange, 0, rev)
        tmp = jnp.where(midrange, 1, tmp)
        node = jnp.where(midrange, N_SPECPOS, node)
        vast = big & (pos_slot >= 14)
        cnt = jnp.where(vast, ndirect - 4, cnt)
        acc = jnp.where(vast, 0, acc)
        node = jnp.where(vast, N_DIRECT, node)

        # --- N_SPECPOS ---------------------------------------------------
        m = ok & (node0 == N_SPECPOS)
        acc = jnp.where(m, (acc << 1) | bit, acc)
        rev = jnp.where(m, rev | (bit * tmp), rev)
        tmp = jnp.where(m, tmp << 1, tmp)
        cnt = jnp.where(m, cnt - 1, cnt)
        done_sp = m & (cnt == 0)
        node, err, length, dist, rep0 = finish_distance(
            done_sp, node, err, dist + rev.astype(_U32), length, dist, rep0
        )

        # --- N_DIRECT ----------------------------------------------------
        m = ok & (node0 == N_DIRECT)
        acc = jnp.where(m, (acc << 1) | bit, acc)
        cnt = jnp.where(m, cnt - 1, cnt)
        done_d = m & (cnt == 0)
        dist = jnp.where(done_d, dist + (acc.astype(_U32) << 4), dist)
        tree_base = jnp.where(done_d, L4.align, tree_base)
        cnt = jnp.where(done_d, 4, cnt)
        acc = jnp.where(done_d, 1, acc)
        rev = jnp.where(done_d, 0, rev)
        tmp = jnp.where(done_d, 1, tmp)
        node = jnp.where(done_d, N_ALIGN, node)

        # --- N_ALIGN -----------------------------------------------------
        m = ok & (node0 == N_ALIGN)
        acc = jnp.where(m, (acc << 1) | bit, acc)
        rev = jnp.where(m, rev | (bit * tmp), rev)
        tmp = jnp.where(m, tmp << 1, tmp)
        cnt = jnp.where(m, cnt - 1, cnt)
        done_al = m & (cnt == 0)
        node, err, length, dist, rep0 = finish_distance(
            done_al, node, err, dist + rev.astype(_U32), length, dist, rep0
        )

        # ---------------- Stage D: copy lanes move one byte --------------
        m = node0 == N_COPY
        # A match may run past the chunk's expected end; the reference
        # appends it all and reports the size mismatch afterwards
        # (lzma.rs:513-521). In the flat layout that would corrupt the next
        # lane's region, so stop at the boundary and flag the mismatch.
        over = m & (size_known == 1) & (outp >= R["outend"]) & (length > 0)
        err = jnp.where(over & (err == ERR_NONE), ERR_SIZE, err)
        node = jnp.where(over, N_ERROR, node)
        m_w = m & ~over
        src = jnp.clip(outp - dist.astype(_I32), 0, dump)
        val = out[src]
        idxw = jnp.where(m_w, outp, dump)
        out = out.at[idxw].set(jnp.where(m_w, val, out[dump]))
        outp = jnp.where(m_w, outp + 1, outp)
        length = jnp.where(m_w, length - 1, length)
        copy_done = m_w & (length == 0)
        node, err = end_symbol(copy_done, node, err, outp, cod, R["inp"])

        # ---------------- Stage E: chunk setup ---------------------------
        m = node0 == N_CHUNK
        K = in_start.shape[1]
        ci = jnp.clip(R["chunk_i"], 0, K - 1)
        have = m & (R["chunk_i"] < nchunks)
        node = jnp.where(m & ~have, N_DONE, node)

        gat = lambda a: a[lane_ids, ci]
        cin = gat(in_start)
        cend = gat(in_end)
        cout_end = gat(out_end)
        creset = gat(reset_state)
        clc = gat(lcs)
        clp = gat(lps)
        cpb = gat(pbs)

        too_short = have & (cend - cin < 5)
        err = jnp.where(too_short & (err == ERR_NONE), ERR_SHORT, err)
        node = jnp.where(too_short, N_ERROR, node)
        go = have & ~too_short

        do_reset = go & (creset == 1)
        R["epoch"] = jnp.where(do_reset, R["epoch"] + 1, R["epoch"])
        state = jnp.where(do_reset, 0, state)
        z = _U32(0)
        rep0 = jnp.where(do_reset, z, rep0)
        rep1 = jnp.where(do_reset, z, rep1)
        rep2 = jnp.where(do_reset, z, rep2)
        rep3 = jnp.where(do_reset, z, rep3)
        R["lc"] = jnp.where(go, clc, R["lc"])
        R["lp"] = jnp.where(go, clp, R["lp"])
        R["pb"] = jnp.where(go, cpb, R["pb"])

        code0 = (
            (in_at(cin + 1) << 24) | (in_at(cin + 2) << 16)
            | (in_at(cin + 3) << 8) | in_at(cin + 4)
        )
        R["rng"] = jnp.where(go, _U32(0xFFFFFFFF), R["rng"])
        cod = jnp.where(go, code0, cod)
        R["inp"] = jnp.where(go, cin + 5, R["inp"])
        R["inend"] = jnp.where(go, cend, R["inend"])
        R["outend"] = jnp.where(go, cout_end, R["outend"])
        R["chunk_i"] = jnp.where(go, R["chunk_i"] + 1, R["chunk_i"])
        node = jnp.where(go, N_ISMATCH, node)
        # Degenerate cases checked right after init: already-satisfied size
        # (raw stream with unpacked_size 0) or already-finished rc.
        insta_done = go & (size_known == 1) & (outp == cout_end)
        node = jnp.where(insta_done, N_CHUNK, node)
        insta_fin = go & (size_known == 0) & (code0 == 0) & (cin + 5 >= cend)
        node = jnp.where(insta_fin, N_DONE, node)

        R.update(
            node=node, err=err, cod=cod, outp=outp, outend=R["outend"],
            state=state, rep0=rep0, rep1=rep1, rep2=rep2, rep3=rep3,
            acc=acc, cnt=cnt, tmp=tmp, rev=rev, length=length, dist=dist,
            mbyte=mbyte, lit_base=lit_base, tree_base=tree_base,
            tree_size=tree_size, len_base=len_base, rep_flag=rep_flag,
            out=out,
        )
        R["iters"] = R["iters"] + 1
        return R

    def cond(R):
        active = jnp.any(R["node"] < N_DONE)
        if max_iters is not None:
            return active & (R["iters"] < max_iters)
        return active

    if unroll > 1:
        inner = step

        def step(R):  # noqa: F811 — unrolled body
            for _ in range(unroll):
                R = inner(R)
            return R

    final = jax.lax.while_loop(cond, step, R)
    return final["out"], final["err"], final["outp"], final["iters"]
