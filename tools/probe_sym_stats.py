#!/usr/bin/env python3
"""Symbol statistics for kernel step-model decisions (round 4).

Replays the executable-spec decoder over a corpus sample and tallies,
per symbol class, the bit counts the VMEM kernel turns into steps.
Then evaluates candidate step models:

  cur    TB=2 with full LITM 2-bit continuation (3 prob selects/step)
  litm1  TB=2, LITM and SPECPOS decode 1 bit/step (2 prob selects/step)
  litmP  TB=2, LITM keeps 2 bits/step via an extra LIT-region-only
         select; SPECPOS 1 bit/step (2 selects + 0.5-cost select)

Outputs modeled steps/output-byte and relative step-time using the
probe_round4 pass costs. Usage: python tools/probe_sym_stats.py [MB]
"""

import math
import sys

sys.path.insert(0, "/root/repo")

import lzma_rs_tpu
from lzma_rs_tpu.models import spec


class Tally:
    def __init__(self):
        self.n_lit_plain = 0        # literals decoded with state < 7
        self.n_lit_matched = 0      # literals via matched path
        self.matched_bits = 0       # bits consumed while in N_LITM
        self.plain_bits_after = 0   # plain bits after LITM drop
        self.n_match = 0
        self.n_rep = 0
        self.n_shortrep = 0
        self.control_bits = 0
        self.len_bits = 0           # len tree bits (counted nodes)
        self.pos_tree_bits = 0      # pos_slot tree bits
        self.spec_bits = 0          # spec_pos reverse-tree bits
        self.align_bits = 0
        self.direct_bits = 0
        self.copy_bytes = 0
        self.out_bytes = 0


TALLY = Tally()


class TracingState(spec.DecoderState):
    def _decode_literal(self, output, rc, update):
        t = TALLY
        L = self.layout
        prev_byte = output.last_or(0)
        result = 1
        lit_state = (
            (output.len & ((1 << self.props.lp) - 1)) << self.props.lc
        ) + (prev_byte >> (8 - self.props.lc))
        base = L.lit + lit_state * 0x300
        matched = self.state >= 7
        mbits = 0
        if matched:
            match_byte = output.last_n(self.rep[0] + 1)
            while result < 0x100:
                match_bit = (match_byte >> 7) & 1
                match_byte = (match_byte << 1) & 0xFF
                bit = rc.decode_bit(
                    self.probs, base + ((1 + match_bit) << 8) + result,
                    update,
                )
                result = (result << 1) ^ bit
                mbits += 1
                if match_bit != bit:
                    break
        nplain = 0
        while result < 0x100:
            result = (result << 1) ^ rc.decode_bit(
                self.probs, base + result, update
            )
            nplain += 1
        if matched:
            t.n_lit_matched += 1
            t.matched_bits += mbits
            t.plain_bits_after += nplain
        else:
            t.n_lit_plain += 1
        t.out_bytes += 1
        return result - 0x100

    def _decode_len(self, rc, pos_state, update, rep):
        t = TALLY
        L = self.layout
        base = L.rep_len_coder if rep else L.len_coder
        if not rc.decode_bit(self.probs, base + spec.LEN_CHOICE, update):
            t.control_bits += 1
            t.len_bits += 3
            return rc.parse_bit_tree(
                3, self.probs, base + spec.LEN_LOW + pos_state * 8, update
            )
        elif not rc.decode_bit(self.probs, base + spec.LEN_CHOICE2, update):
            t.control_bits += 2
            t.len_bits += 3
            return 8 + rc.parse_bit_tree(
                3, self.probs, base + spec.LEN_MID + pos_state * 8, update
            )
        else:
            t.control_bits += 2
            t.len_bits += 8
            return 16 + rc.parse_bit_tree(
                8, self.probs, base + spec.LEN_HIGH, update
            )

    def _decode_distance(self, rc, length, update):
        t = TALLY
        L = self.layout
        len_state = min(length, 3)
        pos_slot = rc.parse_bit_tree(
            6, self.probs, L.pos_slot + len_state * 64, update
        )
        t.pos_tree_bits += 6
        if pos_slot < 4:
            return pos_slot
        num_direct_bits = (pos_slot >> 1) - 1
        result = (2 | (pos_slot & 1)) << num_direct_bits
        if pos_slot < 14:
            t.spec_bits += num_direct_bits
            result += rc.parse_reverse_bit_tree(
                num_direct_bits, self.probs, L.spec_pos,
                result - pos_slot, update,
            )
        else:
            t.direct_bits += num_direct_bits - 4
            t.align_bits += 4
            result += rc.get(num_direct_bits - 4) << 4
            result += rc.parse_reverse_bit_tree(
                4, self.probs, L.align, 0, update
            )
        return result

    def process_next_inner(self, output, rc, update):
        t = TALLY
        L = self.layout
        pos_state = output.len & ((1 << self.props.pb) - 1)
        if not rc.decode_bit(
            self.probs, L.is_match + (self.state << 4) + pos_state, update
        ):
            byte = self._decode_literal(output, rc, update)
            output.append_literal(byte)
            self.state = int(spec.state_mod.STATE_AFTER_LIT[self.state])
            return spec.CONTINUE
        t.control_bits += 1  # is_match=1 (literal path counted in steps())
        if rc.decode_bit(self.probs, L.is_rep + self.state, update):
            t.control_bits += 1
            if not rc.decode_bit(
                self.probs, L.is_rep_g0 + self.state, update
            ):
                t.control_bits += 1
                if not rc.decode_bit(
                    self.probs,
                    L.is_rep_0long + (self.state << 4) + pos_state, update,
                ):
                    t.control_bits += 1
                    t.n_shortrep += 1
                    t.copy_bytes += 1
                    t.out_bytes += 1
                    self.state = int(
                        spec.state_mod.STATE_AFTER_SHORTREP[self.state])
                    output.append_lz(1, self.rep[0] + 1)
                    return spec.CONTINUE
                t.control_bits += 1
            else:
                t.control_bits += 1
                if not rc.decode_bit(
                    self.probs, L.is_rep_g1 + self.state, update
                ):
                    t.control_bits += 1
                    idx = 1
                elif not rc.decode_bit(
                    self.probs, L.is_rep_g2 + self.state, update
                ):
                    t.control_bits += 2
                    idx = 2
                else:
                    t.control_bits += 2
                    idx = 3
                dist = self.rep[idx]
                for i in range(idx - 1, -1, -1):
                    self.rep[i + 1] = self.rep[i]
                self.rep[0] = dist
            t.n_rep += 1
            length = self._decode_len(rc, pos_state, update, rep=True)
            self.state = int(spec.state_mod.STATE_AFTER_REP[self.state])
        else:
            t.control_bits += 1
            t.n_match += 1
            self.rep[3] = self.rep[2]
            self.rep[2] = self.rep[1]
            self.rep[1] = self.rep[0]
            length = self._decode_len(rc, pos_state, update, rep=False)
            self.state = int(spec.state_mod.STATE_AFTER_MATCH[self.state])
            rep_0 = self._decode_distance(rc, length, update)
            self.rep[0] = rep_0
            if rep_0 == 0xFFFFFFFF:
                if rc.is_finished_ok():
                    return spec.FINISHED
                raise spec.LzmaError(
                    "Found end-of-stream marker but more bytes are "
                    "available"
                )
        length += 2
        t.copy_bytes += length
        t.out_bytes += length
        output.append_lz(length, self.rep[0] + 1)
        return spec.CONTINUE


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    seed = open("/root/reference/tests/files/foo.txt", "rb").read()
    data = (seed * (int(mb * 1e6) // len(seed) + 1))[: int(mb * 1e6)]
    archive = lzma_rs_tpu.xz_compress(
        data, block_size=8192, tpu_profile=True
    )

    import lzma_rs_tpu.models.codecs as codecs
    from lzma_rs_tpu.utils.cursor import ByteCursor

    saved = codecs.DecoderState
    codecs.DecoderState = TracingState
    try:
        out = codecs.xz_decode_stream(ByteCursor(archive))
        assert out == data
    finally:
        codecs.DecoderState = saved

    t = TALLY
    n_sym_lit = t.n_lit_plain + t.n_lit_matched
    n_copyish = t.n_match + t.n_rep + t.n_shortrep
    print(f"out_bytes={t.out_bytes} lit_plain={t.n_lit_plain} "
          f"lit_matched={t.n_lit_matched} matched_bits={t.matched_bits} "
          f"plain_after={t.plain_bits_after}")
    print(f"n_match={t.n_match} n_rep={t.n_rep} "
          f"n_shortrep={t.n_shortrep}")
    print(f"len_bits={t.len_bits} pos_tree={t.pos_tree_bits} "
          f"spec={t.spec_bits} align={t.align_bits} "
          f"direct={t.direct_bits} control={t.control_bits} "
          f"copy_bytes={t.copy_bytes}")

    def steps(model):
        s = 0
        s += n_sym_lit  # ismatch step for literals
        if model == "cur":
            s += t.n_lit_plain * math.ceil(8 / 2)
            s += t.n_lit_matched * math.ceil(8 / 2)
            spec_steps = math.ceil(t.spec_bits / 2)
        elif model == "litm1":
            s += t.n_lit_plain * math.ceil(8 / 2)
            s += t.matched_bits + (t.plain_bits_after + 1) // 2
            spec_steps = t.spec_bits
        elif model == "litmP":
            s += t.n_lit_plain * math.ceil(8 / 2)
            s += t.n_lit_matched * math.ceil(8 / 2)
            spec_steps = t.spec_bits
        s += math.ceil(t.len_bits / 2) + math.ceil(t.pos_tree_bits / 2)
        s += spec_steps
        s += math.ceil(t.align_bits / 2) + math.ceil(t.direct_bits / 2)
        s += t.control_bits
        s += math.ceil(t.copy_bytes / 4) + n_copyish
        return s

    # pass costs (us) from probe_round4 at L=2048: first select ~1.5,
    # marginal ~1.1, blend ~0.4; non-prob remainder ~2.5 measured
    costs = {
        "cur":   0.4 + 1.5 + 1.1 + 1.1,
        "litm1": 0.4 + 1.5 + 1.1,
        "litmP": 0.4 + 1.5 + 1.1 + 0.55,
    }
    base = None
    for model in ("cur", "litm1", "litmP"):
        st = steps(model)
        tm = st * (costs[model] + 2.5)
        if base is None:
            base = tm
        print(f"{model:6s} steps/byte={st / t.out_bytes:.3f} "
              f"stepcost={costs[model] + 2.5:.2f}us "
              f"rel_time={tm / base:.3f}")


if __name__ == "__main__":
    main()
