"""Entropy-coder round-trip property tests.

Template from the reference's inline tests (src/encode/rangecoder.rs:284-435):
encode a symbol sequence, decode it back, require exact equality — for raw
bits, forward/reverse bit-trees across tree sizes, and the length coder for
all 16 pos_states over all 272 length values.
"""

import numpy as np
import pytest

from lzma_rs_tpu.encode.rangecoder import RangeEncoder, fresh_probs
from lzma_rs_tpu.models.spec import RangeDecoder
from lzma_rs_tpu.models.state import LEN_CODER_SIZE


def encode_decode_bits(prob_init, bits):
    enc = RangeEncoder()
    probs = np.array([prob_init], dtype=np.uint16)
    for b in bits:
        enc.encode_bit(probs, 0, b)
    buf = enc.finish()

    dec = RangeDecoder.new(buf)
    probs = np.array([prob_init], dtype=np.uint16)
    for b in bits:
        assert dec.decode_bit(probs, 0, True) == int(b)
    assert dec.is_finished_ok()


def test_encode_decode_zeros():
    encode_decode_bits(0x400, [False] * 10000)


def test_encode_decode_ones():
    encode_decode_bits(0x400, [True] * 10000)


def test_encode_decode_mixed():
    rng = np.random.RandomState(42)
    encode_decode_bits(0x400, list(rng.rand(5000) < 0.3))


@pytest.mark.parametrize("num_bits", list(range(0, 16)))
def test_bittree_all_values(num_bits):
    size = 1 << num_bits
    values = list(range(size))

    enc = RangeEncoder()
    probs = fresh_probs(size)
    for v in values:
        enc.encode_bit_tree(num_bits, probs, 0, v)
    buf = enc.finish()

    dec = RangeDecoder.new(buf)
    probs = fresh_probs(size)
    for v in values:
        assert dec.parse_bit_tree(num_bits, probs, 0, True) == v
    assert dec.is_finished_ok()


@pytest.mark.parametrize("num_bits", list(range(0, 16)))
def test_reverse_bittree_all_values(num_bits):
    size = 1 << num_bits
    values = list(range(size))

    enc = RangeEncoder()
    probs = fresh_probs(size)
    for v in values:
        enc.encode_reverse_bit_tree(num_bits, probs, 0, 0, v)
    buf = enc.finish()

    dec = RangeDecoder.new(buf)
    probs = fresh_probs(size)
    for v in values:
        assert dec.parse_reverse_bit_tree(num_bits, probs, 0, 0, True) == v
    assert dec.is_finished_ok()


@pytest.mark.parametrize("pos_state", list(range(16)))
def test_length_coder_all_values(pos_state):
    from lzma_rs_tpu.models.state import LEN_CHOICE, LEN_CHOICE2, LEN_HIGH, LEN_LOW, LEN_MID

    values = list(range((1 << 8) + 16))

    enc = RangeEncoder()
    probs = fresh_probs(LEN_CODER_SIZE)
    for v in values:
        enc.encode_len(probs, 0, pos_state, v)
    buf = enc.finish()

    dec = RangeDecoder.new(buf)
    probs = fresh_probs(LEN_CODER_SIZE)
    for v in values:
        if not dec.decode_bit(probs, LEN_CHOICE, True):
            got = dec.parse_bit_tree(3, probs, LEN_LOW + pos_state * 8, True)
        elif not dec.decode_bit(probs, LEN_CHOICE2, True):
            got = 8 + dec.parse_bit_tree(3, probs, LEN_MID + pos_state * 8, True)
        else:
            got = 16 + dec.parse_bit_tree(8, probs, LEN_HIGH, True)
        assert got == v
    assert dec.is_finished_ok()
