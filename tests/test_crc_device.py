"""On-device CRC kernels vs host implementations (zlib / slice-by-8)."""

import random
import zlib

import pytest

from lzma_rs_tpu.ops import crc_device
from lzma_rs_tpu.utils.crc import crc64


@pytest.fixture(scope="module", autouse=True)
def _cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    yield


LENGTHS = [
    0, 1, 7, 100,
    crc_device.CHUNK - 1, crc_device.CHUNK, crc_device.CHUNK + 1,
    3 * crc_device.CHUNK + 17,          # non-pow2 chunks + tail
    8 * crc_device.CHUNK,               # exact pow2
    13 * crc_device.CHUNK + 1234,       # multiple device batches
]


def make_data(n, seed=0):
    rng = random.Random(seed)
    block = bytes(rng.randrange(256) for _ in range(min(n, 65536) or 1))
    out = (block * (n // len(block) + 1))[:n]
    return out


@pytest.mark.parametrize("n", LENGTHS)
def test_crc32_device(n):
    data = make_data(n, seed=n)
    assert crc_device.crc32_device(data) == (zlib.crc32(data) & 0xFFFFFFFF)


@pytest.mark.parametrize("n", LENGTHS)
def test_crc64_device(n):
    data = make_data(n, seed=n + 1)
    assert crc_device.crc64_device(data) == crc64(data)


def test_combine_raw_identity():
    a = make_data(crc_device.CHUNK, 7)
    b = make_data(crc_device.CHUNK, 8)
    # raw register via zlib convention
    raw = lambda d, init=0: (
        zlib.crc32(d, (~init) & 0xFFFFFFFF) ^ 0xFFFFFFFF
    )
    combined = crc_device.combine_raw(
        crc_device.CRC32_POLY, 32, raw(a), raw(b), len(b)
    )
    assert combined == raw(a + b)
