"""Multi-host decode logic tests.

The block table / assignment / record reconstruction logic is exercised
single-process (the gather degenerates to identity); the true multi-process
path is validated by simulating each host's local pass and combining
buffers exactly as ``process_allgather`` + max would.
"""

import numpy as np
import pytest

import lzma_rs_tpu
from lzma_rs_tpu.parallel import multihost, runtime

from conftest import read_ref


@pytest.fixture(scope="module", autouse=True)
def _cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    yield


def test_scan_blocks_matches_decode():
    data = read_ref("foo.txt")
    c = lzma_rs_tpu.xz_compress(data, block_size=1 << 15, check_method=4)
    flags, spans, total_out = multihost.scan_blocks(c)
    assert total_out == len(data)
    assert len(spans) == (len(data) + (1 << 15) - 1) // (1 << 15)
    assert spans[0].out_base == 0
    assert spans[-1].out_base + spans[-1].out_len == len(data)


def test_assignment_balanced_and_deterministic():
    data = read_ref("foo.txt") * 2
    c = lzma_rs_tpu.xz_compress(data, block_size=1 << 14)
    _, spans, _ = multihost.scan_blocks(c)
    owner1 = multihost.assign_blocks(spans, 4)
    owner2 = multihost.assign_blocks(spans, 4)
    assert owner1 == owner2
    loads = [0] * 4
    for s, o in zip(spans, owner1):
        loads[o] += s.payload_len
    assert max(loads) <= 2 * max(1, min(loads))  # roughly balanced


def test_single_process_path():
    data = read_ref("foo.txt")
    c = lzma_rs_tpu.xz_compress(data, block_size=1 << 15, check_method=1)
    assert multihost.xz_decode_multihost(c) == data


def test_simulated_n_hosts_bitexact():
    """Simulate the 3-host protocol: per-host local buffers combined by
    elementwise max must reproduce the stream, and verification passes."""
    import lzma as liblzma

    data = read_ref("foo.txt")
    c = liblzma.compress(data, format=liblzma.FORMAT_XZ, preset=1)
    # re-wrap with small blocks via our writer for multi-block shape
    c = lzma_rs_tpu.xz_compress(data, block_size=1 << 14, check_method=4)
    flags, spans, total_out = multihost.scan_blocks(c)
    n_hosts = 3
    owner = multihost.assign_blocks(spans, n_hosts)
    assert len(set(owner)) == n_hosts  # all hosts used

    buffers = np.zeros((n_hosts, total_out), dtype=np.uint8)
    for s, own in zip(spans, owner):
        plan, _ = runtime.plan_lzma2_stream(c, s.payload_start, 0)
        out = runtime.execute_plan_native(c, [plan])
        buffers[own, s.out_base : s.out_base + s.out_len] = np.frombuffer(
            out, np.uint8
        )
    full = np.max(buffers, axis=0)
    assert bytes(full) == data
