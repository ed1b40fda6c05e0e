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


def test_wave_schedule_deterministic_and_shape_consistent():
    """plan_waves is a pure function of the shared block table: identical
    on every host (collectives must run in the same order with the same
    shapes), multiple waves when owned bytes exceed the wave budget, and
    each host's waves partition its owned blocks in stream order."""
    data = read_ref("foo.txt") * 3
    c = lzma_rs_tpu.xz_compress(data, block_size=1 << 14, check_method=1)
    _, spans, total_out = multihost.scan_blocks(c)
    n_hosts = 3
    owner = multihost.assign_blocks(spans, n_hosts)
    wave_bytes = 64 << 10
    hw1, ws1 = multihost.plan_waves(spans, owner, n_hosts, wave_bytes)
    hw2, ws2 = multihost.plan_waves(spans, owner, n_hosts, wave_bytes)
    assert hw1 == hw2 and ws1 == ws2
    assert len(ws1) > 1
    for h in range(n_hosts):
        assert len(hw1[h]) == len(ws1)
        for w, group in enumerate(hw1[h]):
            assert sum(s.out_len for s in group) <= ws1[w]
        flat = [s for grp in hw1[h] for s in grp]
        assert flat == [s for s, o in zip(spans, owner) if o == h]


def test_wave_stitch_bitexact_uneven_hosts():
    """3 hosts, deliberately uneven ownership, >1 wave: synthetic
    per-wave gathers (each host's dense decode buffer, zero-padded to the
    wave size exactly as process_allgather would carry them) stitch
    bit-exact through the production stitch_waves."""
    data = read_ref("foo.txt") * 3
    c = lzma_rs_tpu.xz_compress(data, block_size=1 << 14, check_method=1)
    _, spans, total_out = multihost.scan_blocks(c)
    n_hosts = 3
    # host 0 owns twice the blocks of hosts 1 and 2
    owner = [0 if i % 4 < 2 else (1 + i % 2) for i in range(len(spans))]
    hw, ws = multihost.plan_waves(spans, owner, n_hosts, wave_bytes=48 << 10)
    assert len(ws) > 1
    gathered_waves = []
    for w, size in enumerate(ws):
        g = np.zeros((n_hosts, size), np.uint8)
        for h in range(n_hosts):
            off = 0
            for s in hw[h][w]:
                plan, _ = runtime.plan_lzma2_stream(c, s.payload_start, 0)
                out = runtime.execute_plan_native(c, [plan])
                g[h, off : off + s.out_len] = np.frombuffer(out, np.uint8)
                off += s.out_len
        gathered_waves.append(g)
    full = multihost.stitch_waves(hw, gathered_waves, n_hosts, total_out)
    assert bytes(full) == data
