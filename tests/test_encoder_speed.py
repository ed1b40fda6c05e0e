"""Encoder throughput floor (VERDICT round-4 item 6).

The optimal-parse DP's speed is pinned like its ratio (RATIO_PINS): the
round-4 regression (1.8-2.4 -> 1.2-1.6 MB/s) would have failed a floor
like this. Round-5 measured 2.6-2.8 MB/s at levels 4-9 on this 2-core
box (O(leaves) WinPrices build + bt4 tree prefetch); the floor is set
at 1.5 MB/s — generous against noisy-neighbor swings, tight enough to
catch any 2x-class regression.
"""

import time

import pytest

from lzma_rs_tpu.native import loader


def _corpus(n: int) -> bytes:
    # deterministic text-like corpus: this package's own sources (the
    # bench corpus shape — NOT tiled, so the long-rep shortcut cannot
    # bypass the DP)
    import os

    import lzma_rs_tpu

    root = os.path.dirname(os.path.abspath(lzma_rs_tpu.__file__))
    parts = []
    for r, _, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.endswith((".py", ".cpp")):
                parts.append(open(os.path.join(r, f), "rb").read())
    seed = b"\n".join(parts)
    # extend by reshuffling 4 KiB chunks in a seeded order: no long-range
    # periodicity (tiling would let the long-rep shortcut bypass the DP)
    import random

    rng = random.Random(5)
    chunks = [seed[i : i + 4096] for i in range(0, len(seed), 4096)]
    out = [seed]
    total = len(seed)
    while total < n:
        c = chunks[rng.randrange(len(chunks))]
        out.append(c)
        total += len(c)
    return b"".join(out)[:n]


@pytest.mark.slow
class TestEncoderThroughput:
    def test_l6_throughput_floor(self):
        lib = loader.load()
        if lib is None:
            pytest.skip("native engine unavailable")
        data = _corpus(2_000_000)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = lib.lzma2_compress(data, 6)
            best = min(best, time.perf_counter() - t0)
        mbs = len(data) / 1e6 / best
        assert mbs >= 1.5, f"encoder L6 regressed to {mbs:.2f} MB/s"
        # sanity: the stream must still round-trip
        import lzma_rs_tpu

        assert lzma_rs_tpu.lzma2_decompress(bytes(out)) == data
