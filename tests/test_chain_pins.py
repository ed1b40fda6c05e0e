"""Chain firing-rate pins (VERDICT round-4 item 4).

The gen-2 kernel's control-bit chains A-D and the 8-byte copy fast path
(``ops/vmem2_decoder.py``) are always-on step-count optimizations: a
regression that silently stops one from firing passes every
bit-exactness suite and shows up only as an unexplained perf loss. These
tests decode a fixed corpus in interpret mode, read the kernel's step
count (``stats.kernel_iters`` — the iters output the runtime records),
and assert that ablating each chain (``_ABLATE`` hooks) strictly
increases the count. A dead chain then fails CI: its ablated run would
equal the baseline.

An absolute steps-per-byte ceiling pins the whole-kernel budget so a
global scheduling regression (all chains alive but firing less) is
caught too.
"""

import pytest

import lzma_rs_tpu
from lzma_rs_tpu.ops import vmem2_decoder as vd2
from lzma_rs_tpu.parallel import runtime
from lzma_rs_tpu.utils import stats as stats_mod

from conftest import read_ref

CFG = vd2.KernelConfig2(L=4, W=4096, W_IN=4096, NLIT=1, K=8, RING=512,
                        TB=2, TILE=384, MAINT=56, LIT4=1)


@pytest.fixture(scope="module", autouse=True)
def _cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    yield


def _corpus() -> bytes:
    # text (literal runs: chains A/B) + periodic pages (long aligned
    # copies: m8, copy-end chains C/D) + rep-heavy runs
    page = bytes((i * 29 + 7) & 0xFF for i in range(64))
    return (read_ref("foo.txt")[:2000] + page * 25 + b"ab" * 600)[:5000]


def _steps(ablate: str) -> int:
    """Total kernel steps decoding the fixed corpus with the given
    _ABLATE key set (retraces the interpret kernel per call)."""
    import jax

    data = _corpus()
    arch = lzma_rs_tpu.xz_compress(
        data, tpu_profile=True, block_size=4096, dist_cap=512
    )
    plans, *_ = runtime.plan_xz(arch)
    old = vd2._ABLATE
    try:
        vd2._ABLATE = frozenset(filter(None, ablate.split(",")))
        # jax.jit shares one global trace cache keyed on the underlying
        # function, so clearing the lru wrapper alone would NOT retrace
        # with the new _ABLATE set — clear jax's caches too
        runtime._jitted_vmem_decoder.cache_clear()
        jax.clear_caches()
        with stats_mod.collect() as st:
            out = runtime.execute_plan_vmem(
                arch, plans, config=CFG, interpret=True
            )
        assert out == data  # ablation must never change results
        return st.kernel_iters
    finally:
        vd2._ABLATE = old
        runtime._jitted_vmem_decoder.cache_clear()
        jax.clear_caches()


class TestChainPins:
    @pytest.fixture(scope="class")
    def baseline(self):
        return _steps("")

    def test_absolute_step_budget(self, baseline):
        # whole-kernel pin: the corpus decodes in well under 3 steps per
        # output byte with every chain alive (round-5 kernel ~2.3);
        # 3.0 fails if several chains die or scheduling regresses
        assert baseline / len(_corpus()) < 3.0, baseline

    @pytest.mark.parametrize(
        "chain",
        ["chainA", "chainB", "chainC", "chainD", "chainL", "lit4", "m8"],
    )
    def test_chain_fires(self, chain, baseline):
        ablated = _steps(chain)
        # each chain must save a measurable share of steps on this
        # corpus; equality means the chain is dead
        assert ablated > baseline * 1.002, (chain, ablated, baseline)
