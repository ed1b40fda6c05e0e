"""Mutation-based differential fuzzing (reference fuzz tier,
/root/reference/fuzz/fuzz_targets/compare_xz.rs and fuzz/README.md:3-8).

Coverage-guided libFuzzer is out of scope in this environment; this tier
replaces it with *mutation* of valid archives — bit/byte flips,
truncations, insertions, deletions of every corpus archive plus this
framework's own encoder output — cross-checked between engines:

- `.xz`: our decoder vs liblzma — both-fail or both-succeed-equal
  (the reference's compare_xz contract).
- LZMA2 / raw LZMA: native engine vs the executable spec — identical
  success/output, identical failure classification.

Found-divergence ledger: docs/FUZZ_LEDGER.md. Deterministic seeds; the
slow tier runs thousands of cases, the default tier a smoke subset.
"""

import lzma as liblzma
import random

import pytest

import lzma_rs_tpu
from lzma_rs_tpu.models.codecs import Lzma2Decoder, xz_decode_stream
from lzma_rs_tpu.native import loader
from lzma_rs_tpu.utils.cursor import ByteCursor
from lzma_rs_tpu.utils.errors import LzmaRsError as Error

from conftest import read_ref

# Divergences vs liblzma that are understood and accepted (ledger):
# - none currently.
ALLOWED_XZ_DIVERGENCES = ()


def _mutations(rng: random.Random, data: bytes, n: int):
    """Yield n mutated variants of data (deterministic)."""
    for _ in range(n):
        kind = rng.randrange(5)
        b = bytearray(data)
        if not b:
            yield bytes(b)
            continue
        pos = rng.randrange(len(b))
        if kind == 0:  # bit flip
            b[pos] ^= 1 << rng.randrange(8)
        elif kind == 1:  # byte set
            b[pos] = rng.randrange(256)
        elif kind == 2:  # truncate
            del b[pos:]
        elif kind == 3:  # insert
            b[pos:pos] = bytes([rng.randrange(256)])
        else:  # delete
            del b[pos]
        yield bytes(b)


def _ours_xz(data: bytes):
    try:
        return (True, lzma_rs_tpu.xz_decompress(data))
    except Error as e:
        return (False, type(e).__name__)
    except OverflowError:
        # 64-bit varint fields can exceed host sizes; classified failure
        return (False, "OverflowError")


def _liblzma_xz(data: bytes):
    try:
        out = liblzma.decompress(data, format=liblzma.FORMAT_XZ)
        return (True, out)
    except Exception as e:
        return (False, type(e).__name__)


def _xz_agree(case: bytes) -> str:
    """Returns '' when engines agree, else a description."""
    ok_a, a = _ours_xz(case)
    ok_b, b = _liblzma_xz(case)
    if ok_a and ok_b:
        if a != b:
            return f"output mismatch: ours {len(a)}B vs liblzma {len(b)}B"
        return ""
    if ok_a and not ok_b:
        # Known reference divergence (ledger entry 2026-08-20): lzma-rs
        # terminates a known-size LZMA chunk the moment the output is
        # complete and never validates the trailing compressed bytes
        # (they sit prefetched in the range coder's `code` register,
        # /root/reference/src/decode/lzma.rs:442-455); liblzma validates
        # them. Accepting such inputs is reference parity — allowed iff
        # the reference-parity spec decoder also accepts AND produces
        # the same bytes.
        try:
            spec_out = xz_decode_stream(ByteCursor(case))
        except (Error, OverflowError):
            return f"we accepted ({len(a)}B out), liblzma AND spec rejected"
        if spec_out != a:
            return "dispatch/spec output mismatch on liblzma-rejected case"
        return ""
    # ok_b and not ok_a: liblzma is more lenient in known ways (e.g. it
    # streams concatenated archives); we match the REFERENCE, which is
    # stricter. Cross-check against the reference-parity spec decoder:
    # if the spec decoder also rejects, we're consistent.
    if ok_b and not ok_a:
        try:
            xz_decode_stream(ByteCursor(case))
            return f"spec accepted but dispatch path rejected ({a})"
        except Error:
            return ""  # consistently strict (reference semantics)
        except OverflowError:
            return ""
    return ""


def _xz_seed_cases():
    seeds = [
        read_ref("foo.txt.xz"),
        read_ref("good-1-lzma2-1.xz"),
        read_ref("good-1-lzma2-4.xz"),
        read_ref("block-check-crc32.txt.xz"),
        lzma_rs_tpu.xz_compress(read_ref("foo.txt")[:20000], check_method=4),
        lzma_rs_tpu.xz_compress(
            read_ref("foo.txt")[:20000], tpu_profile=True, check_method=1
        ),
        lzma_rs_tpu.xz_compress(read_ref("small.txt") * 20, level=0),
    ]
    return seeds


def _run_xz_mutations(cases_per_seed: int):
    rng = random.Random(0xF00D)
    failures = []
    for si, seed in enumerate(_xz_seed_cases()):
        for case in _mutations(rng, seed, cases_per_seed):
            why = _xz_agree(case)
            if why and why not in ALLOWED_XZ_DIVERGENCES:
                failures.append(f"seed {si}: {why}")
                if len(failures) > 5:
                    return failures
    return failures


def _native_vs_spec_lzma2(case: bytes) -> str:
    lib = loader.load()
    if lib is None:
        pytest.skip("native library unavailable")
    try:
        a = (True, lib.lzma2_decode(case))
    except Exception as e:
        a = (False, str(e))
    try:
        b = (True, Lzma2Decoder().decompress(ByteCursor(case)))
    except Error as e:
        b = (False, str(e))
    if a[0] != b[0]:
        return f"native ok={a[0]} spec ok={b[0]} ({a[1]!r:.60} vs {b[1]!r:.60})"
    if a[0] and a[1] != b[1]:
        return "native/spec output mismatch"
    if not a[0] and a[1] != b[1]:
        return f"error-string mismatch: {a[1]!r} vs {b[1]!r}"
    return ""


def _run_lzma2_mutations(cases_per_seed: int):
    rng = random.Random(0xBEEF)
    text = read_ref("foo.txt")[:8000]
    seeds = [
        lzma_rs_tpu.lzma2_compress(text, level=6),
        lzma_rs_tpu.lzma2_compress(text, level=0),
        lzma_rs_tpu.lzma2_compress(text, level=6, dist_cap=512,
                                   props=0 + 9 * (0 + 5 * 2)),
    ]
    failures = []
    for si, seed in enumerate(seeds):
        for case in _mutations(rng, seed, cases_per_seed):
            why = _native_vs_spec_lzma2(case)
            if why:
                failures.append(f"seed {si}: {why}")
                if len(failures) > 5:
                    return failures
    return failures


class TestMutationSmoke:
    def test_xz_differential(self):
        failures = _run_xz_mutations(cases_per_seed=30)
        assert not failures, failures

    def test_lzma2_native_vs_spec(self):
        failures = _run_lzma2_mutations(cases_per_seed=12)
        assert not failures, failures


@pytest.mark.slow
class TestMutationDeep:
    def test_xz_differential_deep(self):
        failures = _run_xz_mutations(cases_per_seed=400)
        assert not failures, failures

    def test_lzma2_native_vs_spec_deep(self):
        failures = _run_lzma2_mutations(cases_per_seed=150)
        assert not failures, failures
