"""Per-level compression-ratio pins (VERDICT round-2 item 7).

The reference's encoder floor is trivial (literal-only LZMA, stored-chunk
LZMA2: /root/reference/src/encode/dumbencoder.rs, encode/lzma2.rs:4-26);
the native match-finding encoder is this framework's superset track, so
its ratio is pinned against liblzma presets on a fixed corpus — any
>1% regression vs the recorded baseline fails.

Pins record ours/liblzma compressed-size ratios measured on this corpus
(see git history for the trajectory). Lower is better; the pin is the
measured value + ~1% headroom.
"""

import lzma as liblzma

import pytest

import lzma_rs_tpu

from conftest import read_ref

# (file, level) -> max allowed ours/liblzma size ratio.
# Baseline r4 after kOptWin 128->512 + un-clamped overshoot nodes with
# average-rate credit + denser length pricing + run shortcut at the
# match-length cap:
#   foo.txt {1: 0.995, 4: 0.9955, 6: 1.0048, 9: 1.0048},
#   range-coder-edge-case {1: 1.032, 4: 0.9941, 6: 0.99969, 9: 1.00003}
# — binary BEATS liblzma at 4 and 6; level 9's deeper candidate lists
# cost 20 bytes (+0.003%) on this file via adaptive-price drift in the
# DP (depth 128 and kOptWin 1024 were tried and do not recover it);
# text is within 0.5% at 6/9 and beats liblzma at 1/4.
# (r3: foo 6 was 1.020; bt4+DP era: 1.028; hash-chain era: 1.065.)
RATIO_PINS = {
    # round-5 (dense rep/match length relaxation): foo L6/L9 1.0041,
    # L1/L4 beat liblzma; pins sit just above the measured values
    ("foo.txt", 1): 0.996,
    ("foo.txt", 4): 0.996,
    ("foo.txt", 6): 1.0045,
    ("foo.txt", 9): 1.0045,
    ("range-coder-edge-case", 1): 1.033,
    ("range-coder-edge-case", 4): 0.995,
    ("range-coder-edge-case", 6): 1.000,
    ("range-coder-edge-case", 9): 1.0005,
}


@pytest.mark.parametrize("name,level", sorted(RATIO_PINS))
def test_ratio_pinned_vs_liblzma(name, level):
    data = read_ref(name)
    ours = lzma_rs_tpu.xz_compress(data, level=level)
    theirs = liblzma.compress(data, preset=level)
    ratio = len(ours) / len(theirs)
    assert ratio <= RATIO_PINS[(name, level)], (
        f"{name} level {level}: ours {len(ours)} vs liblzma {len(theirs)} "
        f"-> ratio {ratio:.4f} exceeds pin {RATIO_PINS[(name, level)]}"
    )
    # the archive must remain decodable by liblzma (interop oracle)
    assert liblzma.decompress(ours) == data


def test_levels_monotone_on_text():
    """Higher levels never compress worse on the text corpus."""
    data = read_ref("foo.txt")
    sizes = [
        len(lzma_rs_tpu.xz_compress(data, level=lvl)) for lvl in (1, 6, 9)
    ]
    assert sizes[0] >= sizes[1] >= sizes[2], sizes


def test_parse_mode_override_greedy(monkeypatch):
    """LZMA_RS_TPU_PARSE_MODE=1 keeps the price-density greedy reachable
    (no preset maps to it since the DP took levels 4-9); its output must
    round-trip and stay liblzma-decodable."""
    monkeypatch.setenv("LZMA_RS_TPU_PARSE_MODE", "1")
    data = read_ref("foo.txt")
    ours = lzma_rs_tpu.xz_compress(data, level=6)
    assert liblzma.decompress(ours) == data
    assert len(ours) < len(data) // 2
