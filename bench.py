#!/usr/bin/env python3
"""Benchmark: end-to-end `.xz` decode throughput of the framework.

Prints ONE JSON line:
  {"metric": "xz_decode_throughput", "value": <MB/s>, "unit": "MB/s",
   "vs_baseline": <ratio>}

Protocol (BASELINE.md): the reference (lzma-rs, Rust) publishes no numbers
and no Rust toolchain exists in this image, so the measured stand-in
baseline is single-threaded liblzma (`xz -dc -T1`) on the same corpus —
a strictly harder target than lzma-rs (which is slower than liblzma).

Corpus: ~60 MB of Python sources from this image (deterministic order),
compressed with `xz -6 --block-size=4MiB` so the archive has independent
blocks — the format's parallel axis. Bit-exactness is asserted before
timing. Details go to stderr; stdout carries only the JSON line.
"""

import glob
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
BENCH_DIR = os.path.join(HERE, ".bench")
CORPUS = os.path.join(BENCH_DIR, "corpus.bin")
CORPUS_XZ = os.path.join(BENCH_DIR, "corpus.xz")
TARGET_MB = int(os.environ.get("LZMA_RS_TPU_BENCH_MB", "60"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_corpus() -> None:
    os.makedirs(BENCH_DIR, exist_ok=True)
    if os.path.exists(CORPUS) and os.path.exists(CORPUS_XZ):
        return
    bufs, tot = [], 0
    for pat in ("/usr/lib/python3*/**/*.py", "/opt/venv/lib/**/*.py"):
        for p in sorted(glob.glob(pat, recursive=True)):
            try:
                b = open(p, "rb").read()
            except OSError:
                continue
            bufs.append(b)
            tot += len(b)
            if tot > TARGET_MB * 1e6:
                break
        if tot > TARGET_MB * 1e6:
            break
    data = b"".join(bufs)
    if len(data) < 8e6:
        # fallback corpus if this image lacks python sources: tile the
        # reference test corpus to scale
        seed = open(
            "/root/reference/tests/files/range-coder-edge-case", "rb"
        ).read()
        data = (seed * (int(TARGET_MB * 1e6) // len(seed) + 1))[
            : int(TARGET_MB * 1e6)
        ]
    with open(CORPUS, "wb") as f:
        f.write(data)
    subprocess.run(
        ["xz", "-6", "-T0", "--block-size=1048576", "-k", "-f", CORPUS],
        check=True,
    )
    os.replace(CORPUS + ".xz", CORPUS_XZ)
    log(f"corpus: {len(data) / 1e6:.1f} MB -> {os.path.getsize(CORPUS_XZ) / 1e6:.1f} MB xz")


def time_best(fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


CORPUS_TPU_XZ = os.path.join(BENCH_DIR, "corpus_tpu.xz")
TPU_MB = int(os.environ.get("LZMA_RS_TPU_BENCH_TPU_MB", "16"))


def bench_tpu(expected: bytes) -> dict:
    """The TPU lane (VERDICT r2 item 2): encode a tpu_profile slice of the
    corpus, decode it on the real chip via the VMEM kernel, and report
    BOTH end-to-end MB/s (includes H2D/D2H — transfer-bound on the axon
    tunnel, docs/DESIGN.md) and chained device-resident MB/s/chip (the
    kernel's own speed, the GB/s/chip north-star metric's numerator)."""
    import lzma_rs_tpu
    from lzma_rs_tpu.parallel import devbench, runtime
    from lzma_rs_tpu.utils import stats as stats_mod

    data = expected[: TPU_MB * 1_000_000]
    if os.path.exists(CORPUS_TPU_XZ):
        cx = open(CORPUS_TPU_XZ, "rb").read()
    else:
        cx = lzma_rs_tpu.xz_compress(data, tpu_profile=True, check_method=1)
        with open(CORPUS_TPU_XZ, "wb") as f:
            f.write(cx)
    log(f"tpu corpus: {len(data) / 1e6:.1f} MB -> {len(cx) / 1e6:.1f} MB "
        f"(tpu_profile)")

    # correctness + fallback gate, then end-to-end timing
    with stats_mod.collect() as st:
        out = runtime.xz_decode(cx, engine="tpu-vmem")
    assert out == data, "TPU decode not bit-exact — refusing to benchmark"
    if st.fallbacks:
        log(f"tpu lane fell back ({st.fallbacks}); reporting nulls")
        return {}
    e2e = time_best(lambda: runtime.xz_decode(cx, engine="tpu-vmem"), reps=2)
    e2e_mbs = len(data) / 1e6 / e2e
    log(f"tpu e2e (engine=tpu-vmem, incl. transfers): {e2e_mbs:.1f} MB/s "
        f"({e2e:.2f}s)")

    dev = devbench.device_throughput(cx, verify=data)
    log(f"tpu device-resident (chained): {dev['mb_s']:.1f} MB/s/chip  "
        f"{dev['us_per_step']:.2f} us/step  L={dev['lanes']}")

    # measured link bandwidth for the auto-router calibration: one 8 MB
    # round trip (H2D + D2H), best of 3 — the axon tunnel swings 2x
    # day-to-day, so refreshing per bench run is the point
    import jax
    import jax.numpy as jnp
    import numpy as np

    buf = np.zeros(8 * 1024 * 1024, dtype=np.uint8)
    link_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        d = jnp.asarray(buf)
        jax.block_until_ready(d)
        _ = np.asarray(d)
        link_best = min(link_best, time.perf_counter() - t0)
    link_mbs = 2 * len(buf) / 1e6 / link_best
    log(f"link bandwidth (8 MB round trip): {link_mbs:.1f} MB/s")
    # Multi-chip projection, reported ONLY with its measured basis: the
    # production shard_map path timed against the plain kernel on the
    # one real chip (lane dp split needs zero collectives; the overhead
    # is the launch/stitch cost). VERDICT r3 item 9.
    oh = devbench.sharding_overhead(cx)
    oh_pct = max(0.0, oh["overhead_pct"])
    proj4 = dev["mb_s"] * 4 * (1 - oh_pct / 100.0)
    log(f"tpu sharding overhead (1-chip shard_map vs plain): "
        f"{oh['overhead_pct']:+.1f}%  -> projected 4-chip "
        f"{proj4:.0f} MB/s")
    out = {
        "tpu_e2e_mb_s": round(e2e_mbs, 1),
        "tpu_device_mb_s": round(dev["mb_s"], 1),
        "tpu_us_per_step": round(dev["us_per_step"], 3),
        "tpu_corpus_mb": round(len(data) / 1e6, 1),
        "tpu_shard_overhead_pct": round(oh["overhead_pct"], 1),
        "tpu_projected_4chip_mb_s": round(proj4, 0),
        "_link_mbs": link_mbs,
        "_flag_us_per_step": dev["us_per_step"],
    }
    out.update(bench_tpu_stock64k(expected))
    return out


CORPUS_64K = os.path.join(BENCH_DIR, "corpus_64k.bin")
CORPUS_64K_XZ = os.path.join(BENCH_DIR, "corpus_64k.xz")


def bench_tpu_stock64k(expected: bytes) -> dict:
    """Foreign-archive device lane: a stock `xz -6 --block-size=64KiB`
    archive (liblzma encoder, lc=3 literal tables, full 64 KiB windows)
    decoded by the VMEM kernel — the widest eligibility shape
    (docs/DESIGN.md round-3: coarse 1 MiB blocks cap lane parallelism at
    #blocks and stay a host workload)."""
    from lzma_rs_tpu.parallel import devbench, runtime
    from lzma_rs_tpu.utils import stats as stats_mod

    data = expected[: TPU_MB * 1_000_000]
    if not os.path.exists(CORPUS_64K_XZ):
        with open(CORPUS_64K, "wb") as f:
            f.write(data)
        subprocess.run(
            ["xz", "-6", "-T1", "--block-size=65536", "-k", "-f",
             CORPUS_64K],
            check=True,
        )
        os.replace(CORPUS_64K + ".xz", CORPUS_64K_XZ)
        os.remove(CORPUS_64K)
    cx = open(CORPUS_64K_XZ, "rb").read()
    log(f"stock 64k corpus: {len(data) / 1e6:.1f} MB -> "
        f"{len(cx) / 1e6:.1f} MB (xz -6 --block-size=64KiB)")
    with stats_mod.collect() as st:
        out = runtime.xz_decode(cx, engine="tpu-vmem")
    assert out == data, "stock-64k TPU decode not bit-exact"
    if st.fallbacks:
        log(f"stock-64k lane fell back ({st.fallbacks}); reporting nulls")
        return {}
    e2e = time_best(lambda: runtime.xz_decode(cx, engine="tpu-vmem"),
                    reps=2)
    e2e_mbs = len(data) / 1e6 / e2e
    log(f"stock-64k tpu e2e: {e2e_mbs:.1f} MB/s ({e2e:.2f}s)")
    dev = devbench.device_throughput(cx, verify=data)
    log(f"stock-64k tpu device-resident: {dev['mb_s']:.1f} MB/s/chip  "
        f"{dev['us_per_step']:.2f} us/step  L={dev['lanes']}")
    return {
        "tpu_stock64k_e2e_mb_s": round(e2e_mbs, 1),
        "tpu_stock64k_device_mb_s": round(dev["mb_s"], 1),
        "_stock_us_per_step": dev["us_per_step"],
    }


def main() -> None:
    build_corpus()
    expected = open(CORPUS, "rb").read()
    cx = open(CORPUS_XZ, "rb").read()
    n_mb = len(expected) / 1e6

    import lzma_rs_tpu

    # correctness gate
    out = lzma_rs_tpu.xz_decompress(cx)
    assert out == expected, "decode is not bit-exact — refusing to benchmark"
    del out

    # best-of-5, interleaved with the baseline below: absolute MB/s on
    # this 2-core box swings +-20% with noisy neighbors; the RATIO
    # (vs_baseline) is the robust headline (VERDICT r3 weak #6)
    ours = time_best(lambda: lzma_rs_tpu.xz_decompress(cx))
    ours_mbs = n_mb / ours
    log(f"lzma_rs_tpu xz_decompress: {ours_mbs:.1f} MB/s ({ours:.2f}s)")

    base = time_best(
        lambda: subprocess.run(
            ["xz", "-dc", "-T1", CORPUS_XZ],
            stdout=subprocess.DEVNULL,
            check=True,
        )
    )
    base_mbs = n_mb / base
    log(f"baseline xz -dc -T1 (liblzma): {base_mbs:.1f} MB/s ({base:.2f}s)")

    # TPU lane: runs only on a real chip; reports device-resident and
    # end-to-end throughput alongside the host number (VERDICT r2 #2).
    tpu = {}
    if os.environ.get("LZMA_RS_TPU_BENCH_TPU", "1") != "0":
        try:
            import jax

            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        if on_tpu:
            try:
                tpu = bench_tpu(expected)
            except Exception as e:  # never lose the host number
                log(f"tpu lane failed: {type(e).__name__}: {e}")

    # Persist the measured auto-router calibration (VERDICT r4 item 5):
    # the router's throughput model then reflects THIS host instead of
    # the v5e defaults. Env pins (LZMA_RS_TPU_CAL_*) still win at read
    # time. The step-cost line us/step = A + B*port_rows is fit from the
    # two measured kernel shapes (flagship ring 512 rows, stock-64k
    # full-window 16384 rows) when both ran.
    try:
        from lzma_rs_tpu.parallel import runtime as _rt

        cal = {"native_mbs": ours_mbs}
        if "_link_mbs" in tpu:
            cal["link_mbs"] = tpu["_link_mbs"]
        if "_flag_us_per_step" in tpu and "_stock_us_per_step" in tpu:
            r0, r1 = 512.0, 16384.0
            u0 = tpu["_flag_us_per_step"]
            u1 = tpu["_stock_us_per_step"]
            b = max((u1 - u0) / (r1 - r0), 0.0)
            cal["step_b"] = b
            cal["step_a"] = max(u0 - b * r0, 0.1)
        path = _rt.write_calibration(**cal)
        log(f"calibration written: {path} <- {cal}")
    except Exception as e:
        log(f"calibration write failed: {type(e).__name__}: {e}")

    print(
        json.dumps(
            {
                "metric": "xz_decode_throughput",
                "value": round(ours_mbs, 1),
                "unit": "MB/s",
                "vs_baseline": round(ours_mbs / base_mbs, 3),
                "host_mb_s": round(ours_mbs, 1),
                **{k: v for k, v in tpu.items() if not k.startswith("_")},
            }
        )
    )


if __name__ == "__main__":
    main()
