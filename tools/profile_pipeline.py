#!/usr/bin/env python3
"""Capture a jax.profiler trace of the pipelined e2e TPU decode and
summarize the device timeline (VERDICT r4 item 7).

Prints per-launch kernel windows, the gaps between them (un-overlapped
host/transfer time on THIS host's link), and the host-side
copy_to_host_async issue points. On the axon tunnel the gaps are
tunnel-RPC-bound; on a PCIe host re-run this to verify the gaps shrink
to ~ms (the kernel then bounds e2e throughput).

Usage: python tools/profile_pipeline.py [trace_dir]
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(tdir: str) -> None:
    import jax

    from lzma_rs_tpu.parallel import runtime

    cx = open(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".bench", "corpus_tpu.xz"), "rb"
    ).read()
    out = runtime.xz_decode(cx, engine="tpu-vmem")  # warm/compile
    print(f"warm decode ok ({len(out)} B)", flush=True)
    with jax.profiler.trace(tdir):
        runtime.xz_decode(cx, engine="tpu-vmem")


def summarize(tdir: str) -> None:
    traces = sorted(glob.glob(
        os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True
    ))
    if not traces:
        print("no trace.json.gz found", file=sys.stderr)
        sys.exit(1)
    d = json.load(gzip.open(traces[-1]))
    ev = d["traceEvents"]
    pnames = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"]["name"]

    kerns = sorted(
        (e["ts"], e["ts"] + e["dur"])
        for e in ev
        if e.get("ph") == "X"
        and e["name"].startswith("decode_segments_vmem")
    )
    d2h = sorted(
        e["ts"] for e in ev
        if e.get("ph") == "X" and "copy_to_host_async" in e["name"]
    )
    if not kerns:
        print("no kernel launches in trace", file=sys.stderr)
        sys.exit(1)
    t0 = kerns[0][0]
    total_k = sum(b - a for a, b in kerns) / 1e3
    span = (kerns[-1][1] - t0) / 1e3
    print(f"{len(kerns)} kernel launches, device busy {total_k:.1f} ms "
          f"of {span:.1f} ms span ({100 * total_k / span:.0f}% occupancy)")
    prev_end = None
    for i, (a, b) in enumerate(kerns):
        gap = "" if prev_end is None else f"  gap before: {(a - prev_end) / 1e3:.1f} ms"
        d2h_in = sum(1 for t in d2h if a <= t <= b)
        print(f"  launch {i}: [{(a - t0) / 1e3:8.1f}, {(b - t0) / 1e3:8.1f}] ms"
              f"  ({(b - a) / 1e3:.1f} ms, {d2h_in} D2H issues inside){gap}")
        prev_end = b
    n_inside = sum(
        1 for t in d2h if any(a <= t <= b for a, b in kerns)
    )
    print(f"copy_to_host_async calls: {len(d2h)} total, {n_inside} issued "
          f"inside kernel windows (D2H(n-1) rides kernel(n))")


def main() -> None:
    tdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lzma_rs_tpu_trace"
    if not glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                     recursive=True):
        capture(tdir)
    summarize(tdir)


if __name__ == "__main__":
    main()
