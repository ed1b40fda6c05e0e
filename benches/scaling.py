#!/usr/bin/env python3
"""Host-scaling efficiency harness (BASELINE.md metric: >= 80% efficiency
1 -> N hosts).

Runs the multi-host block-parallel decode with 1 and N JAX processes on
this machine (CPU backend; gloo over loopback stands in for DCN) and
reports per-host throughput and scaling efficiency. On a real multi-host
slice the same script runs unmodified with the cluster's coordinator
address.

Note: on a single machine the N processes share the physical cores, so
wall-clock "scaling" here validates correctness+overhead of the protocol,
not added compute; per-host efficiency is the meaningful number.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
proc, nproc, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:9733", num_processes=nproc,
        process_id=proc)
sys.path.insert(0, %(here)r)
from lzma_rs_tpu.parallel import multihost
data = open(path, "rb").read()
# warm
out = multihost.xz_decode_multihost(data)
t0 = time.time()
out = multihost.xz_decode_multihost(data)
dt = time.time() - t0
print(f"RESULT {proc} {len(out)} {dt:.4f}", flush=True)
"""


def run(nproc: int, path: str) -> float:
    script = WORKER % {"here": HERE}
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(script)
        spath = f.name
    procs = [
        subprocess.Popen(
            [sys.executable, spath, str(i), str(nproc), path],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for i in range(nproc)
    ]
    times = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        for line in out.splitlines():
            if line.startswith("RESULT"):
                times.append(float(line.split()[3]))
    assert len(times) == nproc, f"missing results: {times}"
    return max(times)


def main():
    sys.path.insert(0, HERE)
    import lzma_rs_tpu

    # corpus: reuse the bench corpus if present, else foo.txt x 32
    src = os.path.join(HERE, ".bench", "corpus.bin")
    if os.path.exists(src):
        data = open(src, "rb").read()[: 32 << 20]
    else:
        data = open("/root/reference/tests/files/foo.txt", "rb").read() * 64
    c = lzma_rs_tpu.xz_compress(data, block_size=1 << 21, check_method=4)
    with tempfile.NamedTemporaryFile(delete=False, suffix=".xz") as f:
        f.write(c)
        path = f.name

    n_mb = len(data) / 1e6
    t1 = run(1, path)
    t2 = run(2, path)
    eff = t1 / (t2 * 1)  # same machine: ideal == equal wall time
    print(
        json.dumps(
            {
                "corpus_mb": round(n_mb, 1),
                "hosts_1_s": round(t1, 3),
                "hosts_2_s": round(t2, 3),
                "throughput_1_mb_s": round(n_mb / t1, 1),
                "throughput_2_mb_s": round(n_mb / t2, 1),
                "protocol_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
