"""Device-resident throughput measurement for the VMEM kernel.

The axon-tunnel TPU host caches same-input repeat executions (a warm loop
over identical arguments returns in ~0.1 ms — not a real execution), so
honest kernel timing must chain calls on a data dependency: each call
feeds its window output back as the next call's ``win_init``. The chain
changes nothing about the decode (lanes re-decode the same segments) but
forces real sequential device execution (docs/DESIGN.md "axon tunnel").

Used by bench.py's TPU lane and the probe tools.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


def stage_first_batch(archive: bytes, cfg=None):
    """Stage the first L-lane batch of an `.xz` archive exactly like
    ``runtime._execute_plan_vmem`` (packed words, transposed layouts).
    Returns (cfg, dev_args, out_bytes) where out_bytes is the batch's
    decoded-byte total (for MB/s)."""
    import jax.numpy as jnp

    from lzma_rs_tpu.ops import vmem_decoder as vd
    from lzma_rs_tpu.parallel import runtime

    plans = runtime.plan_xz(archive)[0]
    if cfg is None:
        cfg = runtime.choose_vmem_config(plans)
    lanes = [lane for p in plans for lane in p.lanes]
    runtime.check_vmem_eligibility(lanes, cfg)
    lanes.sort(
        key=lambda l: sum(e - s for s, e in zip(l.in_start, l.in_end)),
        reverse=True,
    )
    src = np.frombuffer(archive, dtype=np.uint8)
    L, K = cfg.L, cfg.K
    batch = lanes[:L]
    inbuf = np.zeros((L, cfg.W_IN), dtype=np.uint8)
    meta = {
        k: np.zeros((L, K), dtype=np.int32)
        for k in ("is", "ie", "os", "oe", "rs", "lc", "lp", "pb", "va")
    }
    for i, lane in enumerate(batch):
        cum = 0
        for j in range(len(lane.in_start)):
            s, e = lane.in_start[j], lane.in_end[j]
            inbuf[i, cum:cum + (e - s)] = src[s:e]
            meta["is"][i, j] = cum
            cum += e - s
            meta["ie"][i, j] = cum
            meta["os"][i, j] = lane.out_start[j] - lane.seg_base
            meta["oe"][i, j] = lane.out_end[j] - lane.seg_base
            meta["rs"][i, j] = lane.reset_state[j]
            meta["lc"][i, j] = lane.lc[j]
            meta["lp"][i, j] = lane.lp[j]
            meta["pb"][i, j] = lane.pb[j]
        meta["va"][i, : len(lane.in_start)] = 1
    chunk_meta = vd.pack_chunk_meta(
        meta["rs"], meta["lc"], meta["lp"], meta["pb"], meta["va"]
    )
    dev_args = [
        jnp.asarray(np.ascontiguousarray(inbuf).view("<i4").T),
        jnp.zeros((cfg.W // 4, L), jnp.int32),
        jnp.asarray(meta["is"].T), jnp.asarray(meta["ie"].T),
        jnp.asarray(meta["os"].T), jnp.asarray(meta["oe"].T),
        jnp.asarray(chunk_meta.T),
    ]
    out_bytes = sum(l.out_end[-1] - l.seg_base for l in batch)
    return cfg, dev_args, out_bytes


def device_throughput(
    archive: bytes, cfg=None, chain: int = 8, verify: Optional[bytes] = None
) -> dict:
    """Chained device-resident decode throughput of the first batch.

    Returns {mb_s, us_per_step, iters, lanes, config}. With ``verify``,
    the decoded batch is checked bit-exact against the expected plaintext
    prefix before timing."""
    import jax

    from lzma_rs_tpu.ops import vmem2_decoder as vd2
    from lzma_rs_tpu.parallel import runtime

    cfg, dev_args, out_bytes = stage_first_batch(archive, cfg)
    max_iters = (
        8 * cfg.W_IN + 2 * cfg.W + cfg.MAINT * (3 * cfg.K + 4) + 1024
    )
    fn = runtime._jitted_vmem_decoder(isinstance(cfg, vd2.KernelConfig2))

    outs = fn(*dev_args, config=cfg, max_iters=max_iters, interpret=False)
    jax.block_until_ready(outs)  # compile + warm
    win, err, outp, iters = outs
    err_np = np.asarray(err)[0]
    assert not err_np.any(), f"lane errors in bench batch: {err_np[:8]}"
    if verify is not None:
        win_np = (
            np.ascontiguousarray(np.asarray(win).T).view(np.uint8)
        )
        plans = runtime.plan_xz(archive)[0]
        lanes = [lane for p in plans for lane in p.lanes]
        lanes.sort(
            key=lambda l: sum(e - s for s, e in zip(l.in_start, l.in_end)),
            reverse=True,
        )
        for i, lane in enumerate(lanes[: cfg.L]):
            n = lane.out_end[-1] - lane.seg_base
            exp = verify[lane.seg_base : lane.seg_base + n]
            assert win_np[i, :n].tobytes() == exp, f"lane {i} mismatch"

    iters_v = int(np.asarray(iters)[0, 0])
    w = dev_args[1]
    t0 = time.perf_counter()
    for _ in range(chain):
        outs = fn(dev_args[0], w, *dev_args[2:], config=cfg,
                  max_iters=max_iters, interpret=False)
        w = outs[0]
    jax.block_until_ready(w)
    per = (time.perf_counter() - t0) / chain
    return {
        "mb_s": out_bytes / 1e6 / per,
        "us_per_step": per * 1e6 / max(iters_v, 1),
        "iters": iters_v,
        "lanes": cfg.L,
        "out_bytes": out_bytes,
        "config": str(cfg),
    }


def sharding_overhead(archive: bytes, cfg=None, chain: int = 8) -> dict:
    """Measured single-chip sharding overhead: the same batch timed
    through the plain jitted kernel and through the production
    ``shard_map`` path on a 1-device mesh. The difference is the
    launch/stitch cost the dp split adds per call — the honest basis for
    any ``mb_s x n_chips`` projection (multi-chip hardware is not
    available here; lane sharding itself needs zero collectives)."""
    import jax

    from lzma_rs_tpu.ops import vmem2_decoder as vd2
    from lzma_rs_tpu.parallel import runtime

    cfg, dev_args, out_bytes = stage_first_batch(archive, cfg)
    max_iters = (
        8 * cfg.W_IN + 2 * cfg.W + cfg.MAINT * (3 * cfg.K + 4) + 1024
    )
    plain = runtime._jitted_vmem_decoder(isinstance(cfg, vd2.KernelConfig2))
    sharded = runtime._sharded_vmem_decoder(1, cfg, max_iters, False)

    import numpy as _np

    # warm both compiled paths
    _np.asarray(sharded(*dev_args)[1])
    _np.asarray(
        plain(*dev_args, config=cfg, max_iters=max_iters,
              interpret=False)[1]
    )

    # Interleaved single calls; a fresh perturbed input per call (inbuf
    # tail rows beyond every lane's in_end are never read) defeats the
    # tunnel's same-input result cache, and fetching the small err
    # output forces completion (block_until_ready does not reliably
    # block on the axon platform). Median of ``chain`` reps per path.
    t_p, t_s = [], []
    last_err = None
    salt = 0
    for _ in range(chain):
        for times, call in (
            (t_s, lambda *a: sharded(*a)),
            (t_p, lambda *a: plain(*a, config=cfg, max_iters=max_iters,
                                   interpret=False)),
        ):
            salt += 101
            inb = dev_args[0].at[-1, :].add(salt)
            t0 = time.perf_counter()
            outs = call(inb, *dev_args[1:])
            last_err = _np.asarray(outs[1])
            times.append(time.perf_counter() - t0)
    # the salt word (inbuf bytes W_IN-4..W_IN) is real input only if a
    # lane's packed size fills the whole bucket; the err check catches
    # that loudly instead of silently timing error-path executions
    assert last_err is not None and not last_err.any(), (
        "sharding_overhead: lanes errored (salt word may overlap a "
        f"bucket-filling lane): {last_err[0][:8]}"
    )
    t_plain = sorted(t_p)[len(t_p) // 2]
    t_shard = sorted(t_s)[len(t_s) // 2]
    return {
        "plain_s": t_plain,
        "sharded_s": t_shard,
        "overhead_pct": 100.0 * (t_shard - t_plain) / t_plain,
        "mb_s_plain": out_bytes / 1e6 / t_plain,
        "mb_s_sharded": out_bytes / 1e6 / t_shard,
    }
