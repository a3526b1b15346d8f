"""Stage-by-stage profile of the 1024-channel whole-band scanner
(VERDICT r2 weak #2: explain the end-to-end vs kernel gap).

Each stage is jitted and timed separately with forced readback
(block_until_ready does NOT synchronize on the axon tunnel — timings are
forced with float(jnp.sum(...))), best-of-runs over chained iterations,
plus the measured per-dispatch floor for reference.

Usage: python tools/profile_scanner.py [--channels 1024] [--block 67108864]
Prints one JSON object (ms per block per stage + derived rates).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def force(r):
    import jax
    import jax.numpy as jnp

    tot = 0.0
    for leaf in jax.tree_util.tree_leaves(r):
        a = jnp.asarray(leaf)
        if a.dtype == np.bool_:
            a = a.astype(np.uint8)
        tot += float(jnp.sum(a))
    return tot


def timeit(fn, *args, iters=4, runs=3):
    out = fn(*args)
    force(out)
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=1024)
    ap.add_argument("--block", type=int, default=1 << 26)
    ap.add_argument("--baud", type=float, default=1200.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from libsdr_tpu import StreamSpec
    from libsdr_tpu.core import cplx
    from libsdr_tpu.core.ragged import Ragged, compact_device
    from libsdr_tpu.ops import ASKDetector, BitStream
    from libsdr_tpu.ops.wideband_rx import WidebandFM
    from libsdr_tpu.parallel.wideband import (_lane_to_channel_cols,
                                              build_scanner_step)

    m, block = args.channels, args.block
    t_full = block // m
    fs = m * 25_000.0
    ch_rate = fs / m
    key = jax.random.PRNGKey(0)
    x = cplx.Complex(jax.random.normal(key, (block,), np.float32),
                     jax.random.normal(jax.random.PRNGKey(1), (block,),
                                       np.float32))
    out = {"channels": m, "block": block, "t_full": t_full}

    # dispatch floor: a trivially small jitted op, timed the same way
    tiny = jax.jit(lambda a: a + 1.0)
    z = jnp.zeros((8, 128), np.float32)
    out["dispatch_floor_ms"] = round(timeit(tiny, z, iters=8), 3)

    # stage 1: fused PFB+FM kernel (lane-major audio)
    wb = WidebandFM(m, 8, layout="lane")
    wb.bind(StreamSpec(np.complex64, fs, block))
    wbc = wb.init_carry()
    wb_step = jax.jit(wb.apply)
    out["wideband_kernel_ms"] = round(timeit(wb_step, wbc, x), 2)
    _, audio = wb_step(wbc, x)
    force(audio)

    # stage 2: lane -> channel column reorder (one (T, M) f32 transpose)
    reorder = jax.jit(lambda a: _lane_to_channel_cols(a, m))
    out["lane_reorder_ms"] = round(timeit(reorder, audio), 2)

    # stage 3: ASK detector (elementwise)
    ask = ASKDetector(invert=True)
    ask.bind(StreamSpec(np.float32, ch_rate, t_full, channels=(m,)))
    ask_step = jax.jit(lambda a: ask.apply(None, a)[1])
    out["ask_ms"] = round(timeit(ask_step, audio), 2)
    sym = ask_step(audio)
    force(sym)

    # stage 4: bit-sync PLL (Pallas kernel on TPU).  Two rows: the forced-
    # sync stage number (comparable to the other stage rows) and a carry-
    # chained one (the honest device cost — the forced row pays several
    # tunnel round trips forcing every carry leaf).
    bs = BitStream(args.baud, mode="normal", time_major=True)
    bs.bind(StreamSpec(np.uint8, ch_rate, t_full, channels=(m,)))
    bsc = bs.init_carry()
    bs_step = jax.jit(bs.apply)
    out["bitsync_ms"] = round(timeit(bs_step, bsc, sym), 2)

    def bs_chained():
        c, r = bsc, None
        for _ in range(4):
            c, r = bs_step(c, sym)
        return r

    out["bitsync_chained_ms"] = round(
        timeit(lambda: bs_chained(), iters=1) / 4, 2)
    out["bitsync_ns_per_step"] = round(
        out["bitsync_chained_ms"] * 1e6 / t_full, 1)

    # A/B: the split kernel variant (vectorized majority precompute,
    # pallas_bitsync variant='split' — bit-identical, tests) on the same
    # chained protocol.
    from libsdr_tpu.ops import pallas_bitsync as _pb
    _pb.set_variant("split")
    try:
        bs_step2 = jax.jit(lambda c, s: bs.apply(c, s))

        def bs_chained2():
            c, r = bsc, None
            for _ in range(4):
                c, r = bs_step2(c, sym)
            return r

        out["bitsync_split_chained_ms"] = round(
            timeit(lambda: bs_chained2(), iters=1) / 4, 2)
    except Exception as e:  # record instead of killing the profile
        out["bitsync_split_error"] = f"{type(e).__name__}: {e}"[:200]
    finally:
        _pb.set_variant("ring")

    _, bits = bs_step(bsc, sym)
    force(bits)
    out["bitsync_roofline"] = (
        "the PLL recurrence (fsk.cc:157-202 semantics, bit-exact) is "
        "serial in time: ~22 dependent vector ops per step (majority ring "
        "update + crossing detect + phase wrap + bounded omega nudge + "
        "NRZI+pack), each lowering to 2-5 native VPU ops -> ~100 issue "
        "slots/step ~= the measured ns/step at ~0.94 GHz, i.e. ISSUE-"
        "bound.  Measured negative results (r5, 65536x1024): unroll 8->32 "
        "and chunk-size sweeps move it <=6%; interleaving independent "
        "lane-group chains (groups=2/4/8: 7.56/8.30/9.60 vs 7.57 ms) does "
        "NOT help, ruling out dependency-latency as the bound.  HBM "
        "traffic is 2 B/step/lane (~0.2 ms/block): the serial time axis "
        "runs at ~2.5% of the bandwidth roofline by construction, and "
        "capacity scales with LANES, not time — widen the bank (the "
        "ax25_wide row) to buy throughput at equal work.")

    # stage 5: bit regather to the (M, T) contract (uint8 + bool swap)
    regather = jax.jit(lambda r: Ragged(jnp.swapaxes(r.data, -1, -2),
                                        jnp.swapaxes(r.valid, -1, -2)))
    out["bit_regather_ms"] = round(timeit(regather, bits), 2)
    bits_mt = regather(bits)
    force(bits_mt)

    # stage 6: on-device compaction (pre-readback).  TWO rows: the
    # production windowed masked-sum reduce (compact_windows) and the
    # legacy scatter path it replaced (kept for the perf-history record).
    from libsdr_tpu.core.ragged import compact_windows
    compw = jax.jit(lambda r: compact_windows(r, 16))
    out["compact_windowed_ms"] = round(timeit(compw, bits_mt), 2)
    cap = int(t_full / ch_rate * args.baud * 1.3) + 16
    comp = jax.jit(lambda r: compact_device(r, cap))
    out["compact_legacy_scatter_ms"] = round(timeit(comp, bits_mt), 2)

    # stage 7: host readback of the compacted bits
    d, k = comp(bits_mt)
    force((d, k))
    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(d), np.asarray(k)
    out["readback_ms"] = round((time.perf_counter() - t0) / 4 * 1e3, 2)

    # end-to-end fused scanner step: the production path (lane-major chain
    # + windowed on-device bit compaction) vs the legacy scatter path.
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("d",))
    sstep, sinit, splace = build_scanner_step(mesh, m, block, fs,
                                              baud=args.baud,
                                              compact_window=16)
    sc = sinit()
    xs = splace(x)

    # Carry-chained with a single force (the repo bench protocol) so this
    # row is comparable to CHANNELIZER_r*'s scanner_e2e rows; un-chained
    # repeats let the async dispatcher overlap iterations.
    def e2e(c, xx):
        y = None
        for _ in range(4):
            c, y = sstep(c, xx)
        return y

    out["scanner_e2e_ms"] = round(timeit(e2e, sc, xs, iters=1) / 4, 2)
    out["scanner_e2e_gsps"] = round(
        block / (out["scanner_e2e_ms"] / 1e3) / 1e9, 2)

    sstep0, sinit0, _ = build_scanner_step(mesh, m, block, fs,
                                           baud=args.baud)

    def e2e_legacy(c, xx):
        c2, y = sstep0(c, xx)
        return compact_device(y, cap)

    e2e_legacy = jax.jit(e2e_legacy)
    out["scanner_e2e_legacy_scatter_ms"] = round(
        timeit(e2e_legacy, sinit0(), xs), 2)
    out["sum_stage_ms"] = round(sum(
        out[k] for k in ("wideband_kernel_ms", "ask_ms", "bitsync_ms")), 2)
    out["metric"] = "scanner stage profile, ms/block"
    out["protocol"] = (
        "stage rows (wideband_kernel/lane_reorder/ask/bitsync/bit_regather/"
        "compact_*/readback) are forced-sync per stage: each includes the "
        "~3 ms tunnel dispatch floor and they are NOT additive (sum_stage_ms"
        " is a rough upper bound, not a prediction of e2e); scanner_e2e_ms "
        "is the production fused step, carry-chained with a single force "
        "(the repo bench protocol, BASELINE.md) — the row comparable to "
        "CHANNELIZER_r*'s scanner_e2e_ms.  compact_legacy_scatter_ms and "
        "scanner_e2e_legacy_scatter_ms are the RETIRED scatter compaction, "
        "kept to document the r2->r3 win.")
    print(json.dumps(out))
    from tools._artifact import write_artifact
    write_artifact("SCANNERPROFILE", out)


if __name__ == "__main__":
    main()
