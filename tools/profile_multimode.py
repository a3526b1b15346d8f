"""Stage-level profile of the multi-mode decoder bank (BASELINE config 4).

Times the shared channelizer front end, each per-mode demod+bit chain, and
the per-mode windowed compaction separately on the real TPU, then the full
jitted step — so the optimization target of apps/multimode.py is measured,
not guessed.  Prints one JSON object and writes MULTIMODEPROFILE_r*.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, force, iters=6, runs=3):
    out = fn()
    force(out)
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--frames", type=int, default=12288,
                    help="frames per block (same default as "
                         "tools/bench_multimode.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from libsdr_tpu.apps.multimode import MODES, _build_parts, build_bank
    from libsdr_tpu.core import cplx
    from libsdr_tpu.core.ragged import Ragged, compact_windows

    m = args.channels
    fs = m * 24_000.0
    block = m * args.frames
    # Same mode split as tools/bench_multimode.py: channels round-robin
    # across the four modes.
    mode_map = {ch: MODES[ch % len(MODES)] for ch in range(m)}

    key = jax.random.PRNGKey(0)
    x = cplx.Complex(jax.random.normal(key, (block,), np.float32),
                     jax.random.normal(jax.random.PRNGKey(2), (block,),
                                       np.float32))

    def force_any(r):
        while isinstance(r, (tuple, list)):
            r = r[-1]
        if isinstance(r, dict):
            r = next(iter(r.values()))
            return force_any(r)
        if isinstance(r, Ragged):
            r = r.data
        if isinstance(r, cplx.Complex):
            r = r.re
        return float(jnp.sum(r.astype(jnp.float32)))

    out = {"channels": m, "block": block,
           "mode_split": {mode: sum(1 for v in mode_map.values()
                                    if v == mode) for mode in MODES}}

    # Dispatch floor: a tiny jitted op through the same call path.
    tiny = jax.jit(lambda a: a + 1.0)
    z = jnp.zeros((8, 128), np.float32)
    out["dispatch_floor_ms"] = round(timeit(lambda: tiny(z), force_any,
                                            iters=10) * 1e3, 2)

    chan, sub, groups, windows = _build_parts(fs, block, m, mode_map)

    # Stage 1: the shared channelizer front end (one PFB pass -> (M, T)).
    cstep = jax.jit(chan.apply)
    cc = chan.init_carry()
    out["channelizer_ms"] = round(
        timeit(lambda: cstep(cc, x), force_any) * 1e3, 2)
    _, y = cstep(cc, x)

    # Stage 2: each mode group's batched demod+bit chain on its channels.
    sum_modes = 0.0
    for mode, p in sub.items():
        yg = jax.device_put(y[groups[mode]])
        pc = p.init_carry()
        pstep = jax.jit(p.apply)
        t = timeit(lambda: pstep(pc, yg), force_any)
        out[f"{mode}_chain_ms"] = round(t * 1e3, 2)
        sum_modes += t
        # Stage 3: the windowed on-device bit compaction for this mode.
        if windows[mode]:
            _, bits = pstep(pc, yg)
            wstep = jax.jit(lambda b, w=windows[mode]: compact_windows(b, w))
            tw = timeit(lambda: wstep(bits), force_any)
            out[f"{mode}_compact_ms"] = round(tw * 1e3, 2)
            sum_modes += tw
    out["sum_mode_chains_ms"] = round(sum_modes * 1e3, 2)

    # Stage 2': ALL mode chains with the BitStream PLLs merged into one
    # banked Pallas launch (ops/bitsync.apply_mode_chains) — what the
    # production step actually runs; the delta vs sum_mode_chains_ms is the
    # serial-PLL cost the bank removes.
    from libsdr_tpu.ops.bitsync import apply_mode_chains
    carries0 = {mode: p.init_carry() for mode, p in sub.items()}
    mstep = jax.jit(lambda c, yy: apply_mode_chains(sub, c, yy, groups,
                                                    windows))
    out["mode_chains_banked_ms"] = round(
        timeit(lambda: mstep(carries0, y), force_any) * 1e3, 2)

    # Full jitted step (what the app runs per block) — carry-chained with
    # a single force, the repo-wide bench protocol, so this row is directly
    # comparable to MULTIMODE_r*'s compute row (an un-chained loop lets the
    # async dispatcher overlap iterations and reads ~2x too fast).
    step, init_carry, _ = build_bank(fs, block, m, mode_map)
    carry0 = init_carry()   # built OUTSIDE the timed body (device uploads)

    def chained_step():
        c, r = carry0, None
        for _ in range(6):
            c, r = step(c, x)
        return r

    t_step = timeit(lambda: chained_step(), force_any, iters=1) / 6
    out["step_ms"] = round(t_step * 1e3, 2)
    out["msps"] = round(block / t_step / 1e6, 1)
    out["metric"] = "multimode bank stage profile, ms/block"
    out["protocol"] = (
        "stage rows (*_ms except step_ms) are forced-sync per stage: each "
        "includes the ~3 ms tunnel dispatch floor and they are NOT "
        "additive; step_ms is carry-chained with a single force (the "
        "repo bench protocol, BASELINE.md) and is the row comparable to "
        "MULTIMODE_r*'s compute_step_ms — the bench's step_ms additionally "
        "includes the ragged-bit drain fetch.")

    print(json.dumps(out))
    from tools._artifact import write_artifact
    write_artifact("MULTIMODEPROFILE", out)


if __name__ == "__main__":
    main()
