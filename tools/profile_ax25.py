"""Stage-level profile of the AFSK/AX.25 receive chain (VERDICT r2 #4).

Times each stage of [IQBaseBand -> FMDemod -> FSKDetector -> BitStream]
separately on the real TPU so the optimization target is measured, not
guessed.  Prints one JSON object and writes AX25PROFILE_r*.json.
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
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--block", type=int, default=1 << 21)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from libsdr_tpu import Pipeline, StreamSpec
    from libsdr_tpu.core import cplx
    from libsdr_tpu.core.ragged import Ragged
    from libsdr_tpu.ops import BitStream, FMDemod, FSKDetector, IQBaseBand

    n_ch, blk = args.channels, args.block
    fs = 192_000.0
    key = jax.random.PRNGKey(0)
    x = cplx.Complex(jax.random.normal(key, (n_ch, blk), np.float32),
                     jax.random.normal(jax.random.PRNGKey(2),
                                       (n_ch, blk), np.float32))

    def force_any(r):
        if isinstance(r, tuple):
            r = r[-1]
        if isinstance(r, Ragged):
            r = r.data
        if isinstance(r, cplx.Complex):
            r = r.re
        return float(jnp.sum(r.astype(jnp.float32)))

    out = {"channels": n_ch, "block": blk}

    # Stage 1: fused IQBaseBand -> FMDemod (audio at fs/4)
    front = Pipeline([IQBaseBand(fc=24e3, width=12.5e3, order=48,
                                 out_rate=48e3, design="textbook"),
                      FMDemod()])
    front.bind(StreamSpec(np.complex64, fs, blk, channels=(n_ch,)))
    fstep = front.compile()
    fcarry = front.init_carry()
    t_front = timeit(lambda: fstep(fcarry, x), force_any)
    out["front_ms"] = round(t_front * 1e3, 2)
    _, audio = fstep(fcarry, x)

    # Stage 2: FSKDetector at 48k
    fsk = FSKDetector(1200.0, 1200.0, 2200.0)
    spec2 = StreamSpec(np.float32, 48e3, audio.shape[-1], channels=(n_ch,))
    fsk.bind(spec2)
    fc = fsk.init_carry()
    fsk_step = jax.jit(lambda c, a: fsk.apply(c, a))
    t_fsk = timeit(lambda: fsk_step(fc, audio), force_any)
    out["fsk_ms"] = round(t_fsk * 1e3, 2)
    _, syms = fsk_step(fc, audio)

    # Stage 3: BitStream PLL at 48k symbols
    bs = BitStream(1200.0, mode="transition")
    bs.bind(spec2.with_(dtype=jnp.uint8))
    bc = bs.init_carry()
    bs_step = jax.jit(lambda c, s: bs.apply(c, s))
    t_bs = timeit(lambda: bs_step(bc, syms), force_any)
    out["bitsync_ms"] = round(t_bs * 1e3, 2)

    # Whole chain for reference
    chain = Pipeline([IQBaseBand(fc=24e3, width=12.5e3, order=48,
                                 out_rate=48e3, design="textbook"),
                      FMDemod(),
                      FSKDetector(1200.0, 1200.0, 2200.0),
                      BitStream(1200.0, mode="transition")])
    chain.bind(StreamSpec(np.complex64, fs, blk, channels=(n_ch,)))
    cstep = chain.compile()

    # Carry-chained with a single force (the repo bench protocol): the
    # row comparable to RXMODES_r*'s ax25 rows.
    ccarry0 = chain.init_carry()   # built outside the timed body

    def chained():
        c, r = ccarry0, None
        for _ in range(4):
            c, r = cstep(c, x)
        return r

    t_chain = timeit(lambda: chained(), force_any, iters=1) / 4
    out["chain_ms"] = round(t_chain * 1e3, 2)
    out["chain_msps"] = round(n_ch * blk / t_chain / 1e6, 1)
    out["sum_stages_ms"] = round((t_front + t_fsk + t_bs) * 1e3, 2)
    out["metric"] = "AFSK/AX.25 chain stage profile, ms/block"
    out["protocol"] = (
        "front/fsk/bitsync rows are forced-sync per stage (each includes "
        "the ~3 ms tunnel dispatch floor; NOT additive — sum_stages_ms is "
        "a rough upper bound); chain_ms is carry-chained with a single "
        "force (the repo bench protocol, BASELINE.md).")

    print(json.dumps(out))
    from tools._artifact import write_artifact
    write_artifact("AX25PROFILE", out)


if __name__ == "__main__":
    main()
