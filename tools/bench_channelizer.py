"""Channelizer benchmark — BASELINE.md config 3: the 1024-channel polyphase
filterbank on one chip (channels x Msamples/s per chip).

Usage: python tools/bench_channelizer.py [--channels 1024] [--block 8388608]
Prints one JSON object.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=1024)
    ap.add_argument("--block", type=int, default=1 << 23)
    ap.add_argument("--taps-per-branch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from libsdr_tpu import Pipeline, StreamSpec
    from libsdr_tpu.core import cplx
    from libsdr_tpu.ops.channelizer import Channelizer

    m, block = args.channels, args.block
    fs = 1.024e9
    p = Pipeline([Channelizer(m, args.taps_per_branch)])
    p.bind(StreamSpec(np.complex64, fs, block))
    step = p.compile()
    carry = p.init_carry()
    key = jax.random.PRNGKey(0)
    x = cplx.Complex(jax.random.normal(key, (block,), np.float32),
                     jax.random.normal(key, (block,), np.float32))
    c, y = step(carry, x)
    _ = float(jnp.sum(y.re))
    best = float("inf")
    iters = 10
    for _ in range(3):
        t0 = time.perf_counter()
        c = carry
        for _ in range(iters):
            c, y = step(c, x)
        _ = float(jnp.sum(y.re))
        best = min(best, (time.perf_counter() - t0) / iters)
    msps = block / best / 1e6
    print(json.dumps({
        "metric": "polyphase channelizer wideband Msamples/s/chip",
        "channels": m,
        "taps_per_branch": args.taps_per_branch,
        "block": block,
        "ms_per_block": round(best * 1e3, 3),
        "wideband_msps": round(msps, 1),
        "per_channel_msps": round(msps / m, 4),
    }))


if __name__ == "__main__":
    main()
