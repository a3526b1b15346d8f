"""Multi-mode decoder bank throughput — BASELINE.json config 4: one
channelizer front end feeding a per-channel POCSAG / AFSK-AX.25 / RTTY /
PSK31 mode map (apps/multimode.py), as one jitted step on one chip.

Prints one JSON object and writes MULTIMODE_r*.json.
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
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--frames", type=int, default=12288,
                    help="frames per block (time samples per channel; "
                         "must divide by the PSK31 decimator)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from libsdr_tpu.apps.multimode import build_bank
    from libsdr_tpu.core import cplx

    m = args.channels
    fs = m * 24_000.0
    block = m * args.frames
    # Even per-channel split across the four modes.
    modes = ("pocsag", "ax25", "rtty", "psk31")
    mode_map = {ch: modes[ch % 4] for ch in range(m)}
    step, init_carry, groups = build_bank(fs, block, m, mode_map)

    key = jax.random.PRNGKey(0)
    x = cplx.Complex(jax.random.normal(key, (block,), np.float32),
                     jax.random.normal(jax.random.PRNGKey(1), (block,),
                                       np.float32))
    carry = init_carry()

    def force(outs):
        return sum(float(jnp.sum(r.valid.astype(jnp.float32)))
                   for r in outs.values())

    c, outs = step(carry, x)
    force(outs)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        c = carry
        for _ in range(3):
            c, outs = step(c, x)
        force(outs)
        best = min(best, (time.perf_counter() - t0) / 3)

    out = {
        "channels": m,
        "block": block,
        "mode_split": {mo: int(len(ix)) for mo, ix in groups.items()},
        "step_ms": round(best * 1e3, 3),
        "msps": round(block / best / 1e6, 1),
        "bandwidth_mhz": round(fs / 1e6, 3),
        "realtime_multiple": round(block / best / fs, 1),
        "metric": "multi-mode decoder bank (1 channelizer front end -> "
                  "per-channel POCSAG/AX.25/RTTY/PSK31) Msps/chip",
    }
    print(json.dumps(out))
    from tools._artifact import write_artifact
    write_artifact("MULTIMODE", out)


if __name__ == "__main__":
    main()
