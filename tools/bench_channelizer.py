"""Channelizer benchmark — BASELINE.md config 3: the 1024-channel polyphase
filterbank on one chip (channels x Msamples/s per chip).

Measures three paths on the same block stream (best-of-3 over chained
iterations with forced readback — block_until_ready alone does not
synchronize on the axon tunnel):

  * channelizer:  the public Channelizer op (Pallas PFB kernel + regather
                  to the (M, t) channel-major contract)
  * wideband_fm:  WidebandFM fused channelizer+demod bank, lane layout
                  (the scanner front end — audio is the only HBM write)
  * xla_staged:   the pre-kernel staged XLA path (PFB -> matmul FFT ->
                  transpose), for the delta

Usage: python tools/bench_channelizer.py [--channels 1024] [--block 33554432]
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


def bench(step, carry, x, iters=4, runs=3):
    import jax
    import jax.numpy as jnp
    from libsdr_tpu.core.cplx import Complex

    def force(r):
        if isinstance(r, Complex):
            r = r.re
        return float(jnp.sum(r))

    c, y = step(carry, x)
    force(y)
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        c = carry
        for _ in range(iters):
            c, y = step(c, x)
        force(y)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=1024)
    ap.add_argument("--block", type=int, default=1 << 26)
    ap.add_argument("--taps-per-branch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from libsdr_tpu import Pipeline, StreamSpec
    from libsdr_tpu.core import cplx
    from libsdr_tpu.ops.channelizer import Channelizer
    from libsdr_tpu.ops.wideband_rx import WidebandFM
    from libsdr_tpu.ops import pallas_pfb

    m, block, p = args.channels, args.block, args.taps_per_branch
    fs = 1.024e9
    key = jax.random.PRNGKey(0)
    x = cplx.Complex(jax.random.normal(key, (block,), np.float32),
                     jax.random.normal(jax.random.PRNGKey(1), (block,),
                                       np.float32))

    out = {"channels": m, "taps_per_branch": p, "block": block}

    ch = Pipeline([Channelizer(m, p)])
    ch.bind(StreamSpec(np.complex64, fs, block))
    t = bench(ch.compile(), ch.init_carry(), x)
    out["channelizer_ms"] = round(t * 1e3, 3)
    out["channelizer_msps"] = round(block / t / 1e6, 1)

    wb = WidebandFM(m, p, gain=1.0, layout="lane")
    wb.bind(StreamSpec(np.complex64, fs, block))
    step = jax.jit(lambda c, v: wb.apply(c, v))
    t = bench(step, wb.init_carry(), x)
    out["wideband_fm_ms"] = round(t * 1e3, 3)
    out["wideband_fm_msps"] = round(block / t / 1e6, 1)

    # fast matmul precision (single-pass bf16 vs the default 3-pass HIGH
    # emulation): ~3x the kernel's MXU throughput, 93 dB-class audio.
    from libsdr_tpu.ops.fir import set_mxu_precision
    set_mxu_precision("fast")
    try:
        wbf = WidebandFM(m, p, gain=1.0, layout="lane")
        wbf.bind(StreamSpec(np.complex64, fs, block))
        stepf = jax.jit(lambda c, v: wbf.apply(c, v))
        t = bench(stepf, wbf.init_carry(), x)
        out["wideband_fm_fast_ms"] = round(t * 1e3, 3)
        out["wideband_fm_fast_msps"] = round(block / t / 1e6, 1)
    finally:
        set_mxu_precision("high")

    # staged XLA path for the delta (kernel gate off via a too-large p? no:
    # temporarily disable by calling the op body with the gate bypassed)
    ch2 = Pipeline([Channelizer(m, p)])
    ch2.bind(StreamSpec(np.complex64, fs, block))
    orig = pallas_pfb.mxu_pfb_supported
    pallas_pfb.mxu_pfb_supported = lambda *a, **k: False
    try:
        t = bench(ch2.compile(), ch2.init_carry(), x)
    finally:
        pallas_pfb.mxu_pfb_supported = orig
    out["xla_staged_ms"] = round(t * 1e3, 3)
    out["xla_staged_msps"] = round(block / t / 1e6, 1)

    # Raw kernel rate (pre-framed input, one op per call): what the chip
    # does once the tunnel's ~2 ms/call dispatch tax is amortized.
    from libsdr_tpu.core.cplx import Complex
    x2 = Complex(x.re.reshape(block // m, m), x.im.reshape(block // m, m))
    hist = cplx.zeros((p, m))
    taps3 = wb._taps3

    def kstep(c, v):
        audio, prev, _ = pallas_pfb.pfb_mxu(v, c[0], taps3, m, demod=True,
                                            prev=c[1])
        return (c[0], prev), audio

    t = bench(kstep, (hist, wb.init_carry()[1]), x2)
    out["kernel_direct_ms"] = round(t * 1e3, 3)
    out["kernel_direct_msps"] = round(block / t / 1e6, 1)

    # Whole-band pager scanner end-to-end: fused channelizer+FM kernel ->
    # lane-major ASK + Pallas bit-sync PLL -> windowed on-device bit
    # compaction (parallel/wideband.py).  Four variants: default (HIGH
    # matmul precision, f32 planes), fast precision, bf16-plane ingest,
    # and both (the u8-wire production config).
    from jax.sharding import Mesh
    from libsdr_tpu.ops.fir import set_mxu_precision
    from libsdr_tpu.parallel.wideband import build_scanner_step

    fs_scan = m * 24_000.0
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("d",))
    xbf = cplx.Complex(x.re.astype(jnp.bfloat16), x.im.astype(jnp.bfloat16))

    def sbench(prec, xin, pd):
        import jax.numpy as jnp
        set_mxu_precision(prec)
        sstep, sinit, splace = build_scanner_step(
            mesh1, m, block, fs_scan, compact_window=16, plane_dtype=pd)
        c0 = sinit()
        c, y = sstep(c0, xin)
        _ = float(jnp.sum(y.valid.astype(jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            c = c0
            for _ in range(3):
                c, y = sstep(c, xin)
            _ = float(jnp.sum(y.valid.astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / 3)
        return best

    try:
        for name, prec, xin, pd in (
                ("scanner_e2e", "high", x, None),
                ("scanner_e2e_fast", "fast", x, None),
                ("scanner_e2e_bf16", "high", xbf, jnp.bfloat16),
                ("scanner_e2e_bf16_fast", "fast", xbf, jnp.bfloat16)):
            t = sbench(prec, xin, pd)
            out[f"{name}_ms"] = round(t * 1e3, 3)
            out[f"{name}_msps"] = round(block / t / 1e6, 1)
    finally:
        set_mxu_precision("high")

    out["metric"] = "polyphase channelizer wideband Msamples/s/chip"
    out["protocol"] = "carry-chained steps, single forced readback ends the timed region, best of runs (BASELINE.md timing protocol)"
    out["per_channel_msps"] = round(out["wideband_fm_msps"] / m, 4)
    print(json.dumps(out))
    from tools._artifact import write_artifact
    write_artifact("CHANNELIZER", out)


if __name__ == "__main__":
    main()
