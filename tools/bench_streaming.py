"""Streaming throughput vs chunks_per_dispatch (Pipeline.compile_chunked /
run_pipeline(chunks_per_dispatch=K)) — both chunked modes: the production
UNROLLED tuple-of-blocks step and the retired lax.scan stacked mode
(kept to document its staging-copy regression, STREAMING_r04), on the
128-channel x 512k FM bank plus a true small-block low-latency section.
Prints one JSON object and writes STREAMING_r*.json.
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
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--block", type=int, default=512 * 1024)
    ap.add_argument("--ks", type=int, nargs="*", default=[1, 2, 4, 8, 16])
    ap.add_argument("--small-block", type=int, default=64 * 1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from libsdr_tpu import Pipeline, StreamSpec
    from libsdr_tpu.core import cplx
    from libsdr_tpu.ops import FMDemod, FMDeemph, IQBaseBand

    n_ch, block = args.channels, args.block
    fs = 960_000.0
    key = jax.random.PRNGKey(0)
    x1 = cplx.Complex(jax.random.normal(key, (n_ch, block), np.float32),
                      jax.random.normal(jax.random.PRNGKey(1),
                                       (n_ch, block), np.float32))

    p = Pipeline([IQBaseBand(fc=fs / 8, width=200e3, order=64, decim=4,
                             design="textbook"), FMDemod(), FMDeemph()])
    p.bind(StreamSpec(np.complex64, fs, block, channels=(n_ch,)))
    out = {"channels": n_ch, "block": block,
           "samples_per_block": n_ch * block}

    def measure(step, xs, k, force):
        carry = p.init_carry()
        c, y = step(carry, xs)
        force(y)
        best = float("inf")
        iters = max(2, 16 // k)
        for _ in range(3):
            t0 = time.perf_counter()
            c = carry
            for _ in range(iters):
                c, y = step(c, xs)
            force(y)
            best = min(best, (time.perf_counter() - t0) / iters)
        return n_ch * block * k / best / 1e6, best

    force1 = lambda y: float(jnp.sum(y))  # noqa: E731

    for k in args.ks:
        if k == 1:
            msps, best = measure(p.compile(), x1, 1, force1)
            out["k1_msps"] = round(msps, 1)
            out["k1_latency_ms"] = round(best * 1e3, 3)
            continue
        # production mode: tuple-of-blocks unrolled step (no staging copies)
        xs_t = tuple(cplx.Complex(x1.re + float(i), x1.im) for i in range(k))
        msps, best = measure(p.compile_chunked("unroll"), xs_t, k,
                             lambda ys: float(jnp.sum(ys[-1])))
        out[f"k{k}_msps"] = round(msps, 1)
        out[f"k{k}_latency_ms"] = round(best * 1e3, 3)
        del xs_t  # free the K distinct input planes before the scan row
        # comparison row: the lax.scan K-stacked mode (STREAMING_r04's
        # measured regression — kept so the r04->r05 delta is in-artifact)
        xs_s = cplx.Complex(jnp.broadcast_to(x1.re, (k,) + x1.re.shape),
                            jnp.broadcast_to(x1.im, (k,) + x1.im.shape))
        msps_s, _ = measure(p.compile_chunked("scan"), xs_s, k, force1)
        out[f"k{k}_scan_msps"] = round(msps_s, 1)
        del xs_s

    base = out.get("k1_msps", 1.0)
    out["best_speedup_vs_k1"] = round(
        max(out[f"k{k}_msps"] for k in args.ks) / base, 2)

    # TRUE low-latency config: small blocks, where the ~3 ms serialized
    # dispatch floor dominates a ~0.5 ms compute step — the regime
    # chunks_per_dispatch exists for (the big-block section above shows
    # the floor amortized is only ~20% of its step, capping its speedup
    # near 1.25 by construction).
    small = args.small_block
    ps = Pipeline([IQBaseBand(fc=fs / 8, width=200e3, order=64, decim=4,
                              design="textbook"), FMDemod(), FMDeemph()])
    ps.bind(StreamSpec(np.complex64, fs, small, channels=(n_ch,)))
    xs1 = cplx.Complex(x1.re[:, :small], x1.im[:, :small])
    out["small_block"] = small

    def measure_p(p, step, xs, k, force):
        carry = p.init_carry()
        c, y = step(carry, xs)
        force(y)
        best = float("inf")
        iters = max(4, 64 // k)
        for _ in range(3):
            t0 = time.perf_counter()
            c = carry
            for _ in range(iters):
                c, y = step(c, xs)
            force(y)
            best = min(best, (time.perf_counter() - t0) / iters)
        return n_ch * small * k / best / 1e6, best

    msps, best = measure_p(ps, ps.compile(), xs1, 1, force1)
    out["small_k1_msps"] = round(msps, 1)
    out["small_k1_latency_ms"] = round(best * 1e3, 3)
    for k in args.ks:
        if k == 1:
            continue
        xs_t = tuple(cplx.Complex(xs1.re + float(i), xs1.im)
                     for i in range(k))
        msps, best = measure_p(ps, ps.compile_chunked("unroll"), xs_t, k,
                               lambda ys: float(jnp.sum(ys[-1])))
        out[f"small_k{k}_msps"] = round(msps, 1)
        out[f"small_k{k}_latency_ms"] = round(best * 1e3, 3)
        del xs_t
    out["small_best_speedup_vs_k1"] = round(
        max(out[f"small_k{k}_msps"] for k in args.ks if k != 1)
        / out["small_k1_msps"], 2)
    out["metric"] = ("streaming FM bank Msps vs chunks-per-dispatch "
                     "(latency = ms per dispatch of K blocks)")
    out["protocol"] = (
        "carry-chained dispatches, single forced readback per timed run "
        "(BASELINE.md).  k{K}_msps = the production unrolled "
        "tuple-of-blocks chunked step; k{K}_scan_msps = the retired "
        "lax.scan stacked mode, kept to document its measured staging-copy "
        "regression (STREAMING_r04).")
    print(json.dumps(out))
    from tools._artifact import write_artifact
    write_artifact("STREAMING", out)


if __name__ == "__main__":
    main()
