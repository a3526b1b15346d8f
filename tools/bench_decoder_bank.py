"""Decoder-bank capacity benchmark — the BASELINE.json "concurrent channels
decoded per host" metric.

Runs an N-channel POCSAG receive bank end to end on one TPU chip:

  per channel: IQBaseBand(12.5 kHz, -> 24 kHz) -> FMDemod -> ASKDetector ->
  BitStream PLL (all on TPU, channel axis = batch) -> POCSAG FSM + BCH
  repair (host, ~1.2 kbit/s/channel)

on synthesized pager transmissions, checks every channel decodes its
message, and reports the real-time multiple: how many live channels of this
configuration one chip + one host process could sustain.

Usage: python tools/bench_decoder_bank.py [--channels 256] [--seconds 2.0]
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


def synth_channel(fs: float, n: int, address: int, text: str) -> np.ndarray:
    """One POCSAG transmission, zero-padded/frequency-offset per channel."""
    from libsdr_tpu.decode import pocsag_encode_batch

    bits = pocsag_encode_batch(address=address, function=1, text=text)
    spb = fs / 1200.0
    nsig = int(len(bits) * spb)
    idx = np.minimum((np.arange(nsig) / spb).astype(np.int64), len(bits) - 1)
    dev = np.where(bits[idx] > 0, -4500.0, 4500.0)
    ph = 2 * np.pi * np.cumsum(dev) / fs
    sig = 0.9 * np.exp(1j * ph).astype(np.complex64)
    if nsig >= n:
        return sig[:n]
    return np.concatenate([sig, np.zeros(n - nsig, np.complex64)])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--fs", type=float, default=240e3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from libsdr_tpu import Pipeline, StreamSpec
    from libsdr_tpu.core import cplx
    from libsdr_tpu.core.ragged import compact_device
    from libsdr_tpu.decode import pocsag_decode_bits
    from libsdr_tpu.ops import ASKDetector, BitStream, FMDemod, IQBaseBand

    n_ch = args.channels
    fs = args.fs
    # ~0.5 s blocks, rounded to a whole number of kernel frames so the
    # exact-tiling Pallas front end engages (decim 10 -> frames of 1280).
    block = int(fs * 0.5)
    block -= block % (1280 * 4)
    n = int(fs * args.seconds)
    n -= n % block

    rng = np.random.default_rng(0)
    one = synth_channel(fs, n, 1234, "CAPACITY BENCH")
    # Synthesize the bank ON DEVICE (tile + per-channel gain + noise):
    # a host-side (n_ch, n) complex array is gigabytes at 1024 channels
    # and the tunnel link is slow; the per-channel content is what matters.
    import jax
    import jax.numpy as jnp
    from libsdr_tpu.core import cplx as _cplx

    one_d = _cplx.as_block(one)
    gains = jnp.asarray(rng.uniform(0.5, 1.0, (n_ch, 1)).astype(np.float32))

    @jax.jit
    def synth_block(sl_re, sl_im, key):
        nz = 0.02 * jax.random.normal(key, (2, n_ch, sl_re.shape[-1]),
                                      np.float32)
        return _cplx.Complex(sl_re[None, :] * gains + nz[0],
                             sl_im[None, :] * gains + nz[1])

    fe = Pipeline([
        IQBaseBand(fc=0.0, width=12.5e3, order=32, out_rate=24e3,
                   design="textbook"),
        FMDemod(),
        ASKDetector(invert=True),
        BitStream(1200.0, mode="normal"),
    ], name="pocsag_bank")
    fe.bind(StreamSpec(np.complex64, fs, block, channels=(n_ch,)))
    # Fuse the on-device bit compaction into the jitted step: the PLL emits
    # ~baud/fs (5%) valid slots, so compacting before readback cuts the
    # device->host transfer ~20x (decisive through this tunnel's slow link,
    # still a win over PCIe).
    cap = int(block / fs * 1200.0 * 1.3)
    inner = fe.compile()

    def step_fn(c, v):
        c, y = inner(c, v)
        return c, compact_device(y, cap)

    step = jax.jit(step_fn)
    carry = fe.init_carry()

    # Pre-built device blocks: separates compute capacity from this
    # tunnel's unrepresentative host->device link (~0.7 GB/s; production
    # PCIe is tens of GB/s).
    dev_blocks = [
        synth_block(one_d.re[i:i + block], one_d.im[i:i + block],
                    jax.random.PRNGKey(i))
        for i in range(0, n, block)]
    jax.block_until_ready(dev_blocks[-1].re)
    # warmup / compile
    c, (d0, n0) = step(carry, dev_blocks[0])
    _ = float(jnp.sum(n0))

    t0 = time.perf_counter()
    c = carry
    datas, counts = [], []
    for blk in dev_blocks:
        c, (d, k) = step(c, blk)
        datas.append(np.asarray(d))
        counts.append(np.asarray(k))
    t_tpu = time.perf_counter() - t0

    t0 = time.perf_counter()
    decoded = 0
    for ch in range(n_ch):
        bits = np.concatenate([d[ch, :k[ch]]
                               for d, k in zip(datas, counts)])
        msgs = pocsag_decode_bits(bits)
        if msgs and msgs[0].address == 1234:
            decoded += 1
    t_host = time.perf_counter() - t0

    wall = t_tpu + t_host
    rt_multiple = n_ch * args.seconds / wall
    out = {
        "metric": "concurrent POCSAG channels decoded per host (1 chip)",
        "channels_run": n_ch,
        "decode_success": decoded,
        "signal_seconds": args.seconds,
        "tpu_front_end_s": round(t_tpu, 4),
        "host_fsm_s": round(t_host, 4),
        "realtime_channel_capacity": int(rt_multiple),
        "note": "device-resident input; this environment's tunneled "
                "host->device link (~tens of MB/s) is not representative "
                "of production PCIe ingest — see libsdr_tpu/native "
                "(double-buffered pump) for the ingest path",
    }
    print(json.dumps(out))
    from tools._artifact import write_artifact
    write_artifact("DECODERBANK", out)


if __name__ == "__main__":
    main()
