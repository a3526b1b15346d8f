"""Wideband pager scanner — the flagship end-to-end pipeline.

One wideband IQ capture -> polyphase channelizer (M uniform channels on the
MXU) -> per-channel FM discriminator -> ASK + bit-sync PLL (all channels
batched on the TPU) -> native C++ POCSAG FSMs per channel (host).  The
reference can only do this one channel at a time (examples/sdr_pocsag.cc
tunes a single channel); here the whole band decodes concurrently.

Usage:
  python -m libsdr_tpu.apps.scanner --file wide.wav --channels 64
  python -m libsdr_tpu.apps.scanner --raw rtl.bin --rate 1.6e6 --channels 64
"""

from __future__ import annotations

import numpy as np

from libsdr_tpu import Pipeline, StreamSpec
from libsdr_tpu.core import stream_blocks
from libsdr_tpu.decode import pocsag_decode_bits
from libsdr_tpu.ops import ASKDetector, BitStream, FMDemod
from libsdr_tpu.ops.channelizer import Channelizer
from libsdr_tpu.utils import logging as sdrlog
from libsdr_tpu.utils.options import add_source_args, common_parser, load_source


def scanner_pipeline(fs: float, block: int, n_channels: int,
                     baud: float = 1200.0) -> Pipeline:
    """Channelizer -> FM -> ASK -> BitStream over all M channels at once."""
    p = Pipeline([
        Channelizer(n_channels, taps_per_branch=8),
        FMDemod(),
        ASKDetector(invert=True),   # POCSAG mark(1) = negative deviation
        BitStream(baud, mode="normal"),
    ], name="wideband_pocsag_scanner")
    p.bind(StreamSpec(np.complex64, fs, block))
    return p


def scan(iq: np.ndarray, fs: float, n_channels: int, block: int = None,
         baud: float = 1200.0):
    """Decode every channel of a wideband capture; returns
    {channel_index: [POCSAGMessage, ...]} for channels with traffic.

    Uses the fused single-chip scanner path (Pallas PFB+FM kernel ->
    time-major bit chain, parallel/wideband.py) with on-device bit
    compaction before readback."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from libsdr_tpu.core.ragged import compact_device
    from libsdr_tpu.parallel.wideband import build_scanner_step

    m = n_channels
    if block is None:
        block = int(fs // 2)
    block -= block % (m * 16)
    if block <= 0:
        raise SystemExit("block too small for the channel count")
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("d",))
    sstep, sinit, splace = build_scanner_step(mesh, m, block, fs, baud=baud)
    cap = int(block / m / (fs / m) * baud * 1.3) + 16

    def step(c, x):
        c, y = sstep(c, x)
        d, k = compact_device(y, cap)
        return c, (d, k)

    step = jax.jit(step)
    carry = sinit()
    datas, counts = [], []
    for blk in stream_blocks(iq, block):
        carry, (d, k) = step(carry, splace(blk))
        datas.append(np.asarray(d))
        counts.append(np.asarray(k))
    overflow = max(int(k.max()) for k in counts) - cap
    if overflow > 0:
        sdrlog.get_logger("scanner").warning(
            "compact_device capacity overflow: a channel produced %d bits "
            "over the %d cap this block — raise the cap margin", overflow,
            cap)
    found = {}
    for ch in range(m):
        bits = np.concatenate([d[ch, :min(k[ch], cap)]
                               for d, k in zip(datas, counts)])
        msgs = pocsag_decode_bits(bits)
        if msgs:
            found[ch] = msgs
    return found


def main(argv=None):
    ap = common_parser("Wideband POCSAG scanner (channelizer + decoder bank)")
    add_source_args(ap)
    ap.add_argument("--channels", type=int, default=64,
                    help="uniform channels across the capture bandwidth")
    ap.add_argument("--baud", type=float, default=1200.0)
    args = ap.parse_args(argv)
    sdrlog.set_level(args.log_level)

    iq, fs = load_source(args)
    if not np.iscomplexobj(iq):
        raise SystemExit("scanner expects an IQ capture")
    found = scan(iq, fs, args.channels, baud=args.baud)
    m = args.channels
    for ch in sorted(found):
        f_center = ch * fs / m
        if ch > m // 2:
            f_center -= fs
        for msg in found[ch]:
            print(f"ch {ch:4d} ({f_center / 1e3:+9.1f} kHz): POCSAG "
                  f"@{msg.address} F={msg.function} '{msg.best_decode()}'")
    if not found:
        print("no POCSAG traffic found")
    return found


if __name__ == "__main__":
    main()
