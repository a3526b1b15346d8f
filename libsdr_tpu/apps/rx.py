"""Multi-mode receiver CLI: WFM/NFM/AM/USB/LSB
(reference: examples/sdr_rec.cc)."""

from __future__ import annotations

import numpy as np

from libsdr_tpu.apps.chains import rx_chain
from libsdr_tpu.core import run_pipeline, stream_blocks
from libsdr_tpu.io import write_wav
from libsdr_tpu.utils import logging as sdrlog
from libsdr_tpu.utils.options import add_source_args, common_parser, load_source


def main(argv=None):
    p = common_parser("Multi-mode receiver (reference: examples/sdr_rec.cc)")
    add_source_args(p)
    p.add_argument("-m", "--mode", default="WFM",
                   help="WFM | NFM | AM | USB | LSB")
    p.add_argument("-F", "--frequency", type=float, default=0.0,
                   help="channel offset from capture center [Hz]")
    p.add_argument("-o", "--output", required=True, help="output WAV")
    args = p.parse_args(argv)
    sdrlog.set_level(args.log_level)

    iq, fs = load_source(args)
    rx = rx_chain(args.mode, fs, args.block_size, fc=args.frequency)
    print(rx.describe())
    _, audio = run_pipeline(rx, stream_blocks(iq, args.block_size))
    write_wav(args.output, np.clip(audio, -1, 1), int(rx.out_spec.rate_hz))
    print(f"wrote {len(audio)} samples @ {rx.out_spec.rate_hz:g} Hz")


if __name__ == "__main__":
    main()
