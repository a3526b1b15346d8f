"""PSK31 receiver CLI: BPSK31 demod + Varicode decode.

The reference ships BPSK31/Varicode as library nodes without an example app
(reference: src/psk31.hh); this CLI completes the chain: IQ (or audio-band
complex baseband) -> resample/selection -> BPSK31 -> Varicode -> text.
"""

from __future__ import annotations

import numpy as np

from libsdr_tpu import Pipeline, StreamSpec
from libsdr_tpu.apps.chains import run_bit_chain
from libsdr_tpu.decode import VaricodeDecoder
from libsdr_tpu.ops import BPSK31, IQBaseBand
from libsdr_tpu.utils import logging as sdrlog
from libsdr_tpu.utils.options import add_source_args, common_parser, load_source


def main(argv=None):
    p = common_parser("PSK31 receiver (reference nodes: src/psk31.hh)")
    add_source_args(p)
    p.add_argument("-F", "--frequency", type=float, default=0.0,
                   help="PSK31 carrier offset from capture center [Hz]")
    args = p.parse_args(argv)
    sdrlog.set_level(args.log_level)

    iq, fs = load_source(args)
    if not np.iscomplexobj(iq):
        raise SystemExit("psk31_rx expects complex IQ input")
    stages = []
    if fs > 4000:
        # Select a narrow band around the carrier and decimate near 2 kHz
        # (BPSK31 requires >= 2 kHz, reference: src/psk31.hh:86-92).
        stages.append(IQBaseBand(fc=args.frequency, width=200.0, order=64,
                                 out_rate=2000.0, design="textbook"))
    stages.append(BPSK31())
    fe = Pipeline(stages, name="psk31_rx")
    fe.bind(StreamSpec(np.complex64, fs, args.block_size))
    print(fe.describe())
    bits = run_bit_chain(fe, iq)
    text = VaricodeDecoder().process(bits)
    print(text)
    return text


if __name__ == "__main__":
    main()
