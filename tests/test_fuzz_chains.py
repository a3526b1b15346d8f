"""Randomized fused-vs-unfused streaming equivalence.

The fusion pass rewrites chains into fused ops with their own
lead/main/rest boundary logic; these seeded fuzz cases sweep orders,
decimations, block sizes and channel counts (including degenerate
blocks shorter than the filter) and assert the fused pipeline streams
equivalently to the plain stage composition.
"""

import numpy as np
import pytest

from libsdr_tpu import Pipeline, StreamSpec
from libsdr_tpu.core import cplx, fuse
from libsdr_tpu.ops import AGC, AMDemod, FMDemod, FMDeemph, IQBaseBand

from tests.conftest import snr_db


CASES = [
    # (mode, order, decim, block, n_ch)
    ("fm", 16, 2, 4096, 3),
    ("fm", 64, 4, 1024, 1),
    ("fm", 31, 8, 8192, 2),
    ("fm", 128, 4, 512, 1),      # block ~ filter length (lead-heavy)
    ("fm", 96, 2, 256, 2),       # block SHORTER than the filter
    ("am", 16, 2, 4096, 3),
    ("am", 48, 4, 2048, 2),
    ("am", 80, 8, 1024, 1),
]


def _stages(mode, order, decim):
    bb = IQBaseBand(fc=11000.0, width=9000.0, order=order, decim=decim,
                    design="textbook")
    if mode == "fm":
        return [bb, FMDemod(), FMDeemph()]
    return [bb, AMDemod(), AGC(tau=0.03)]


@pytest.mark.parametrize("mode,order,decim,block,n_ch", CASES)
def test_fused_streams_like_unfused(rng, mode, order, decim, block, n_ch):
    fs = 96000.0
    spec = StreamSpec(np.complex64, fs, block, channels=(n_ch,))

    fused = Pipeline(_stages(mode, order, decim))
    import jax
    orig = fuse._on_tpu
    fuse._on_tpu = lambda: True     # force the fused-op rewrites on CPU
    try:
        fused.bind(spec)
    finally:
        fuse._on_tpu = orig
    plain = Pipeline(_stages(mode, order, decim), optimize=False)
    plain.bind(spec)

    cf, cp = fused.init_carry(), plain.init_carry()
    for blk in range(4):
        x = (rng.normal(size=(n_ch, block))
             + 1j * rng.normal(size=(n_ch, block))).astype(np.complex64)
        xb = cplx.as_block(x)
        cf, yf = fused.apply(cf, xb)
        cp, yp = plain.apply(cp, xb)
        a, b = np.asarray(yp), np.asarray(yf)
        assert a.shape == b.shape, (a.shape, b.shape)
        # FM discriminator outputs can differ near |z| ~ 0 on random data
        # (angle amplification); demand tight median + sane energy match.
        err = np.abs(a - b)
        scale = np.abs(a).max() + 1e-12
        assert np.median(err) / scale < 1e-4, (blk, np.median(err) / scale)
        s = snr_db(a.ravel() + 1e-9, b.ravel() + 1e-9)
        assert s > 40.0, (blk, s)


USB_CASES = [
    (48, 4, 4096, 2),
    (64, 8, 2048, 1),
    (96, 8, 8192, 3),
]


@pytest.mark.parametrize("order,decim,block,n_ch", USB_CASES)
def test_usb_fused_streams_like_unfused(rng, order, decim, block, n_ch):
    from libsdr_tpu.ops import USBDemod

    fs = 96000.0
    spec = StreamSpec(np.complex64, fs, block, channels=(n_ch,))

    def stages():
        return [IQBaseBand(fc=11000.0, ff=12500.0, width=3000.0,
                           order=order, decim=decim, design="textbook"),
                USBDemod(), AGC(tau=0.03)]

    fused = Pipeline(stages())
    orig = fuse._on_tpu
    fuse._on_tpu = lambda: True
    try:
        fused.bind(spec)
    finally:
        fuse._on_tpu = orig
    from libsdr_tpu.ops.fm_fused import USBBasebandFused
    assert any(isinstance(s, USBBasebandFused) for s in fused.stages)
    plain = Pipeline(stages(), optimize=False)
    plain.bind(spec)

    cf, cp = fused.init_carry(), plain.init_carry()
    for blk in range(4):
        x = (rng.normal(size=(n_ch, block))
             + 1j * rng.normal(size=(n_ch, block))).astype(np.complex64)
        xb = cplx.as_block(x)
        cf, yf = fused.apply(cf, xb)
        cp, yp = plain.apply(cp, xb)
        a, b = np.asarray(yp), np.asarray(yf)
        assert a.shape == b.shape
        err = np.abs(a - b)
        scale = np.abs(a).max() + 1e-12
        assert np.median(err) / scale < 1e-4, (blk, np.median(err) / scale)
        assert snr_db(a.ravel() + 1e-9, b.ravel() + 1e-9) > 45.0
