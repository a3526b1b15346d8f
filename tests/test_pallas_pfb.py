"""Fused PFB channelizer kernel (ops/pallas_pfb.py) and the WidebandFM op.

All kernel invocations run in interpret mode on the CPU test mesh; the
on-hardware numeric check is part of tools/tpu_check.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from libsdr_tpu.core import cplx
from libsdr_tpu.core.cplx import Complex
from libsdr_tpu.ops.channelizer import fold_commutator, prototype_lowpass
from libsdr_tpu.ops.pallas_pfb import (channel_of_lane, lane_of_channel,
                                       mxu_pfb_supported, pfb_mxu)
from libsdr_tpu.parallel.wideband import channelize_segment


def _mk(rng, m, p, F):
    x = (rng.normal(size=F * m) + 1j * rng.normal(size=F * m)
         ).astype(np.complex64)
    hist = (rng.normal(size=(p, m)) + 1j * rng.normal(size=(p, m))
            ).astype(np.complex64)
    taps3 = fold_commutator(prototype_lowpass(m, p), m, p)
    return x, hist, taps3


def test_lane_maps_inverse():
    for m in (128, 256, 384, 1024):
        lp = lane_of_channel(m)
        chan = channel_of_lane(m)
        np.testing.assert_array_equal(chan[lp], np.arange(m))
        np.testing.assert_array_equal(lp[chan], np.arange(m))


@pytest.mark.parametrize("m", [128, 384, 256])
def test_pfb_kernel_matches_xla_channelizer(rng, m):
    """Kernel (interpret) == channelize_segment for n2 = 1, 3 and 2."""
    p, F = 8, 32
    x, hist, taps3 = _mk(rng, m, p, F)
    xb = cplx.as_block(x)
    hb = cplx.as_block(hist)
    ref = cplx.to_numpy(channelize_segment(xb, hb, jnp.asarray(taps3), m, p))
    xf = Complex(xb.re.reshape(F, m), xb.im.reshape(F, m))
    assert mxu_pfb_supported(m, F, p)
    y = pfb_mxu(xf, hb, taps3, m, interpret=True)
    got = cplx.to_numpy(y)[:, lane_of_channel(m)].T
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 2e-5, err


def test_pfb_kernel_demod_variant(rng):
    """Fused demod == channelize + discriminator with the carried prev."""
    m, p, F = 256, 8, 32
    x, hist, taps3 = _mk(rng, m, p, F)
    xb = cplx.as_block(x)
    hb = cplx.as_block(hist)
    ref = cplx.to_numpy(channelize_segment(xb, hb, jnp.asarray(taps3), m, p))
    xf = Complex(xb.re.reshape(F, m), xb.im.reshape(F, m))
    lp = lane_of_channel(m)
    chan = channel_of_lane(m)
    prev_chan = (rng.normal(size=m) + 1j * rng.normal(size=m)
                 ).astype(np.complex64)
    pb = cplx.as_block(prev_chan[chan][None, :])
    audio, prev_out, first_out = pfb_mxu(xf, hb, taps3, m, gain=1.7,
                                         prev=pb, demod=True,
                                         interpret=True)
    audio = np.asarray(audio)
    shifted = np.concatenate([prev_chan[:, None], ref[:, :-1]], axis=1)
    ref_audio = 1.7 * np.angle(ref * np.conj(shifted))
    err = np.abs(audio[:, lp].T - ref_audio)
    # max error is angle amplification at near-zero |z| on random data
    assert np.median(err) < 5e-5
    assert np.percentile(err, 99) < 1e-3
    # exported prev == the last channel sample per lane; exported first ==
    # the FIRST channel sample per lane (the sharded step's neighbor seed)
    got_prev = cplx.to_numpy(prev_out)[0, lp]
    err_p = np.abs(got_prev - ref[:, -1]).max() / np.abs(ref).max()
    assert err_p < 2e-5, err_p
    got_first = cplx.to_numpy(first_out)[0, lp]
    err_f = np.abs(got_first - ref[:, 0]).max() / np.abs(ref).max()
    assert err_f < 2e-5, err_f


def test_pfb_kernel_streaming_equals_oneshot(rng):
    """Chaining (hist, prev) across kernel blocks == one big block."""
    m, p, F = 128, 8, 48
    x, _, taps3 = _mk(rng, m, p, 3 * F)
    xb = cplx.as_block(x)
    big = Complex(xb.re.reshape(3 * F, m), xb.im.reshape(3 * F, m))
    hist0 = cplx.zeros((p, m))
    one, _, _ = pfb_mxu(big, hist0, taps3, m, gain=1.0, demod=True,
                        interpret=True)
    one = np.asarray(one)
    hist = hist0
    prev = None
    outs = []
    for i in range(3):
        blk = big[i * F:(i + 1) * F, :]
        audio, prev, _ = pfb_mxu(blk, hist, taps3, m, gain=1.0, prev=prev,
                                 demod=True, interpret=True)
        outs.append(np.asarray(audio))
        hist = blk[F - p:, :]   # carry like WidebandFM.apply
    got = np.concatenate(outs, axis=0)
    # the carry (hist + exported prev) makes chained blocks IDENTICAL to
    # the one-shot run
    np.testing.assert_allclose(got, one, atol=1e-6)


def test_fusion_bind_fallback_small_block():
    """Channelizer->FMDemod fusion tightens the bind constraint (WidebandFM
    needs block >= M*P); a block that bound fine unfused must still bind —
    the pipeline restores the unfused pair (core/graph.py ConfigError
    fallback)."""
    from libsdr_tpu import Pipeline, StreamSpec
    from libsdr_tpu.ops import Channelizer, FMDemod
    from libsdr_tpu.ops.fir import kernel_mode

    m = 16
    with kernel_mode("interpret"):       # fusion pass engages off-TPU
        p = Pipeline([Channelizer(m), FMDemod()])
        p.bind(StreamSpec(np.complex64, m * 25_000.0, m * 4))  # 4 < P = 8
    assert [type(s).__name__ for s in p.stages] == \
        ["Channelizer", "FMDemod"]
    assert p.out_spec.block_size == 4

    with kernel_mode("interpret"):       # big enough: the fusion holds
        p2 = Pipeline([Channelizer(m), FMDemod()])
        p2.bind(StreamSpec(np.complex64, m * 25_000.0, m * 16))
    assert [type(s).__name__ for s in p2.stages] == ["WidebandFM"]


def test_fusion_fallback_resets_folded_rotation(rng):
    """The unfused fallback must UNDO in-place fusion state: fuse_stages
    drops a FreqShift by folding its rotation into the quadrature FMDemod
    (_pending_rot_freqs); if a LATER fusion's bind then fails (WidebandFM
    block constraint) and the original stages are restored, the restored
    FreqShift and the folded rotation would both apply — audio demodulated
    at the wrong offset (core/fuse.py reset_fusion_state)."""
    from libsdr_tpu import Pipeline, StreamSpec
    from libsdr_tpu.core import run_pipeline
    from libsdr_tpu.ops import Channelizer, FMDemod, FreqShift, ToComplex
    from libsdr_tpu.ops.fir import kernel_mode

    m, f = 16, 3_000.0
    fs = m * 25_000.0
    spec = StreamSpec(np.complex64, fs, m * 4)   # 4 frames < P = 8
    stages = lambda: [FreqShift(f, "exact"), FMDemod("quadrature"),
                      ToComplex(), Channelizer(m), FMDemod()]
    x = (rng.standard_normal(m * 4) +
         1j * rng.standard_normal(m * 4)).astype(np.complex64)

    with kernel_mode("interpret"):
        fused = Pipeline(stages())
        fused.bind(spec)                 # WidebandFM bind fails -> fallback
    assert [type(s).__name__ for s in fused.stages] == [
        "FreqShift", "FMDemod", "ToComplex", "Channelizer", "FMDemod"]
    assert fused.stages[1]._pending_rot_freqs == []   # rotation NOT folded

    plain = Pipeline(stages(), optimize=False)
    plain.bind(spec)
    _, got = run_pipeline(fused, [x])
    _, want = run_pipeline(plain, [x])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)


def test_widebandfm_matches_unfused_pipeline(rng):
    """WidebandFM (XLA fallback on CPU, layout='channel') streams
    identically to [Channelizer -> FMDemod] over multiple blocks."""
    from libsdr_tpu import Pipeline, StreamSpec
    from libsdr_tpu.ops import Channelizer, FMDemod, WidebandFM

    m, p = 64, 8
    block = m * 24
    fs = 1.0e6
    spec = StreamSpec(np.complex64, fs, block)
    ref_pipe = Pipeline([Channelizer(m, p), FMDemod(gain=0.7)])
    ref_pipe.bind(spec)
    fused = WidebandFM(m, p, gain=0.7, layout="channel")
    fused.bind(StreamSpec(np.complex64, fs, block))

    c_ref = ref_pipe.init_carry()
    c_f = fused.init_carry()
    for i in range(3):
        x = (rng.normal(size=block) + 1j * rng.normal(size=block)
             ).astype(np.complex64)
        xb = cplx.as_block(x)
        c_ref, y_ref = ref_pipe.apply(c_ref, xb)
        c_f, y_f = fused.apply(c_f, xb)
        a, b = np.asarray(y_ref), np.asarray(y_f)
        assert a.shape == b.shape == (m, block // m)
        err = np.abs(a - b)
        if i == 0:
            # FMDemod's initial prev is a unit phasor per channel while the
            # fused op's is too — first sample should agree as well.
            assert np.median(err) < 1e-4
        assert np.percentile(err, 99) < 1e-3, (i, np.percentile(err, 99))


def test_widebandfm_lane_layout_consistency(rng):
    """layout='lane' output is the channel-major output lane-permuted."""
    from libsdr_tpu import StreamSpec
    from libsdr_tpu.ops import WidebandFM

    m, p = 64, 8
    block = m * 16
    a = WidebandFM(m, p, gain=1.0, layout="lane")
    b = WidebandFM(m, p, gain=1.0, layout="channel")
    a.bind(StreamSpec(np.complex64, 1e6, block))
    b.bind(StreamSpec(np.complex64, 1e6, block))
    x = cplx.as_block((rng.normal(size=block) + 1j * rng.normal(size=block)
                       ).astype(np.complex64))
    _, ya = a.apply(a.init_carry(), x)
    _, yb = b.apply(b.init_carry(), x)
    np.testing.assert_allclose(
        np.asarray(ya)[:, a.lane_of_channel].T, np.asarray(yb), rtol=1e-6)


def test_pfb_gate():
    assert not mxu_pfb_supported(100, 64, 8)        # m not n2*128
    assert not mxu_pfb_supported(2048, 64, 8)       # n2 > 8
    assert not mxu_pfb_supported(256, 4, 8)         # F < p
    assert not mxu_pfb_supported(256, 64, 8, dtype=np.int16)
    assert mxu_pfb_supported(256, 64, 8, dtype=jnp.bfloat16)
    assert mxu_pfb_supported(1024, 8192, 8, demod=True)
