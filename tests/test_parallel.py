"""Multi-device sharding tests on the 8-device virtual CPU mesh:
halo-exchange FIR, GSPMD-auto pipeline sharding, and the sharded wideband
channelizer+demod pipeline (SURVEY.md section 2.9 build targets)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from libsdr_tpu import Pipeline, StreamSpec
from libsdr_tpu.core import cplx
from libsdr_tpu.ops import FMDemod, IQBaseBand, firdesign
from libsdr_tpu.ops.channelizer import Channelizer
from libsdr_tpu.ops.fir import FIRFilter, fir_overlap_save
from libsdr_tpu.ops import siggen
from libsdr_tpu.parallel.halo import fir_overlap_save_sharded
from libsdr_tpu.parallel.mesh import make_mesh, shard_pipeline_step
from libsdr_tpu.parallel.wideband import build_wideband_step

from tests.conftest import snr_db

N_DEV = 8


def _mesh1d(n=N_DEV, name="d"):
    return Mesh(np.asarray(jax.devices()[:n]), (name,))


def test_halo_fir_matches_single_device(rng):
    """Time-sharded overlap-save FIR == single-device FIR, across multiple
    carried blocks."""
    mesh = _mesh1d()
    taps = firdesign.lowpass(33, 4000, 48000).astype(np.float32)
    b = 1024  # global block; 128 per device
    x = rng.normal(size=(3 * b,)).astype(np.float32)

    def sharded_step(tail, xg):
        return fir_overlap_save_sharded(taps, xg, tail, "d")

    smap = jax.jit(jax.shard_map(
        sharded_step, mesh=mesh,
        in_specs=(P(), P("d")), out_specs=(P("d"), P()),
        check_vma=False,
    ))

    tail = jnp.zeros(32, jnp.float32)
    got = []
    for i in range(3):
        xg = jax.device_put(jnp.asarray(x[i * b:(i + 1) * b]),
                            NamedSharding(mesh, P("d")))
        y, tail = smap(tail, xg)
        got.append(np.asarray(y))
    got = np.concatenate(got)

    ref_tail = jnp.zeros(32, jnp.float32)
    want = []
    for i in range(3):
        y, ref_tail = fir_overlap_save(taps, jnp.asarray(x[i * b:(i + 1) * b]),
                                       ref_tail)
        want.append(np.asarray(y))
    np.testing.assert_allclose(got, np.concatenate(want), atol=1e-5)


def test_gspmd_pipeline_matches_single_device(rng):
    """The GSPMD-auto sharded FM bank == the unsharded pipeline."""
    n_ch, fs, b = 16, 64000.0, 2048
    x = (rng.normal(size=(n_ch, b)) + 1j * rng.normal(size=(n_ch, b))
         ).astype(np.complex64)

    def build():
        p = Pipeline([IQBaseBand(fc=8000, width=10000, order=16, decim=4,
                                 design="textbook"), FMDemod()])
        p.bind(StreamSpec(np.complex64, fs, b, channels=(n_ch,)))
        return p

    p1 = build()
    c1, y1 = p1.apply(p1.init_carry(), cplx.as_block(x))

    p2 = build()
    mesh = make_mesh(n_channel=4, n_time=2)
    step, place, carry = shard_pipeline_step(p2, mesh)
    c2, y2 = step(carry, place(x))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-4)


def test_wideband_sharded_pipeline():
    """Sharded channelizer+demod == local channelizer+demod, and an FM tone
    in channel c demodulates correctly."""
    mesh = _mesh1d()
    m, b = 16, 16 * 512 * N_DEV  # channels, global block
    fs = 1_024_000.0
    step, init_carry, place = build_wideband_step(mesh, m, b)

    # FM-modulate a 1 kHz tone in channel 5 (center 5*fs/M).
    n = 2 * b
    audio = siggen.sine(fs, n, 1000.0, amps=0.7)
    iq = siggen.fm_modulate(fs, audio, deviation=8000.0,
                            carrier=5 * fs / m).astype(np.complex64)

    carry = init_carry()
    outs = []
    for i in range(2):
        carry, y = step(carry, place(iq[i * b:(i + 1) * b]))
        outs.append(np.asarray(y))
    y = np.concatenate(outs, axis=-1)
    assert y.shape == (m, n // m)

    # Channel 5 demodulates to the 1 kHz tone.  (Empty channels demodulate
    # to full-scale angle noise, so tone presence is a spectral check on the
    # target channel, not a power comparison.)
    ch_rate = fs / m
    seg = y[5][m:]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    freqs = np.fft.rfftfreq(len(seg), 1 / ch_rate)
    spec[freqs < 100] = 0
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 1000.0) < 30, peak
    # and the tone is coherent: strong line vs median bin
    assert spec.max() > 50 * np.median(spec)


def test_wideband_matches_local_channelizer(rng):
    """Bit-level check of the sharded channelizer stage vs the Processor."""
    mesh = _mesh1d()
    m, p = 8, 8
    b = 8 * m * N_DEV
    fs = 64000.0
    x = (rng.normal(size=(2 * b,)) + 1j * rng.normal(size=(2 * b,))
         ).astype(np.complex64)

    step, init_carry, place = build_wideband_step(mesh, m, b, taps_per_branch=p)
    carry = init_carry()
    got = []
    for i in range(2):
        carry, y = step(carry, place(x[i * b:(i + 1) * b]))
        got.append(np.asarray(y))
    got = np.concatenate(got, axis=-1)

    chan = Channelizer(n_channels=m, taps_per_branch=p)
    chan.bind(StreamSpec(np.complex64, fs, b))
    fm = FMDemod()
    fm.bind(chan.out_spec)
    cc, cf = chan.init_carry(), fm.init_carry()
    want = []
    for i in range(2):
        cc, yc = chan.apply(cc, cplx.as_block(x[i * b:(i + 1) * b]))
        cf, ya = fm.apply(cf, yc)
        want.append(np.asarray(ya))
    want = np.concatenate(want, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_sharded_scanner_matches_single_device():
    """The fully sharded scanner step (time-sharded channelizer ->
    all_to_all -> channel-sharded FM + ASK + bit-sync PLL) produces
    bit-identical PLL output to the n=1 path on the same wideband block."""
    import jax
    from jax.sharding import Mesh
    from libsdr_tpu.parallel.wideband import build_scanner_step

    m, n_dev = 16, 8
    fs = m * 25_000.0
    block = m * n_dev * 64 * 4
    rng = np.random.default_rng(11)
    x = (rng.normal(size=block) + 1j * rng.normal(size=block)
         ).astype(np.complex64) * 0.3

    outs = {}
    for n in (1, n_dev):
        mesh = Mesh(np.asarray(jax.devices()[:n]), ("d",))
        step, init_carry, place = build_scanner_step(mesh, m, block, fs)
        c = init_carry()
        c, bits = step(c, place(x))
        outs[n] = (np.asarray(bits.data), np.asarray(bits.valid))
    np.testing.assert_array_equal(outs[1][0] * outs[1][1],
                                  outs[n_dev][0] * outs[n_dev][1])
    np.testing.assert_array_equal(outs[1][1], outs[n_dev][1])
