"""FFT / FFT-filter-bank / channelizer tests (reference layer L4)."""

import jax.numpy as jnp
import numpy as np

from libsdr_tpu import StreamSpec
from libsdr_tpu.core import cplx
from libsdr_tpu.ops import siggen
from libsdr_tpu.ops.channelizer import Channelizer
from libsdr_tpu.ops.fft import fft
from libsdr_tpu.ops.fftfilter import FFTFilterBank

from tests.conftest import snr_db


def test_fft_matches_numpy(rng):
    for n in [64, 384, 1024, 2048, 4096]:
        x = (rng.normal(size=(2, n)) + 1j * rng.normal(size=(2, n))
             ).astype(np.complex64)
        y = cplx.to_numpy(fft(cplx.from_numpy(x)))
        assert snr_db(np.fft.fft(x), y) > 110, n
        yi = cplx.to_numpy(fft(cplx.from_numpy(x), inverse=True))
        assert snr_db(np.fft.ifft(x), yi) > 110, n


def test_fft_filter_bank_selects_bands():
    fs, b = 48000, 2048
    n = 16 * b
    tone_a = siggen.iq_carrier(fs, n, 5000.0)
    tone_b = siggen.iq_carrier(fs, n, -12000.0)
    x = (tone_a + tone_b).astype(np.complex64)

    bank = FFTFilterBank(bands=[(3000, 7000), (-14000, -10000)])
    spec = StreamSpec(jnp.complex64, fs, b)
    out_spec = bank.bind(spec)
    assert out_spec.channels == (2,)
    carry = bank.init_carry()
    outs = []
    for i in range(n // b):
        carry, y = bank.apply(carry, cplx.as_block(x[i * b:(i + 1) * b]))
        outs.append(cplx.to_numpy(y))
    y = np.concatenate(outs, axis=-1)[:, b:]  # skip first-block transient

    # Band 0 must contain the +5 kHz tone and reject the -12 kHz one.
    f0 = np.fft.fftfreq(y.shape[-1], 1 / fs)
    s0 = np.abs(np.fft.fft(y[0]))
    s1 = np.abs(np.fft.fft(y[1]))
    peak0 = f0[np.argmax(s0)]
    peak1 = f0[np.argmax(s1)]
    assert abs(peak0 - 5000) < 50, peak0
    assert abs(peak1 + 12000) < 50, peak1
    # rejection: energy of band 0 near -12 kHz is tiny
    near = lambda f, t: np.abs(f0 - t) < 500  # noqa: E731
    assert s0[near(f0, 5000)].max() > 100 * s0[near(f0, -12000)].max()


def test_fft_filter_bank_streaming_matches_oneshot(rng):
    """Overlap-add carry: streaming in 8 blocks == streaming in 4 double
    blocks is not required (block size is part of the transform), but the
    output must equal the reference overlap-add algorithm run in numpy."""
    fs, b = 8000, 256
    n = 8 * b
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    band = (500, 1500)
    bank = FFTFilterBank(bands=[band])
    bank.bind(StreamSpec(jnp.complex64, fs, b))
    carry = bank.init_carry()
    outs = []
    for i in range(n // b):
        carry, y = bank.apply(carry, cplx.as_block(x[i * b:(i + 1) * b]))
        outs.append(cplx.to_numpy(y)[0])
    got = np.concatenate(outs)

    # numpy re-statement of the reference loop (src/filternode.hh:163-181)
    from libsdr_tpu.ops.fftfilter import ref_band_kernel
    kern = ref_band_kernel(b, band[0], band[1], fs)
    last = np.zeros(b, np.complex128)
    ref = []
    for i in range(n // b):
        blk = np.concatenate([x[i * b:(i + 1) * b], np.zeros(b)])
        spec = np.fft.fft(blk) * kern
        tr = np.fft.ifft(spec)  # includes 1/2B
        ref.append(last + tr[:b])
        last = tr[b:]
    ref = np.concatenate(ref)
    assert snr_db(ref, got) > 90


def test_channelizer_tone_routing():
    """A tone in channel c must appear in output channel c, at its offset
    frequency, and nowhere else."""
    fs, m, b = 256000, 16, 4096
    n = 8 * b
    ch_width = fs / m  # 16 kHz
    # tone at channel 3 center + 2 kHz offset
    tone = siggen.iq_carrier(fs, n, 3 * ch_width + 2000.0)
    chan = Channelizer(n_channels=m, taps_per_branch=8)
    spec = StreamSpec(jnp.complex64, fs, b)
    out_spec = chan.bind(spec)
    assert out_spec.channels == (m,)
    assert float(out_spec.sample_rate) == fs / m
    carry = chan.init_carry()
    outs = []
    for i in range(n // b):
        carry, y = chan.apply(carry, cplx.as_block(tone[i * b:(i + 1) * b]))
        outs.append(cplx.to_numpy(y))
    y = np.concatenate(outs, axis=-1)[:, b // m:]

    power = (np.abs(y) ** 2).mean(axis=-1)
    assert np.argmax(power) == 3
    # adjacent-channel rejection
    others = np.delete(power, 3)
    assert power[3] > 1000 * others.max(), (power[3], others.max())
    # the offset inside the channel is preserved
    f = np.fft.fftfreq(y.shape[-1], m / fs)
    s = np.abs(np.fft.fft(y[3]))
    assert abs(f[np.argmax(s)] - 2000.0) < 20
    # magnitude preserved (unity passband)
    assert abs(np.abs(y[3]).mean() - 1.0) < 0.1


def test_channelizer_negative_band():
    fs, m, b = 64000, 8, 2048
    n = 8 * b
    tone = siggen.iq_carrier(fs, n, -(fs / m) * 2 + 500.0)  # channel M-2
    chan = Channelizer(n_channels=m, taps_per_branch=8)
    chan.bind(StreamSpec(jnp.complex64, fs, b))
    carry = chan.init_carry()
    outs = []
    for i in range(n // b):
        carry, y = chan.apply(carry, cplx.as_block(tone[i * b:(i + 1) * b]))
        outs.append(cplx.to_numpy(y))
    y = np.concatenate(outs, axis=-1)[:, b // m:]
    power = (np.abs(y) ** 2).mean(axis=-1)
    assert np.argmax(power) == m - 2


def test_fft_f64_double_precision(rng):
    """Double-precision host transform (the reference's FFTW f64 plan
    capability): ~1e-13 relative error where the f32 device path is ~1e-7."""
    from libsdr_tpu.ops.fft import fft_f64

    for n in (1000, 4096):
        x = (rng.normal(size=n) + 1j * rng.normal(size=n))
        got = fft_f64(x)
        ref = np.fft.fft(x)
        err = np.abs(got - ref).max() / np.abs(ref).max()
        assert err < 1e-12, (n, err)
        # inverse roundtrip at double precision
        back = fft_f64(got, inverse=True)
        assert np.abs(back - x).max() < 1e-12
