"""Fused AFSK front end: IQBaseBand + FMDemod + FSKDetector as ONE op.

Installed by the graph fusion pass (core/fuse.py) when an IQBaseBand feeds
a quadrature FMDemod feeding an FSKDetector — the AX.25/APRS receive chain
(reference wiring: examples/sdr_ax25.cc:109-175; per-sample loops:
src/baseband.hh:226-236 -> src/demod.hh:191-203 -> src/fsk.cc:68-87).

On wide channel banks the whole front end runs as ONE Pallas pass
(ops/pallas_fir_mxu.fir_afsk_exact): the decimating FIR's frame matmul
feeds the quadrature discriminator in registers, the FM audio is multiplied
by the audio-rate tone templates, the length-L correlator windows become
two banded-ones MXU matmuls, and only the mark-vs-space power difference
is thresholded to the uint8 symbol stream — neither the complex baseband
nor the FM audio ever exists in HBM.  This removed the largest per-mode
throughput gap (the XLA correlator pair ran the AX.25 chain ~16x slower
than the fused analog modes on the same hardware, tools/bench_rx_modes.py).

Narrow banks / other backends fall back to the exact XLA chain (overlap-
save FIR + fused demod + windowed correlator sums — identical math to the
unfused three-op pipeline with the NCO folded).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from libsdr_tpu.core import cplx
from libsdr_tpu.core.cplx import Complex
from libsdr_tpu.core.stream import StreamSpec
from libsdr_tpu.ops.fir import fir_overlap_save
from libsdr_tpu.ops.fm_fused import FMBasebandFused
from libsdr_tpu.ops.fsk import FSKDetector, sliding_sum


class AFSKFrontendFused(FMBasebandFused):
    """One-op AFSK receiver front end: raw IQ in, uint8 symbol stream out
    (at the decimated audio rate).  Built by core/fuse.py from
    [IQBaseBand -> FMDemod -> FSKDetector]; feeds BitStream (whose own
    Pallas PLL kernel completes the chain)."""

    def __init__(self, bb, demod, fsk: FSKDetector):
        super().__init__(bb, demod)
        self.fsk = fsk

    def _bind(self, in_spec: StreamSpec) -> StreamSpec:
        spec = super()._bind(in_spec)          # sets _g2/_t/_rot/_gain/...
        audio_fs = spec.rate_hz
        n_audio = spec.block_size
        L = int(audio_fs / self.fsk.baud)      # reference: src/fsk.cc:32
        self.corr_len = L
        i = np.arange(L)
        # Tone templates over one ring period (src/fsk.cc:39-49; positive
        # exponent), indexed by absolute audio sample index mod L.
        mark = np.exp(2j * np.pi * self.fsk.f_mark * i / audio_fs)
        space = np.exp(2j * np.pi * self.fsk.f_space * i / audio_fs)
        # Template block: rows [m_re, m_im, s_re, s_im, 0...] tiled to
        # n_audio + L so a dynamic lane slice at the carried phase n0 in
        # [0, L) yields T[(n0 + j) mod L] for j < n_audio — used by BOTH
        # the kernel and the XLA fallback (a (B,)-index gather from an
        # (L,) table lowers to a slow scatter/gather loop on the TPU VPU).
        reps = -(-(n_audio + L) // L)
        tiled = np.zeros((8, reps * L), np.float32)
        tiled[0] = np.tile(mark.real, reps)
        tiled[1] = np.tile(mark.imag, reps)
        tiled[2] = np.tile(space.real, reps)
        tiled[3] = np.tile(space.imag, reps)
        self._tpl = jnp.asarray(tiled[:, :n_audio + L])
        self._n_audio = n_audio
        return spec.with_(dtype=jnp.uint8)

    def init_carry(self):
        ch = self.in_spec.channels
        L = self.corr_len
        return (cplx.zeros(ch + (self._t - 1,), self.in_spec.real_dtype),
                cplx.full_like_phasor(ch) * cplx.constant(self._rot),
                jnp.zeros((), jnp.int32),
                cplx.zeros(ch + (L - 1,)),      # mark tone-product tail
                cplx.zeros(ch + (L - 1,)))      # space tone-product tail

    def apply(self, carry, x):
        tail, y_prev, n0, um_tail, us_tail = carry
        d, t, offset = self._decim, self._t, self._offset
        L = self.corr_len
        b = x.re.shape[-1]
        n_audio = b // d

        from libsdr_tpu.ops import fir as fir_mod
        use_k, interp = fir_mod.kernel_dispatch()
        if (use_k and x.re.ndim == 2 and x.re.shape[0] >= 64
                and offset == d - 1 and n_audio == self._n_audio):
            from libsdr_tpu.ops import pallas_fir_mxu as pfm
            if pfm.mxu_afsk_supported(t, d, x.re.shape[0], b, L,
                                      dtype=x.re.dtype):
                c = x.re.shape[0]
                s = pfm._S
                tpl = jax.lax.dynamic_slice(
                    self._tpl, (0, n0), (8, n_audio))
                # Seed lanes: prev-frame sample k reads global m = k - S;
                # the tail holds u[-(L-1)..-1] -> lanes S-(L-1)..S-1 of
                # each of the 4 lane groups (earlier lanes never read).
                up = jnp.zeros((c, 4 * s), jnp.float32)
                lo = s - (L - 1)
                up = jax.lax.dynamic_update_slice(up, um_tail.re, (0, lo))
                up = jax.lax.dynamic_update_slice(
                    up, um_tail.im, (0, s + lo))
                up = jax.lax.dynamic_update_slice(
                    up, us_tail.re, (0, 2 * s + lo))
                up = jax.lax.dynamic_update_slice(
                    up, us_tail.im, (0, 3 * s + lo))
                disc, y_last, ulast = pfm.fir_afsk_exact(
                    x, self._g2, d, tail, y_prev[..., None], self._rot,
                    self._gain, L, tpl, up, interpret=interp)
                sym = (disc > 0).astype(jnp.uint8)
                um2 = Complex(ulast[:, s - (L - 1):s],
                              ulast[:, 2 * s - (L - 1):2 * s])
                us2 = Complex(ulast[:, 3 * s - (L - 1):3 * s],
                              ulast[:, 4 * s - (L - 1):4 * s])
                return (x[..., b - (t - 1):], y_last[..., 0],
                        (n0 + n_audio) % L, um2, us2), sym

        # XLA path: overlap-save FIR + fused FM demod + windowed
        # correlator sums — the exact unfused-chain math (ops/fsk.py).
        y, new_tail = fir_overlap_save(self._g2, x, tail, stride=d,
                                       offset=offset)
        audio = self._demod(y, y_prev)
        tpl = jax.lax.dynamic_slice(self._tpl, (0, n0), (8, n_audio))
        u_m = Complex(tpl[0], tpl[1]) * audio
        u_s = Complex(tpl[2], tpl[3]) * audio
        s_m, um_tail = sliding_sum(um_tail, u_m, L)
        s_s, us_tail = sliding_sum(us_tail, u_s, L)
        disc = s_m.abs2() - s_s.abs2()          # src/fsk.cc:81-86
        sym = (disc > 0).astype(jnp.uint8)
        return (new_tail, y[..., -1], (n0 + n_audio) % L,
                um_tail, us_tail), sym
