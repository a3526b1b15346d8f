"""FSK/ASK symbol detection (reference: src/fsk.{hh,cc} FSKDetector and
ASKDetector).

The reference's FSKDetector is a per-sample dual tone correlator: it keeps
rings ``markHist[i] = x[n] * markLUT[n mod L]`` and decides
``|sum(markHist)|^2 - |sum(spaceHist)|^2 > 0`` — an O(L) loop per sample
(SURVEY.md 3.4 flags it as the hottest loop in the AX.25 chain).

TPU-native formulation: the ring sum at sample n is a *sliding window sum*
of ``u[k] = x[k] * T[k mod L]`` over the last L samples, so the whole
detector is one elementwise multiply by a tiled tone template plus a length-L
boxcar convolution per tone — O(1) per sample on the VPU/MXU instead of O(L).
The template phase is tied to the absolute sample index mod L (carry), which
reproduces the reference's ring indexing exactly, including the phase jump
where the tone template wraps (src/fsk.cc:40-49).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from libsdr_tpu.core import cplx
from libsdr_tpu.core.block import Processor
from libsdr_tpu.core.cplx import Complex
from libsdr_tpu.core.stream import StreamSpec
from libsdr_tpu.ops.fir import _conv1d_real


class FSKDetector(Processor):
    """Mark/space dual correlator -> symbol (sub-bit) stream at input rate.

    Args:
      baud: baud rate (sets correlator length L = floor(fs/baud),
        reference: src/fsk.cc:32).
      f_mark, f_space: tone frequencies in Hz.
    """

    def __init__(self, baud: float, f_mark: float, f_space: float):
        super().__init__()
        self.baud = float(baud)
        self.f_mark = float(f_mark)
        self.f_space = float(f_space)

    def _bind(self, in_spec: StreamSpec) -> StreamSpec:
        in_spec.require_real("FSKDetector")
        fs = in_spec.rate_hz
        L = int(fs / self.baud)
        self.corr_len = L
        b = in_spec.block_size
        i = np.arange(L)
        # Continuous-phase tone templates over one ring period
        # (reference: src/fsk.cc:39-49; positive exponent), pre-tiled to
        # block + L so the per-block template T[(n0 + j) mod L] is ONE
        # dynamic lane slice at the carried phase n0 — not a (B,)-index
        # gather from an (L,) table, which lowers to a slow scatter/gather
        # loop on the TPU VPU.
        mark = np.exp(2j * np.pi * self.f_mark * i / fs)
        space = np.exp(2j * np.pi * self.f_space * i / fs)
        reps = -(-(b + L) // L)
        self._mark = cplx.constant(np.tile(mark, reps)[:b + L])
        self._space = cplx.constant(np.tile(space, reps)[:b + L])
        return in_spec.with_(dtype=jnp.uint8)

    def init_carry(self):
        L = self.corr_len
        ch = self.in_spec.channels
        # (phase index n mod L, tail of last L-1 u_mark/u_space values)
        return (jnp.zeros((), jnp.int32),
                cplx.zeros(ch + (L - 1,)),
                cplx.zeros(ch + (L - 1,)))

    def apply(self, carry, x):
        import jax

        n0, tail_m, tail_s = carry
        L = self.corr_len
        b = self.in_spec.block_size
        x = x.astype(jnp.float32)
        # template phase n0: one dynamic slice of the pre-tiled template
        tm = Complex(jax.lax.dynamic_slice(self._mark.re, (n0,), (b,)),
                     jax.lax.dynamic_slice(self._mark.im, (n0,), (b,)))
        ts = Complex(jax.lax.dynamic_slice(self._space.re, (n0,), (b,)),
                     jax.lax.dynamic_slice(self._space.im, (n0,), (b,)))
        u_m = tm * x    # Complex * real array
        u_s = ts * x
        ones = np.ones(L, np.float32)

        def windowed_sum(tail, u):
            full = cplx.concatenate([tail, u], axis=-1)
            s = Complex(_conv1d_real(full.re, jnp.asarray(ones), 1),
                        _conv1d_real(full.im, jnp.asarray(ones), 1))
            new_tail = full[..., full.shape[-1] - (L - 1):]
            return s, new_tail

        s_m, tail_m = windowed_sum(tail_m, u_m)
        s_s, tail_s = windowed_sum(tail_s, u_s)
        f = s_m.abs2() - s_s.abs2()  # reference: src/fsk.cc:81-86
        sym = (f > 0).astype(jnp.uint8)
        return ((n0 + b) % L, tail_m, tail_s), sym


class ASKDetector(Processor):
    """Threshold-at-zero symbol detector (for FM-demodulated FSK, e.g.
    POCSAG; reference: src/fsk.hh:69-118): symbol = (x > 0) ^ invert."""

    def __init__(self, invert: bool = False):
        super().__init__()
        self.invert = invert

    def _bind(self, in_spec: StreamSpec) -> StreamSpec:
        in_spec.require_real("ASKDetector")
        return in_spec.with_(dtype=jnp.uint8)

    def apply(self, carry, x):
        sym = (x > 0)
        if self.invert:
            sym = jnp.logical_not(sym)
        return carry, sym.astype(jnp.uint8)
