"""Streaming FIR filtering via overlap-save — the TPU-native replacement for
the reference's per-sample ring-buffer FIR (reference: src/firfilter.hh:231-248).

The reference keeps the last ``order`` samples in a ring buffer and computes an
O(order) MAC per sample.  Here the ring buffer becomes an explicit
``tail`` carry of the last ``order-1`` input samples; each block is processed
as one batched convolution ``y[n] = sum_i k[i] * xc[n+i]`` over
``xc = concat(tail, x)`` — which XLA lowers onto the TPU MXU/VPU.  The initial
zero tail reproduces the reference's zero-initialized ring exactly
(reference: src/firfilter.hh:194).

Complex streams are planar (:mod:`libsdr_tpu.core.cplx`); complex*complex
convolutions use the 3-multiply Karatsuba decomposition into real convs.

Tap alignment matches the reference (src/firfilter.hh:238-243): ``k[N-1]``
multiplies the newest sample, so ``y[n] = sum_i k[i] * x[n-(N-1)+i]``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from libsdr_tpu.core import cplx
from libsdr_tpu.core.block import Processor
from libsdr_tpu.core.cplx import Complex
from libsdr_tpu.core.stream import ConfigError, StreamSpec
from libsdr_tpu.ops import firdesign


def _conv1d_real(x: jnp.ndarray, k: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """Batched real 1-D cross-correlation: y[..., j] = sum_i k[i] x[..., j*stride+i].

    x: (..., L) real; k: (T,) real; output (..., (L-T)//stride + 1).
    """
    lead = x.shape[:-1]
    xb = x.reshape((-1, 1, x.shape[-1]))  # (batch, feature=1, spatial)
    kb = k.reshape((1, 1, k.shape[0])).astype(x.dtype)  # (out_f, in_f, spatial)
    y = jax.lax.conv_general_dilated(
        xb, kb,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        # Default conv precision is bf16 on TPU; DSP filters need full f32.
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(lead + (y.shape[-1],))


def _conv1d_multi(x2: jnp.ndarray, kmat: jnp.ndarray,
                  stride: int) -> jnp.ndarray:
    """Multi-feature conv: x2 (..., F_in, L) with kernel (F_out, F_in, T)
    -> (..., F_out, L').  One pass over the input (HBM-bandwidth optimal)."""
    lead = x2.shape[:-2]
    f_in, L = x2.shape[-2], x2.shape[-1]
    xb = x2.reshape((-1, f_in, L))
    y = jax.lax.conv_general_dilated(
        xb, kmat.astype(x2.dtype),
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(lead + y.shape[-2:])


def _conv1d(x, k, stride: int = 1):
    """Cross-correlation for any real/planar-complex combination of x and k.

    Complex arithmetic is packed into the conv's feature dimensions so the
    input streams from HBM exactly once (the dominant cost — the op is
    bandwidth-bound on TPU): complex*complex is one conv with 2 input
    features and 2 output features.
    """
    k = np.asarray(k) if not isinstance(k, jnp.ndarray) else k
    k_c = np.iscomplexobj(k)
    x_c = isinstance(x, Complex)
    if not x_c and not k_c:
        return _conv1d_real(x, jnp.asarray(k, dtype=x.dtype), stride)
    if x_c and not k_c:
        # Real taps on a complex stream: fold re/im into the batch dim —
        # still a single conv pass.
        kr = jnp.asarray(k, dtype=x.re.dtype)
        stacked = jnp.stack([x.re, x.im], axis=0)  # (2, ..., L)
        y = _conv1d_real(stacked, kr, stride)
        return Complex(y[0], y[1])
    if not x_c and k_c:
        kmat = jnp.stack([jnp.asarray(k.real), jnp.asarray(k.imag)]
                         )[:, None, :]  # (2, 1, T)
        y = _conv1d_multi(x[..., None, :], kmat, stride)
        return Complex(y[..., 0, :], y[..., 1, :])
    # complex * complex: (re', im') = ((kr, -ki), (ki, kr)) . (re, im)
    kr = np.asarray(k.real, np.float32)
    ki = np.asarray(k.imag, np.float32)
    kmat = jnp.asarray(np.stack([np.stack([kr, -ki]),
                                 np.stack([ki, kr])]))  # (2, 2, T)
    x2 = jnp.stack([x.re, x.im], axis=-2)               # (..., 2, L)
    y = _conv1d_multi(x2, kmat, stride)
    return Complex(y[..., 0, :], y[..., 1, :])


def fir_overlap_save(taps, x, tail, stride: int = 1, offset: int = 0):
    """One overlap-save FIR block step.

    Args:
      taps: (T,) filter taps (numpy real or complex).
      x: (..., B) input block (real array or planar Complex).
      tail: (..., T-1) last samples of the previous block (zeros initially).
      stride: output decimation (output j is the window ending at input
        sample ``offset + j*stride``).
      offset: index of the first input sample that produces an output.

    Returns:
      (y, new_tail): y has trailing length ``(B - offset - 1)//stride + 1``;
      new_tail is the last T-1 samples of ``concat(tail, x)``.
    """
    t = int(np.asarray(taps).shape[0])
    xc = cplx.concatenate([tail, x], axis=-1) if t > 1 else x
    y = _conv1d(xc[..., offset:], taps, stride)
    new_tail = xc[..., xc.shape[-1] - (t - 1):] if t > 1 else tail
    return y, new_tail


class FIRFilter(Processor):
    """Streaming FIR filter node (reference: src/firfilter.hh FIRFilter +
    FIRLowPass/FIRHighPass/FIRBandPass/FIRBandStop specializations).

    Args:
      order: number of taps.
      kind: 'lowpass' | 'highpass' | 'bandpass' | 'bandstop' | 'custom'.
      fl, fu: band edges in Hz (lowpass uses fu, highpass uses fl, matching
        the reference's constructor conventions, src/firfilter.hh:276-305).
      taps: explicit taps for kind='custom'.
      design: 'textbook' (default) or 'ref' (reference-parity math; only
        lowpass has a working reference designer).
      decim: integer output decimation (keep-one-in-D after filtering).
      enabled: bypass flag (reference: src/firfilter.hh:134-137).
    """

    def __init__(self, order: int, kind: str = "lowpass", fl: float = 0.0,
                 fu: float = 0.0, taps: Optional[Sequence] = None,
                 design: str = "textbook", decim: int = 1,
                 enabled: bool = True):
        super().__init__()
        self.order = max(1, int(order))
        self.kind = kind
        self.fl, self.fu = float(fl), float(fu)
        self.design = design
        self.decim = int(decim)
        self.enabled = enabled
        self._custom_taps = None if taps is None else np.asarray(taps)
        self.taps: Optional[np.ndarray] = None

    def _design_taps(self, fs: float) -> np.ndarray:
        if self.kind == "custom":
            return self._custom_taps
        if self.design == "ref":
            if self.kind != "lowpass":
                raise ConfigError(
                    "reference-parity designer exists only for lowpass "
                    "(the reference's other designers are broken, "
                    "src/firfilter.hh:42-110)")
            return firdesign.ref_lowpass(self.order, self.fu, fs)
        d = {
            "lowpass": lambda: firdesign.lowpass(self.order, self.fu, fs),
            "highpass": lambda: firdesign.highpass(self.order, self.fl, fs),
            "bandpass": lambda: firdesign.bandpass(self.order, self.fl, self.fu, fs),
            "bandstop": lambda: firdesign.bandstop(self.order, self.fl, self.fu, fs),
        }
        if self.kind not in d:
            raise ConfigError(f"Unknown FIR kind {self.kind!r}")
        return d[self.kind]()

    def _bind(self, in_spec: StreamSpec) -> StreamSpec:
        if self.decim > 1:
            in_spec.require_block_multiple("FIRFilter", self.decim)
        self.taps = np.asarray(self._design_taps(in_spec.rate_hz))
        out_dtype = in_spec.dtype
        if np.iscomplexobj(self.taps) and not in_spec.is_complex:
            out_dtype = jnp.complex64
        return in_spec.with_(
            dtype=out_dtype,
            sample_rate=in_spec.sample_rate / self.decim,
            block_size=in_spec.block_size // self.decim)

    def init_carry(self):
        t = self.taps.shape[0]
        shape = self.in_spec.channels + (t - 1,)
        if self.in_spec.is_complex:
            return cplx.zeros(shape, self.in_spec.real_dtype)
        return jnp.zeros(shape, self.in_spec.dtype)

    def apply(self, carry, x):
        if not self.enabled:
            return carry, x
        y, tail = fir_overlap_save(
            self.taps, x, carry, stride=self.decim, offset=self.decim - 1)
        return tail, y
