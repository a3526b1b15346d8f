"""Pallas TPU kernel for the decimating complex FIR — the hot op of every
receive chain (the reference's per-sample ring MAC, src/baseband.hh:226-236,
already reformulated as overlap-save convolution in ops/fir.py).

Kernel strategy: one VMEM pass per (channel-tile x output-tile).  The
decimation-by-D window is phase-decomposed — ``y[j] = sum_p sum_k
taps[kD+p] * x[jD + kD + p]`` — so the inner loop is T contiguous shifted
vector FMAs over a (CT, WT_out, D)-framed tile: no strided loads, pure VPU
work, with both complex planes produced in the same pass (input streams from
HBM exactly once).

Measured on the v5e (128 ch x 512k block, 68 taps, D=4): 1.55 Gsps for this
kernel vs 3.7 Gsps for the XLA conv path it originally competed with; the
current default is the block-Toeplitz MXU matmul (ops/fir.py::_fir_matmul,
~9 Gsps standalone), so this kernel remains an alternative backend and the
worked example of the manual-DMA overlapping-window pattern (see also
pallas_fir_mxu.py for the MXU-matmul kernel variant).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libsdr_tpu.core.cplx import Complex


def _kernel(xr_hbm, xi_hbm, kr_ref, ki_ref, yr_ref, yi_ref,
            xr_s, xi_s, sem_r, sem_i, *, n_k: int, decim: int, wt: int,
            ct: int):
    """One tile.  Inputs arrive phase-deinterleaved: (C, D, L/D) with each
    row contiguous in (decimated) time, so every tap slice is a contiguous
    lane-dim slice.  The input windows of consecutive tiles overlap by the
    filter history (inexpressible with blocked BlockSpecs), so the kernel
    DMAs its own (ct, D, wt + n_k - 1) window from HBM to VMEM scratch.

    y[j] = sum_k sum_p k[k,p] * phase_p[j + k].
    """
    ci = pl.program_id(0)
    wi = pl.program_id(1)
    win = xr_s.shape[-1]  # wt + n_k - 1 rounded up to the 128-lane tiling
    cp_r = pltpu.make_async_copy(
        xr_hbm.at[pl.ds(ci * ct, ct), :, pl.ds(wi * wt, win)], xr_s, sem_r)
    cp_i = pltpu.make_async_copy(
        xi_hbm.at[pl.ds(ci * ct, ct), :, pl.ds(wi * wt, win)], xi_s, sem_i)
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()
    kr = kr_ref[:]
    ki = ki_ref[:]
    acc_r = jnp.zeros((ct, wt), jnp.float32)
    acc_i = jnp.zeros((ct, wt), jnp.float32)
    for k in range(n_k):
        for p in range(decim):
            xrs = xr_s[:, p, k:k + wt]
            xis = xi_s[:, p, k:k + wt]
            acc_r += kr[k, p] * xrs - ki[k, p] * xis
            acc_i += kr[k, p] * xis + ki[k, p] * xrs
    yr_ref[:] = acc_r
    yi_ref[:] = acc_i


@functools.partial(jax.jit,
                   static_argnames=("decim", "n_taps_pad", "interpret"))
def _fir_decim_pallas(xr, xi, kr, ki, decim: int, n_taps_pad: int,
                      interpret: bool = False):
    c, L = xr.shape
    n_k = n_taps_pad // decim
    b_out = (L - n_taps_pad) // decim + 1
    CT = min(c, 8)
    WT = min(b_out, 512)
    assert c % CT == 0 and b_out % WT == 0
    grid = (c // CT, b_out // WT)
    # DMA slices must be 128-lane aligned: round the window up and zero-pad
    # the input so every tile's slice stays in bounds.
    win = WT + 128 * ((n_k - 1 + 127) // 128)

    # Phase-deinterleave: (C, L) -> (C, D, L/D), row p = x[p::D] (one fused
    # XLA transpose; keeps every kernel slice contiguous in the lane dim).
    lp = L // decim
    xr3 = xr.reshape(c, lp, decim).transpose(0, 2, 1)
    xi3 = xi.reshape(c, lp, decim).transpose(0, 2, 1)
    lp_pad = (b_out - WT) + win
    if lp_pad > lp:
        pad = [(0, 0), (0, 0), (0, lp_pad - lp)]
        xr3 = jnp.pad(xr3, pad)
        xi3 = jnp.pad(xi3, pad)

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, decim=decim, wt=WT, ct=CT),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # xr stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # xi stays in HBM
            pl.BlockSpec((n_k, decim), lambda ci, wi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_k, decim), lambda ci, wi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CT, WT), lambda ci, wi: (ci, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, WT), lambda ci, wi: (ci, wi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((c, b_out), jnp.float32),
                   jax.ShapeDtypeStruct((c, b_out), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((CT, decim, win), jnp.float32),
            pltpu.VMEM((CT, decim, win), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * c * b_out * n_k * decim,
            bytes_accessed=2 * 4 * c * (L + b_out),
            transcendentals=0),
        interpret=interpret,
    )(xr3, xi3, kr, ki)
    return out


def fir_decim_pallas(taps: np.ndarray, x: Complex, tail: Complex,
                     decim: int, interpret: bool = False
                     ) -> Tuple[Complex, Complex]:
    """Overlap-save decimating complex FIR via the Pallas kernel.

    Semantics identical to ``fir_overlap_save(taps, x, tail, stride=decim,
    offset=decim-1)``: output j is the window ending at input sample
    ``decim-1 + j*decim``; tail carries the last T-1 inputs.

    Requires 2-D inputs (channels, block) with channels % 8 == 0 (or < 8)
    and block/decim % 512 == 0; callers fall back to the XLA conv path
    otherwise.
    """
    t = len(taps)
    # Pad taps at the OLD end (prepend zeros) to a multiple of decim; this
    # shifts the window start but keeps the window END at the same sample,
    # preserving alignment.
    pad = (-t) % decim
    taps_p = np.concatenate([np.zeros(pad, taps.dtype), np.asarray(taps)])
    tp = t + pad
    n_k = tp // decim
    # taps_p index i multiplies x[j*decim + (decim-1) - (tp-1) + i]; frame
    # decomposition: i = k*decim + p maps to frame j + k, phase p, when the
    # concatenated input starts at x[j*decim + decim - tp] — i.e. the tail
    # must hold tp - decim samples.
    k2 = taps_p.reshape(n_k, decim)
    kr = jnp.asarray(np.ascontiguousarray(k2.real), jnp.float32)
    ki = jnp.asarray(np.ascontiguousarray(k2.imag), jnp.float32)

    need_tail = tp - decim
    have_tail = tail.shape[-1]
    if have_tail >= need_tail:
        xt = Complex(
            jnp.concatenate([tail.re[..., have_tail - need_tail:], x.re], -1),
            jnp.concatenate([tail.im[..., have_tail - need_tail:], x.im], -1))
    else:
        z = jnp.zeros(x.shape[:-1] + (need_tail - have_tail,), jnp.float32)
        xt = Complex(jnp.concatenate([z, tail.re, x.re], -1),
                     jnp.concatenate([z, tail.im, x.im], -1))
    yr, yi = _fir_decim_pallas(xt.re, xt.im, kr, ki, decim, tp,
                               interpret=interpret)
    y = Complex(yr, yi)
    new_tail = Complex(
        jnp.concatenate([tail.re, x.re], -1)[..., -(t - 1):] if t > 1 else tail.re,
        jnp.concatenate([tail.im, x.im], -1)[..., -(t - 1):] if t > 1 else tail.im)
    return y, new_tail


def pallas_available(channels: int, block: int, decim: int) -> bool:
    """Shape gate for the kernel path."""
    if decim < 1:
        return False
    b_out = block // decim
    ct = min(channels, 8)
    wt = min(b_out, 512)
    return (channels % ct == 0 and b_out % wt == 0 and channels >= 1
            and b_out >= 8)
