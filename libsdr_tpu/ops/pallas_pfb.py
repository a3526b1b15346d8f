"""Pallas TPU kernel for the fused wideband receiver: polyphase channelizer
(+ optional quadrature FM demod bank) in ONE pass over the wideband stream.

Reference analog: the FilterNode overlap-add band bank
(/root/reference/src/filternode.hh:231-283) feeding per-band FMDemod chains
(/root/reference/src/demod.hh:242-254) — here generalized to the maximally
decimated PFB (ops/channelizer.py) and executed as one kernel.

Why: the XLA path (Channelizer.apply -> fft -> swapaxes -> demod) round-trips
the full-rate stream through HBM ~10x (PFB accumulate, the four-step FFT's
relayout transposes, the (t, M) -> (M, t) swap, the demod re-read), measuring
~2.2 Gsps on the 1024-channel flagship.  This kernel reads the wideband
block ONCE and writes ONLY the channel outputs (or only the f32 audio in the
fused-demod variant): the HBM floor.

DFT mapping chosen for the hardware (no in-kernel transposes — Mosaic cannot
reshape/permute VMEM minor dims cheaply):

    M = n2 * 128, lane q = 128*j2 + j1   (j1 in [0,128), j2 in [0,n2))
    X[n2*k1 + k2] = sum_j1 W128^(j1 k1)
                    * [ tw(j1,k2) * sum_j2 Wn2^(j2 k2) u[128*j2 + j1] ]

* stage A (VPU): the inner n2-point DFT combines whole 128-lane groups with
  scalar weights (exactly n2^2 scaled adds of (tt, 128) slabs; 0/±1 weights
  are folded at trace time),
* twiddle tw = exp(-2i pi j1 k2 / M): one (1, 128) complex multiply per k2,
* stage B (MXU): one (tt, 128) x (128, 128) complex matmul per k2 — full
  MXU rows/cols, Karatsuba 3-multiply, manual 3-pass bf16 split (~= XLA
  HIGH, which Mosaic cannot lower directly).

Channel c therefore lands on lane L = 128*(c mod n2) + c//n2 of a
TIME-MAJOR (frames, M) output — see :func:`lane_of_channel` /
:func:`channel_of_lane`.  Downstream per-channel ops (discriminator, ASK,
bit-sync scan) are lane-parallel and layout-agnostic; only channel *naming*
needs the map.

Data movement (measured on the v5e tunnel): Pallas's automatic block
pipeline sustains only ~47 GB/s on this shape, while the manual
double-buffered DMA pattern of ops/pallas_fir_mxu sustains ~200 GB/s — so
the kernel DMAs its own (tt, M) main blocks.  The P-frame polyphase history
is NOT a second (small, latency-bound) halo DMA: grid steps run
sequentially, so each step copies its block tail within VMEM into the other
slot's history rows for the next step, and the copy is ordered BEFORE the
next prefetch is started (the prefetch overwrites the rows it reads from).
The demod variant carries y[t-1] per lane exactly like the FM kernel
(sublane roll + carried (1, M) scratch row + per-block prev input).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libsdr_tpu.core.cplx import Complex
from libsdr_tpu.ops.pallas_fir_mxu import _atan2_poly

_LANES = 128
_VMEM_BUDGET = 12_500_000
_OK_DTYPES = (jnp.float32, jnp.bfloat16)


def _kernel_precision() -> str:
    """Follows ops.set_mxu_precision ('x3' high / 'x1' fast)."""
    from libsdr_tpu.ops import pallas_fir_mxu as pfm
    return pfm._PRECISION


def lane_of_channel(m: int) -> np.ndarray:
    """perm[c] = output lane carrying channel c (center freq c*fs/M).

    Identity for m <= 128 (single DFT slab — also the layout the XLA
    fallback paths use when the kernel shape gate rejects m)."""
    if m <= _LANES:
        return np.arange(m)
    n2 = m // _LANES
    c = np.arange(m)
    return _LANES * (c % n2) + c // n2


def channel_of_lane(m: int) -> np.ndarray:
    """inverse map: chan[L] = channel index on output lane L."""
    if m <= _LANES:
        return np.arange(m)
    n2 = m // _LANES
    lane = np.arange(m)
    return n2 * (lane % _LANES) + lane // _LANES


def _tt_for(m: int, f_total: int, p: int, itemsize: int,
            demod: bool = False) -> int:
    """Largest frame-tile (rows per grid step) fitting the VMEM budget.
    The tile must cover the polyphase depth (tt >= p): the history scratch
    refills from the block tail rows [tt-p, tt) and the pfb window slices
    assume k <= p <= tt."""
    for tt in (512, 256, 128, 64, 32, 16, 8):
        if f_total % tt or f_total < tt or tt < p:
            continue
        # bf16 HBM tiles are (16, 128): the main-DMA row offset (wi * tt)
        # must stay 16-aligned (same constraint as ct_align in
        # ops/pallas_fir_mxu.mxu_fir_supported).
        if itemsize == 2 and tt % 16:
            continue
        blocks = 2 * 2 * tt * m * itemsize          # double-buffered DMA
        win = 2 * (tt + p + 16) * m * itemsize      # assembled windows
        u = 2 * tt * m * 4                          # stage-A input values
        outs = (1 if demod else 2) * 2 * tt * m * 4  # pipelined outputs
        if demod:
            # constant-index carry/seed out blocks (ylr/yli/y0r/y0i) +
            # the (1, m) discriminator scratch planes
            outs += 4 * 8 * m * 4 + 2 * m * 4
        if blocks + win + u + outs + 1_000_000 <= _VMEM_BUDGET:
            return tt
    return 0


def mxu_pfb_supported(m: int, f_total: int, p: int,
                      dtype=jnp.float32, demod: bool = False) -> bool:
    """Shape/dtype gate (callers fall back to the XLA channelizer)."""
    dtype = jnp.dtype(dtype)
    if dtype not in (jnp.dtype(d) for d in _OK_DTYPES):
        return False
    if m % _LANES or not (1 <= m // _LANES <= 8):
        return False
    if p < 1 or p > 32 or f_total < p:
        return False
    return _tt_for(m, f_total, p, dtype.itemsize, demod) > 0


def _kernel_pfb(hr_ref, hi_ref, taps_ref, twr_ref, twi_ref, wr_ref, wim_ref,
                pr_in, pi_in, xr_hbm, xi_hbm, *refs, tt: int, m: int,
                n2: int, p: int, gain: float, demod: bool,
                precision: str = "x3"):
    if demod:
        (audio_ref, ylr_ref, yli_ref, y0r_ref, y0i_ref, wr_win, wi_win,
         gr_s, gi_s, pr_s, pi_s, sems) = refs
    else:
        yr_ref, yi_ref, wr_win, wi_win, gr_s, gi_s, pr_s, pi_s, sems = refs
    wi = pl.program_id(0)
    n_wi = pl.num_programs(0)
    slot = wi % 2

    # Manual double-buffered main DMA into FULL (tt, m) window buffers.
    # (A DMA into a partial destination slice — offset or not — faults this
    # backend's Mosaic: measured, worker crash.  So the DMA destination is
    # always a whole buffer, and the P history frames live in their own
    # (p, m) scratch, consumed by each polyphase term via a sublane concat.)
    def start_dma(slot_, wi_):
        main = pl.multiple_of(wi_ * tt, 8)
        pltpu.make_async_copy(xr_hbm.at[pl.ds(main, tt)],
                              wr_win.at[slot_],
                              sems.at[slot_, 0]).start()
        pltpu.make_async_copy(xi_hbm.at[pl.ds(main, tt)],
                              wi_win.at[slot_],
                              sems.at[slot_, 1]).start()

    def wait_dma(slot_):
        for scr, k in ((wr_win, 0), (wi_win, 1)):
            pltpu.make_async_copy(scr.at[slot_], scr.at[slot_],
                                  sems.at[slot_, k]).wait()

    @pl.when(wi == 0)
    def _():
        start_dma(0, 0)

    wait_dma(slot)

    # g = the P frames preceding this step's block (the carry on step 0,
    # else written from the previous block's tail at the end of last step).
    @pl.when(wi == 0)
    def _():
        gr_s[:] = hr_ref[:].astype(gr_s.dtype)
        gi_s[:] = hi_ref[:].astype(gi_s.dtype)
        if demod:
            pr_s[:] = pr_in[:]
            pi_s[:] = pi_in[:]

    @pl.when(wi + 1 < n_wi)
    def _():
        start_dma(1 - slot, wi + 1)

    # ---- polyphase MAC over P+1 shifted frame windows (VPU) -------------
    # Virtual frame window histf = [hist(p) | block(tt)]; term k covers
    # histf[p-k : p-k+tt] = hist rows [p-k, p) ++ block rows [0, tt-k).
    def pfb(win, g):
        acc = None
        for k in range(p + 1):
            if k == 0:
                seg = win[slot, 0:tt, :]
                term = seg.astype(jnp.float32) * taps_ref[k:k + 1, :]
            else:
                seg = jnp.concatenate(
                    [g[p - k:p, :], win[slot, 0:tt - k, :]], axis=0)
                term = seg.astype(jnp.float32) * taps_ref[k:k + 1, :]
            acc = term if acc is None else acc + term
        return acc

    ur = pfb(wr_win, gr_s)
    ui = pfb(wi_win, gi_s)

    # This block's tail becomes the next step's history (ordered after the
    # pfb reads of g by the anti-dependency; grid steps are sequential).
    gr_s[:] = wr_win[slot, tt - p:tt, :]
    gi_s[:] = wi_win[slot, tt - p:tt, :]

    # ---- stage B constants: Karatsuba triple with hi/lo bf16 split ------
    wr = wr_ref[:]
    wim = wim_ref[:]

    def split(a32):
        hi = a32.astype(jnp.bfloat16)
        return hi, (a32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    mats = [split(a) for a in (wr, wim, wr + wim)]
    dn = (((1,), (0,)), ((), ()))

    def rmm(x, mat):
        hi, lo = mat
        xh = x.astype(jnp.bfloat16)
        if precision == "x1":   # fast mode (ops.set_mxu_precision)
            return jax.lax.dot_general(xh, hi, dn,
                                       preferred_element_type=jnp.float32)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jax.lax.dot_general(xh, hi, dn,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(xh, lo, dn,
                                      preferred_element_type=jnp.float32)
                + jax.lax.dot_general(xl, hi, dn,
                                      preferred_element_type=jnp.float32))

    # Inner n2-point DFT weights, folded to immediates at trace time.
    w8 = np.exp(-2j * np.pi
                * np.outer(np.arange(n2), np.arange(n2)) / n2)
    if demod:
        ridx = jax.lax.broadcasted_iota(jnp.int32, (tt, _LANES), 0)

    for k2 in range(n2):
        # ---- stage A: A[k2] = sum_j2 Wn2[j2,k2] * u[:, 128*j2 + :] ------
        ar = ai = None

        def acc(a, b):
            return b if a is None else a + b

        for j2 in range(n2):
            sr = ur[:, _LANES * j2:_LANES * (j2 + 1)]
            si = ui[:, _LANES * j2:_LANES * (j2 + 1)]
            cr = float(w8[j2, k2].real)
            ci = float(w8[j2, k2].imag)
            if abs(cr) > 1e-12:
                ar = acc(ar, sr if cr == 1.0 else
                         (-sr if cr == -1.0 else cr * sr))
                ai = acc(ai, si if cr == 1.0 else
                         (-si if cr == -1.0 else cr * si))
            if abs(ci) > 1e-12:
                ar = acc(ar, si if ci == -1.0 else
                         (-si if ci == 1.0 else -ci * si))
                ai = acc(ai, sr if ci == 1.0 else
                         (-sr if ci == -1.0 else ci * sr))
        # ---- twiddle tw(j1, k2) (one complex (1,128) multiply) ----------
        if k2:
            twr = twr_ref[k2:k2 + 1, :]
            twi = twi_ref[k2:k2 + 1, :]
            apr = ar * twr - ai * twi
            api = ar * twi + ai * twr
        else:
            apr, api = ar, ai
        # ---- stage B: 128-point DFT as a full-width MXU matmul ----------
        ac = rmm(apr, mats[0])
        bd = rmm(api, mats[1])
        s = rmm(apr + api, mats[2])
        yr = ac - bd
        yi = s - ac - bd
        lo, hi_ = _LANES * k2, _LANES * (k2 + 1)
        if not demod:
            yr_ref[:, lo:hi_] = yr
            yi_ref[:, lo:hi_] = yi
        else:
            # Export the FIRST frame's y (pre-demod): the right neighbor's
            # true discriminator seed in the sharded wideband step
            # (parallel/wideband.py ppermutes y_last and re-demodulates
            # row 0 from it).  Constant-index out block — written once at
            # grid step 0, flushed at the end of the grid.
            @pl.when(wi == 0)
            def _():
                y0r_ref[0:1, lo:hi_] = yr[0:1, :]
                y0i_ref[0:1, lo:hi_] = yi[0:1, :]

            # quadrature discriminator: z = y[t] * conj(y[t-1]) per lane
            pr = pr_s[0:1, lo:hi_]
            pi = pi_s[0:1, lo:hi_]
            ypr = jnp.where(ridx == 0, pr, pltpu.roll(yr, 1, axis=0))
            ypi = jnp.where(ridx == 0, pi, pltpu.roll(yi, 1, axis=0))
            zr = yr * ypr + yi * ypi
            zi = yi * ypr - yr * ypi
            audio_ref[:, lo:hi_] = jnp.float32(gain) * _atan2_poly(zi, zr)
            pr_s[0:1, lo:hi_] = yr[tt - 1:tt, :]
            pi_s[0:1, lo:hi_] = yi[tt - 1:tt, :]

    if demod:
        # Export the discriminator carry (y of the final frame, per lane):
        # constant-index out block, so the last grid step's write is what
        # flushes — the caller's next-block prev without any recompute.
        ylr_ref[0:1, :] = pr_s[:]
        yli_ref[0:1, :] = pi_s[:]


_CONST_CACHE: dict = {}


def _consts(m: int, taps3: np.ndarray):
    """Device constants: taps, twiddles tw[k2, j1] = exp(-2i pi j1 k2 / M),
    and the 128-point DFT matrix.

    Cached by (m, taps bytes): rebuilding + re-uploading these every call
    costs ~6 ms through this environment's tunnel (measured via
    jax.profiler — it dominated the kernel itself), the same trap as the
    Toeplitz matrices in ops/pallas_fir_mxu._mats_on_device.  Uploads go
    through to_device_cached (eager under ensure_compile_time_eval, safe
    to reuse across traces)."""
    from libsdr_tpu.ops.pallas_fir_mxu import to_device_cached

    taps_np = np.asarray(taps3, np.float32)

    def build():
        n2 = m // _LANES
        j1 = np.arange(_LANES)
        k2 = np.arange(n2)
        tw = np.exp(-2j * np.pi * np.outer(k2, j1) / m)
        w = np.exp(-2j * np.pi * np.outer(j1, j1) / _LANES)
        return (taps_np,
                tw.real.astype(np.float32), tw.imag.astype(np.float32),
                w.real.astype(np.float32), w.imag.astype(np.float32))

    return to_device_cached(_CONST_CACHE, (int(m), taps_np.tobytes()),
                            build, cap=32)


@functools.partial(jax.jit, static_argnames=("m", "p", "tt", "gain",
                                             "demod", "precision",
                                             "interpret"))
def _pfb_call(xr, xi, hr, hi, taps, twr, twi, wr, wim, pr, pi, m: int,
              p: int, tt: int, gain: float, demod: bool,
              precision: str = "x3", interpret: bool = False):
    f_total = xr.shape[0]
    n2 = m // _LANES
    grid = (f_total // tt,)
    kernel = functools.partial(_kernel_pfb, tt=tt, m=m, n2=n2, p=p,
                               gain=gain, demod=demod, precision=precision)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((tt, m), lambda wi: (wi, 0),
                             memory_space=pltpu.VMEM)
    prev_block = pl.BlockSpec((8, m), lambda wi: (0, 0),
                              memory_space=pltpu.VMEM)
    if demod:
        out_shape = ([jax.ShapeDtypeStruct((f_total, m), jnp.float32)]
                     + [jax.ShapeDtypeStruct((8, m), jnp.float32)] * 4)
        out_specs = [out_block] + [prev_block] * 4
    else:
        out_shape = [jax.ShapeDtypeStruct((f_total, m), jnp.float32)] * 2
        out_specs = [out_block, out_block]
    n_read = xr.dtype.itemsize * 2 * f_total * m
    n_write = 4 * f_total * m * (1 if demod else 2)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vspec, vspec,                      # carry history planes (p, m)
            vspec,                             # taps3 (p+1, m)
            vspec, vspec,                      # twiddles (n2, 128)
            vspec, vspec,                      # W128 planes (128, 128)
            vspec, vspec,                      # prev-sample planes (1, m)
            pl.BlockSpec(memory_space=pl.ANY),  # wideband frame planes
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, tt, m), xr.dtype),       # window slots
            pltpu.VMEM((2, tt, m), xr.dtype),
            pltpu.VMEM((p, m), xr.dtype),           # history frames
            pltpu.VMEM((p, m), xr.dtype),
            pltpu.VMEM((1, m), jnp.float32),        # discriminator carry
            pltpu.VMEM((1, m), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * 3 * 2 * f_total * m * _LANES,
            bytes_accessed=n_read + n_write,
            transcendentals=f_total * m if demod else 0),
        interpret=interpret,
    )(hr, hi, taps, twr, twi, wr, wim, pr, pi, xr, xi)
    return outs


def pfb_mxu(x: Complex, hist: Complex, taps3: np.ndarray, m: int,
            gain: float = 1.0, prev: Optional[Complex] = None,
            demod: bool = False, interpret: bool = False):
    """Fused PFB channelizer over a framed wideband block.

    Args:
      x: (F, M) planar complex frames (``x1d.reshape(F, M)`` — free on TPU).
      hist: (P, M) planar carry frames (the Channelizer carry).
      taps3: (P+1, M) folded-commutator tap matrix
        (ops/channelizer.py::fold_commutator).
      m: channel count M (must be n2*128, n2 <= 8).
      gain: demod audio gain (demod variant).
      prev: (1, M) planar y[-1] per LANE (demod variant; seeds the
        discriminator chain across blocks).
      demod: False -> returns Complex (F, M) channel samples; True ->
        returns (f32 (F, M) FM audio, Complex (1, M) final channel sample
        per lane — the next block's ``prev`` — and Complex (1, M) FIRST
        channel sample per lane — the right neighbor's true seed in the
        sharded wideband step, parallel/wideband.py).

    Output lanes are channel-permuted: lane L carries channel
    ``channel_of_lane(m)[L]``.  Time-major: row t = frame t.
    """
    p = hist.re.shape[0]
    f_total = x.re.shape[0]
    tt = _tt_for(m, f_total, p, jnp.dtype(x.re.dtype).itemsize, demod)
    if tt <= 0:
        raise ValueError("pfb_mxu: unsupported shape (check "
                         "mxu_pfb_supported before calling)")
    taps, twr, twi, wr, wim = _consts(m, taps3)
    if prev is None:
        from libsdr_tpu.ops.pallas_fir_mxu import to_device_cached
        prev = to_device_cached(
            _CONST_CACHE, ("prev", m),
            lambda: Complex(np.ones((1, m), np.float32),
                            np.zeros((1, m), np.float32)))
    outs = _pfb_call(x.re, x.im, hr=hist.re.astype(jnp.float32),
                     hi=hist.im.astype(jnp.float32), taps=taps, twr=twr,
                     twi=twi, wr=wr, wim=wim,
                     pr=prev.re.astype(jnp.float32),
                     pi=prev.im.astype(jnp.float32), m=m, p=p, tt=tt,
                     gain=float(gain), demod=demod,
                     precision=_kernel_precision(), interpret=interpret)
    if demod:
        audio, ylr, yli, y0r, y0i = outs
        return (audio, Complex(ylr[0:1, :], yli[0:1, :]),
                Complex(y0r[0:1, :], y0i[0:1, :]))
    return Complex(outs[0], outs[1])
