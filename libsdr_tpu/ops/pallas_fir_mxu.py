"""Pallas TPU MXU kernel for the decimating complex FIR — the hot op of
every receive chain (reference per-sample loop: src/baseband.hh:226-236).

The XLA path (ops/fir.py::_fir_matmul) already casts the FIR as a
block-Toeplitz matmul, but XLA materializes the per-frame product P in HBM
(~0.7x the input size, written + re-read).  This kernel keeps P in VMEM:

  HBM traffic = read x once + write y once   (the bandwidth floor)

Backend facts that shaped the design (measured on the v5e):
  * small strided DMAs cost ~35us each -> ONE large DMA per plane per step;
  * reshapes of HBM arrays are physical relayout copies (tiled layouts) ->
    the kernel reads the natural 2-D (C, B) array and takes per-frame LANE
    slices of a 2-D VMEM scratch (sd is a multiple of 128, so every slice
    is tile-aligned and free);
  * the MXU wants 128 rows -> the channel tile is the whole channel bank
    (up to 128), and each frame is one (CT, SD) x (SD, 512) matmul;
  * Mosaic lowers only DEFAULT/HIGHEST dot precision -> f32 accuracy comes
    from a manual 3-pass bf16 split (identical error model to XLA HIGH).

Column layout of the Toeplitz matrix (S = outputs/frame = 128, spill group
padded to 128 so every lane slice is 128-aligned):

  [ Ar (S) | Ai (S) | Cr (128) | Ci (128) ]

  y_re = Xre@Ar - Xim@Ai + spill_re(next frame)
  y_im = Xre@Ai + Xim@Ar + spill_im(next frame)

Spill (windows of the last outputs of a frame reaching into the next frame)
is resolved locally: each step also DMAs a one-frame halo; for the final
frame tile the halo clamps in-bounds and poisons exactly the ``nsp``
block-tail outputs the overlap-save caller discards anyway.

Double buffering: scratch has a slot dimension; each grid step prefetches
the next step's input while the MXU chews on the current slot.

Measured on the v5e (128 ch x 512k block, 68 taps, D=4): **4.8 ms
(~14 Gsps) vs ~7.2 ms for the XLA block-Toeplitz matmul path** once the
Toeplitz matrix is cached (jax.profiler showed the apparent slowness was
~3 ms/call of host matrix rebuild + tunnel upload, not the kernel).  It is
the production backend for wide channel banks (>= 64 channels, where the
channel tile fills the MXU rows — ops/fir.py::_try_pallas_mxu); narrow
banks fall back to the XLA matmul, whose batched-frame shape suits them
better.
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

_S = 128          # outputs per frame
_NSP_PAD = 128    # spill column group width (>= ceil((T-1+offset)/stride))
_FT = 8           # max frames per grid step (shrunk to fit VMEM, see _ft_for)
_CT = 128         # channels per grid step (full MXU rows)
# 'x3': manual 3-pass bf16 split (~1e-5 rel err, equals XLA's HIGH; Mosaic
# itself only lowers DEFAULT/HIGHEST).  'highest': one f32 dot at bf16x6.
_PRECISION = "x3"
# Scratch budget: VMEM is 16 MB/core; leave headroom for the compiler's own
# temporaries (matrix bf16 hi/lo copies, register spills).
_VMEM_BUDGET = 13_500_000

# Input planes may be float32 or bfloat16 (AutoCast(compute='bfloat16')
# ingest): bf16 halves the input DMA traffic; the matmul accumulates in f32
# either way.  Scratch dtype follows the input.
_OK_DTYPES = (jnp.float32, jnp.bfloat16)


def _scratch_bytes(stride: int, ct: int, ft: int, itemsize: int,
                   afsk: bool = False) -> int:
    """Declared VMEM bytes for one kernel invocation (both planar FIR
    variants are bounded by the same buffers; the fm variant's audio output
    is half the fir variant's two planes).  ``afsk`` adds the fused-FSK-
    correlator-only buffers (tone templates, window matrices, u_prev/u_last
    carry blocks, u scratch) so the VMEM gate sizes ft against what the
    afsk mode actually declares, not just the FIR baseline."""
    sd = _S * stride
    ncols = 2 * _S + 2 * _NSP_PAD
    main = 2 * 2 * ct * ft * sd * itemsize      # 2 slots x 2 planes
    halo = 2 * 2 * ct * sd * itemsize
    mat = 2 * sd * ncols * 4                    # pipelined input block (x2)
    outs = 2 * 2 * ct * ft * _S * 4             # pipelined outputs (x2)
    total = main + halo + mat + outs
    if afsk:
        tpl = 2 * 8 * ft * _S * 4               # tone template block (x2)
        wmat = 2 * 2 * _S * _S * 4              # [W; Wp] (+ bf16 copies)
        uprev = 2 * ct * 4 * _S * 4             # u_prev in (x2)
        ulast = 2 * ct * 4 * _S * 4             # u_last out (x2)
        u_s = 4 * ct * _S * 4                   # correlator scratch
        total += tpl + wmat + uprev + ulast + u_s
    return total


def _ft_for(stride: int, channels: int, block: int, itemsize: int,
            afsk: bool = False) -> int:
    """Largest frames-per-step in {8, 4, 2, 1} whose scratch fits the VMEM
    budget and that tiles the block (0 when none does)."""
    ct = min(channels, _CT)
    sd = _S * stride
    for ft in (8, 4, 2, 1):
        if block % (ft * sd) == 0 and block // (ft * sd) >= 2 \
                and _scratch_bytes(stride, ct, ft, itemsize,
                                   afsk=afsk) <= _VMEM_BUDGET:
            return ft
    return 0


def mxu_fir_supported(taps_len: int, stride: int, offset: int,
                      channels: int, block: int,
                      dtype=jnp.float32) -> bool:
    """Shape/dtype/VMEM gate for the kernel (callers fall back to the XLA
    matmul)."""
    dtype = jnp.dtype(dtype)
    if dtype not in (jnp.dtype(d) for d in _OK_DTYPES):
        return False
    itemsize = dtype.itemsize
    sd = _S * stride
    nsp = -(-(taps_len - 1 + offset) // stride)
    ct = min(channels, _CT)
    # bf16 HBM tiles are (16, 128): row offsets must stay 16-aligned.
    ct_align = 16 if itemsize == 2 else 8
    return (stride > 1
            and nsp <= _NSP_PAD
            and offset + taps_len <= sd + stride
            and channels % ct == 0 and ct % ct_align == 0
            and _ft_for(stride, channels, block, itemsize) > 0)


def _build_mats(taps: np.ndarray, stride: int, offset: int) -> np.ndarray:
    """[Ar | Ai | Cr | Ci] (SD, 2S + 2*NSP_PAD) float32.

    A[m, s] = taps[m - (offset + s*stride)] (the window of output s inside
    its frame); C right-aligned: column (s - (S - NSP_PAD)) of C carries the
    tap tail of output s, read from the NEXT frame."""
    t = taps.shape[0]
    s = _S
    sd = s * stride
    taps = np.asarray(taps, np.complex128)
    a = np.zeros((sd, s), np.complex128)
    c = np.zeros((sd, _NSP_PAD), np.complex128)
    s_first = s - _NSP_PAD
    for ss in range(s):
        lo = offset + ss * stride
        n_in = min(t, sd - lo)
        a[lo:lo + n_in, ss] = taps[:n_in]
        if n_in < t:
            assert ss >= s_first, "spill wider than _NSP_PAD"
            c[:t - n_in, ss - s_first] = taps[n_in:]
    m = np.concatenate([a.real, a.imag, c.real, c.imag], axis=1)
    return m.astype(np.float32)


def _make_mm(m_ref, precision):
    """Per-frame MXU matmul closure over the Toeplitz matrix, dispatched on
    the input plane dtype (f32: manual multi-pass bf16 split; bf16 planes:
    2-pass against the split matrix — the data itself is already bf16)."""
    dn = (((1,), (0,)), ((), ()))
    m32 = m_ref[:]
    m_hi = m32.astype(jnp.bfloat16)
    m_lo = (m32 - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def mm(x):
        if x.dtype == jnp.bfloat16:
            if precision == "x1":
                # fast mode: single pass — tap rounding ~2^-9 relative, at
                # the fidelity of an 8-bit source (the data is bf16 anyway)
                return jax.lax.dot_general(
                    x, m_hi, dn, preferred_element_type=jnp.float32)
            # bf16 input planes (lossless for 8-bit sources): keep the
            # matrix hi/lo split so the FIR itself stays ~f32-accurate.
            return (jax.lax.dot_general(x, m_hi, dn,
                                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(x, m_lo, dn,
                                          preferred_element_type=jnp.float32))
        if precision == "x1":  # fast mode: 1-pass bf16
            return jax.lax.dot_general(
                x.astype(jnp.bfloat16), m_hi, dn,
                preferred_element_type=jnp.float32)
        if precision == "x3":
            # Manual 3-pass bf16 emulation of an f32 matmul (== XLA HIGH).
            x_hi = x.astype(jnp.bfloat16)
            x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return (jax.lax.dot_general(x_hi, m_hi, dn,
                                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(x_hi, m_lo, dn,
                                          preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(x_lo, m_hi, dn,
                                          preferred_element_type=jnp.float32))
        return jax.lax.dot_general(x, m32, dn,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    return mm


def _kernel(xr_hbm, xi_hbm, m_ref, yr_ref, yi_ref, xr_s, xi_s, hr_s, hi_s,
            sems, *, ct: int, ft: int, sd: int, b_total: int, precision):
    s = _S
    ci = pl.program_id(0)
    wi = pl.program_id(1)
    n_ci = pl.num_programs(0)
    n_wi = pl.num_programs(1)
    step = ci * n_wi + wi

    def start_dmas(slot, ci_, wi_):
        main = pl.multiple_of(wi_ * (ft * sd), 128)
        # Halo = the frame after the tile, clamped in-bounds for the final
        # tile (it poisons only the discarded block-tail outputs).
        halo = pl.multiple_of(jnp.minimum(main + ft * sd, b_total - sd), 128)
        row = pl.multiple_of(ci_ * ct, 8)
        for hbm, scr, hscr, k in ((xr_hbm, xr_s, hr_s, 0),
                                  (xi_hbm, xi_s, hi_s, 2)):
            pltpu.make_async_copy(
                hbm.at[pl.ds(row, ct), pl.ds(main, ft * sd)],
                scr.at[slot], sems.at[slot, k]).start()
            pltpu.make_async_copy(
                hbm.at[pl.ds(row, ct), pl.ds(halo, sd)],
                hscr.at[slot], sems.at[slot, k + 1]).start()

    def wait_dmas(slot):
        for k in (0, 2):
            pltpu.make_async_copy(xr_s.at[slot], xr_s.at[slot],
                                  sems.at[slot, k]).wait()
            pltpu.make_async_copy(hr_s.at[slot], hr_s.at[slot],
                                  sems.at[slot, k + 1]).wait()

    slot = step % 2

    @pl.when(step == 0)
    def _():
        start_dmas(0, ci, wi)

    @pl.when(step + 1 < n_ci * n_wi)
    def _():
        nxt_wrap = wi + 1 == n_wi
        start_dmas(1 - slot,
                   jnp.where(nxt_wrap, ci + 1, ci),
                   jnp.where(nxt_wrap, 0, wi + 1))

    wait_dmas(slot)
    mm = _make_mm(m_ref, precision)

    # One (CT, SD) x (SD, 512) matmul per frame — pure lane slices, no
    # reshapes.  ft+1 products: ft frames + the halo frame for spill.
    p_r = [mm(xr_s[slot, :, f * sd:(f + 1) * sd]) for f in range(ft)]
    p_i = [mm(xi_s[slot, :, f * sd:(f + 1) * sd]) for f in range(ft)]
    p_r.append(mm(hr_s[slot]))
    p_i.append(mm(hi_s[slot]))
    for f in range(ft):
        yr = p_r[f][:, :s] - p_i[f][:, s:2 * s]
        yi = p_i[f][:, :s] + p_r[f][:, s:2 * s]
        nr, ni = p_r[f + 1], p_i[f + 1]
        # Spill group width == S: right-aligned add with no padding.
        yr_ref[:, f * s:(f + 1) * s] = yr + (
            nr[:, 2 * s:3 * s] - ni[:, 3 * s:])
        yi_ref[:, f * s:(f + 1) * s] = yi + (
            ni[:, 2 * s:3 * s] + nr[:, 3 * s:])


@functools.partial(jax.jit, static_argnames=("stride", "ft", "precision",
                                             "interpret"))
def _fir_mxu_call(xr, xi, m, stride: int, ft: int, precision: str = "x3",
                  interpret: bool = False):
    c, b = xr.shape
    sd = _S * stride
    ct = min(c, _CT)
    f_total = b // sd
    grid = (c // ct, f_total // ft)
    n_out = f_total * _S
    ncols = 2 * _S + 2 * _NSP_PAD
    out = pl.pallas_call(
        functools.partial(_kernel, ct=ct, ft=ft, sd=sd, b_total=b,
                          precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((sd, ncols), lambda ci, wi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ct, ft * _S), lambda ci, wi: (ci, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, ft * _S), lambda ci, wi: (ci, wi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((c, n_out), jnp.float32),
                   jax.ShapeDtypeStruct((c, n_out), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((2, ct, ft * sd), xr.dtype),
            pltpu.VMEM((2, ct, ft * sd), xr.dtype),
            pltpu.VMEM((2, ct, sd), xr.dtype),
            pltpu.VMEM((2, ct, sd), xr.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * c * (f_total + f_total // ft) * sd * ncols,
            bytes_accessed=xr.dtype.itemsize * 2 * c * b + 4 * 2 * c * n_out,
            transcendentals=0),
        interpret=interpret,
    )(xr, xi, m)
    return Complex(out[0], out[1])


_MAT_CACHE_NP: dict = {}
_MAT_CACHE_DEV: dict = {}


def to_device_cached(cache: dict, key, build_np, cap: int = 64):
    """Device-resident constant pytree, cached ACROSS traces.

    ``build_np()`` produces the numpy value on a miss; the device upload
    runs under :func:`jax.ensure_compile_time_eval`, so even when first
    touched inside a jit/shard_map trace it evaluates eagerly to a plain
    committed array (safe to reuse by any later trace, where it folds as a
    compile-time constant).  Keyed additionally by backend so CPU tests and
    the TPU path never share buffers.  This replaces the old private
    trace-state probe (jax._src.core.trace_state_clean) — caching is now
    unconditionally safe, so no probe is needed.

    Why a cache at all: rebuilding + re-uploading these constants costs
    ~1.6 ms host numpy + ~1.4 ms tunnel upload PER STEP on this
    environment — it dominated the kernel's own runtime when done eagerly
    (found via jax.profiler)."""
    key = (key, jax.default_backend())
    m = cache.get(key)
    if m is None:
        with jax.ensure_compile_time_eval():
            m = jax.tree_util.tree_map(jnp.asarray, build_np())
        if len(cache) > cap:
            cache.clear()
        cache[key] = m
    return m


def _mats_on_device(taps: np.ndarray, stride: int, offset: int):
    """Toeplitz matrix, cached by (taps, stride, offset) — numpy build and
    device upload both cached (see :func:`to_device_cached`)."""
    key = (taps.tobytes(), int(stride), int(offset), _S, _NSP_PAD)
    m_np = _MAT_CACHE_NP.get(key)
    if m_np is None:
        m_np = _build_mats(taps, stride, offset)
        if len(_MAT_CACHE_NP) > 64:
            _MAT_CACHE_NP.clear()
        _MAT_CACHE_NP[key] = m_np
    return to_device_cached(_MAT_CACHE_DEV, key, lambda: m_np)


def fir_mxu(x: Complex, taps: np.ndarray, stride: int, offset: int,
            interpret: bool = False) -> Tuple[Complex, int]:
    """All in-block FIR outputs (window start offset + j*stride) for a 2-D
    planar-complex block via the fused MXU kernel.

    Returns (y, nsp): y has (B // (S*stride)) * S outputs of which the final
    ``nsp`` are invalid (they need next-block data) — identical contract to
    ops.fir._fir_matmul."""
    taps = np.asarray(taps)
    c, b = x.re.shape
    ft = _ft_for(stride, c, b, jnp.dtype(x.re.dtype).itemsize)
    y = _fir_mxu_call(x.re, x.im, _mats_on_device(taps, stride, offset),
                      stride, ft, precision=_PRECISION, interpret=interpret)
    return y, _NSP_PAD


# ---------------------------------------------------------------------------
# Fused FIR + FM discriminator kernel — the whole FM front end in one pass.
#
# After the FIR saturates HBM bandwidth, the remaining chain cost is the
# complex baseband y being written to HBM (0.5x input) and re-read (twice,
# shifted) by the quadrature discriminator.  This kernel keeps y in
# registers: per frame it computes y, forms z = y[j] * conj(y[j-1]) * rot
# (rot = the NCO rotation folded in by core/fuse.py), and writes ONLY the
# f32 audio.  atan2 is a 6-term odd minimax polynomial (|err| < 2e-5 rad;
# Mosaic has no atan primitive — the reference itself ships a fast integer
# atan2 for the same reason, src/math.hh:12-40).
#
# The j-1 dependency: within a frame it is a lane roll; across frames the
# previous frame's last column is at hand; across GRID STEPS a (ct, 1)
# scratch persists (grid steps run sequentially, frame-tile index minor);
# at each channel tile's first step the scratch seeds from the lead input
# (the last lead output, computed by the XLA side from the carry tail).
# ---------------------------------------------------------------------------


def _atan2_poly(y, x):
    """Full-quadrant atan2 from elementwise primitives, |err| < ~2e-5 rad."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    t = mn / jnp.maximum(mx, 1e-30)
    s = t * t
    p = jnp.float32(-0.0117212)
    for c in (0.05265332, -0.11643287, 0.19354346, -0.33262347, 0.99997726):
        p = p * s + jnp.float32(c)
    r = t * p
    r = jnp.where(ay > ax, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, jnp.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def _kernel_fm(xr_hbm, xi_hbm, m_ref, lr_hbm, li_hbm, dm_ref, dl_hbm,
               *refs, ct: int, ft: int, sd: int, b_total: int, precision,
               rot_re: float, rot_im: float, gain: float, deemph: bool,
               mode: str = "fm"):
    if mode == "am" and deemph:
        # AM+AGC epilogue: |y| envelope, AGC state IIR via the same
        # impulse-response matmul as de-emphasis, exported per channel.
        audio_ref, sd_ref, xr_s, xi_s, hr_s, hi_s, pr_s, pi_s, dp_s, \
            sems = refs
    else:
        audio_ref, xr_s, xi_s, hr_s, hi_s, pr_s, pi_s, dp_s, sems = refs
    s = _S
    ci = pl.program_id(0)
    wi = pl.program_id(1)
    n_ci = pl.num_programs(0)
    n_wi = pl.num_programs(1)
    step = ci * n_wi + wi

    def start_dmas(slot, ci_, wi_):
        main = pl.multiple_of(wi_ * (ft * sd), 128)
        halo = pl.multiple_of(jnp.minimum(main + ft * sd, b_total - sd), 128)
        row = pl.multiple_of(ci_ * ct, 8)
        for hbm, scr, hscr, k in ((xr_hbm, xr_s, hr_s, 0),
                                  (xi_hbm, xi_s, hi_s, 2)):
            pltpu.make_async_copy(
                hbm.at[pl.ds(row, ct), pl.ds(main, ft * sd)],
                scr.at[slot], sems.at[slot, k]).start()
            pltpu.make_async_copy(
                hbm.at[pl.ds(row, ct), pl.ds(halo, sd)],
                hscr.at[slot], sems.at[slot, k + 1]).start()

    def wait_dmas(slot):
        for k in (0, 2):
            pltpu.make_async_copy(xr_s.at[slot], xr_s.at[slot],
                                  sems.at[slot, k]).wait()
            pltpu.make_async_copy(hr_s.at[slot], hr_s.at[slot],
                                  sems.at[slot, k + 1]).wait()

    slot = step % 2

    @pl.when(step == 0)
    def _():
        start_dmas(0, ci, wi)

    @pl.when(step + 1 < n_ci * n_wi)
    def _():
        nxt_wrap = wi + 1 == n_wi
        start_dmas(1 - slot,
                   jnp.where(nxt_wrap, ci + 1, ci),
                   jnp.where(nxt_wrap, 0, wi + 1))

    wait_dmas(slot)

    # Seed the cross-step y[j-1] scratch at each channel tile's first step
    # with the last lead output (BlockSpec'd (ct, 1) slice of the lead
    # input, constant in wi).
    @pl.when(wi == 0)
    def _():
        pr_s[:] = lr_hbm[:]
        pi_s[:] = li_hbm[:]
        if deemph:
            dp_s[:] = dl_hbm[:]

    mm = _make_mm(m_ref, precision)

    p_r = [mm(xr_s[slot, :, f * sd:(f + 1) * sd]) for f in range(ft)]
    p_i = [mm(xi_s[slot, :, f * sd:(f + 1) * sd]) for f in range(ft)]
    p_r.append(mm(hr_s[slot]))
    p_i.append(mm(hi_s[slot]))
    col = jax.lax.broadcasted_iota(jnp.int32, (ct, s), 1)
    prev_r = pr_s[:]
    prev_i = pi_s[:]
    if deemph:
        # dm rows [0:s] = Lb (Lb[m, j] = b * a^(j-m), m <= j); row s = a^(j+1).
        dmat = dm_ref[:s, :]
        dpow = dm_ref[s:s + 1, :]
        dprev = dp_s[:]
        # 3-pass bf16 split (~= XLA HIGH, 1e-5): HIGHEST here (bf16x6)
        # measurably costs headline throughput — this dot runs once per
        # frame at s x s.
        dm_hi = dmat.astype(jnp.bfloat16)
        dm_lo = (dmat - dm_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn_d = (((1,), (0,)), ((), ()))

        def dmm(v):
            v_hi = v.astype(jnp.bfloat16)
            v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return (jax.lax.dot_general(v_hi, dm_hi, dn_d,
                                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(v_hi, dm_lo, dn_d,
                                          preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(v_lo, dm_hi, dn_d,
                                          preferred_element_type=jnp.float32))
    for f in range(ft):
        yr = p_r[f][:, :s] - p_i[f][:, s:2 * s]
        yi = p_i[f][:, :s] + p_r[f][:, s:2 * s]
        nr, ni = p_r[f + 1], p_i[f + 1]
        yr = yr + (nr[:, 2 * s:3 * s] - ni[:, 3 * s:])
        yi = yi + (ni[:, 2 * s:3 * s] + nr[:, 3 * s:])
        if mode == "am":
            # AM envelope (rotation-invariant: the NCO vanishes outright).
            sig = jnp.sqrt(yr * yr + yi * yi)
            if deemph:   # AGC: sd IIR on the envelope, then out = g*sig/sd
                sdv = dmm(sig) + dprev * dpow
                dprev = sdv[:, s - 1:s]
                au = jnp.float32(gain) * sig / sdv
            else:
                au = jnp.float32(gain) * sig
            audio_ref[:, f * s:(f + 1) * s] = au
            continue
        # y[j-1]: lane roll, column 0 patched with the carried value.
        ypr = jnp.where(col == 0, prev_r, pltpu.roll(yr, 1, axis=1))
        ypi = jnp.where(col == 0, prev_i, pltpu.roll(yi, 1, axis=1))
        # z = y * conj(y_prev) * rot
        zr = yr * ypr + yi * ypi
        zi = yi * ypr - yr * ypi
        zr2 = zr * jnp.float32(rot_re) - zi * jnp.float32(rot_im)
        zi2 = zr * jnp.float32(rot_im) + zi * jnp.float32(rot_re)
        au = jnp.float32(gain) * _atan2_poly(zi2, zr2)
        if deemph:
            # In-frame de-emphasis via the impulse-response matmul plus the
            # carried state (state == previous deemphasized output).
            au = dmm(au) + dprev * dpow
            dprev = au[:, s - 1:s]
        audio_ref[:, f * s:(f + 1) * s] = au
        prev_r = yr[:, s - 1:s]
        prev_i = yi[:, s - 1:s]
    if mode == "am":
        if deemph:
            dp_s[:] = dprev
            sd_ref[:] = dprev     # AGC state export (next block's lead)
        return
    pr_s[:] = prev_r
    pi_s[:] = prev_i
    if deemph:
        dp_s[:] = dprev


@functools.partial(jax.jit, static_argnames=("stride", "ft", "rot_re",
                                             "rot_im", "gain", "deemph",
                                             "mode", "precision",
                                             "interpret"))
def _fir_fm_call(xr, xi, m, lead_r, lead_i, dmat, dlead, stride: int,
                 ft: int, rot_re: float, rot_im: float, gain: float,
                 deemph: bool = False, mode: str = "fm",
                 precision: str = "x3", interpret: bool = False):
    c, b = xr.shape
    sd = _S * stride
    ct = min(c, _CT)
    f_total = b // sd
    grid = (c // ct, f_total // ft)
    n_out = f_total * _S
    ncols = 2 * _S + 2 * _NSP_PAD
    return pl.pallas_call(
        functools.partial(_kernel_fm, ct=ct, ft=ft, sd=sd, b_total=b,
                          precision=precision, rot_re=rot_re,
                          rot_im=rot_im, gain=gain, deemph=deemph,
                          mode=mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((sd, ncols), lambda ci, wi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 1), lambda ci, wi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 1), lambda ci, wi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_S + 8, _S), lambda ci, wi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ct, 1), lambda ci, wi: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=([pl.BlockSpec((ct, ft * _S), lambda ci, wi: (ci, wi),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((ct, 1), lambda ci, wi: (ci, 0),
                                 memory_space=pltpu.VMEM)]
                   if (mode == "am" and deemph) else
                   pl.BlockSpec((ct, ft * _S), lambda ci, wi: (ci, wi),
                                memory_space=pltpu.VMEM)),
        out_shape=([jax.ShapeDtypeStruct((c, n_out), jnp.float32),
                    jax.ShapeDtypeStruct((c, 1), jnp.float32)]
                   if (mode == "am" and deemph) else
                   jax.ShapeDtypeStruct((c, n_out), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((2, ct, ft * sd), xr.dtype),
            pltpu.VMEM((2, ct, ft * sd), xr.dtype),
            pltpu.VMEM((2, ct, sd), xr.dtype),
            pltpu.VMEM((2, ct, sd), xr.dtype),
            pltpu.VMEM((ct, 1), jnp.float32),
            pltpu.VMEM((ct, 1), jnp.float32),
            pltpu.VMEM((ct, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * c * (f_total + f_total // ft) * sd * ncols,
            bytes_accessed=(xr.dtype.itemsize * 2 * c * b + 4 * c * n_out),
            transcendentals=c * n_out),
        interpret=interpret,
    )(xr, xi, m, lead_r, lead_i, dmat, dlead)


_DEEMPH_CACHE: dict = {}


def _deemph_mat(a: float, b: float) -> np.ndarray:
    """(S+8, S) f32: rows [0:S] = Lb[m, j] = b * a^(j-m) (m <= j),
    row S = a^(j+1) (the carried-state weights); padding rows zero."""
    key = (float(a), float(b), _S)
    m = _DEEMPH_CACHE.get(key)
    if m is None:
        j = np.arange(_S)
        e = j[None, :] - j[:, None]
        lb = np.where(e >= 0, b * np.power(float(a), np.maximum(e, 0)), 0.0)
        m = np.zeros((_S + 8, _S), np.float64)
        m[:_S] = lb
        m[_S] = np.power(float(a), j + 1)
        m = m.astype(np.float32)
        _DEEMPH_CACHE[key] = m
    return m


def fir_fm_mxu(x: Complex, taps: np.ndarray, stride: int, offset: int,
               lead_last: Complex, rot: complex, gain: float,
               deemph_ab=None, deemph_lead=None, mode: str = "fm",
               interpret: bool = False):
    """Fused decimating FIR + quadrature FM discriminator (+ optional
    first-order de-emphasis): returns (audio, nsp) where audio[j] = gain *
    angle(y[j] * conj(y[j-1]) * rot), optionally run through
    y'[j] = a*y'[j-1] + b*audio[j], for the in-block outputs (same frame
    layout and garbage-tail contract as :func:`fir_mxu`).

    ``lead_last`` is y[-1] (the last lead output) as (C, 1) planar Complex;
    ``deemph_ab`` = (a, b) coefficients, ``deemph_lead`` = (C, 1) f32
    de-emphasis state after the lead outputs.

    ``mode='am'``: AM+AGC epilogue instead — audio[j] = gain * |y[j]|
    (optionally / sd[j] with the AGC envelope IIR sd' = a*sd + b*|y| when
    ``deemph_ab`` is given, ``gain`` then carrying target/4).  Returns
    (audio, sd_state (C, 1), nsp) in that case — sd_state seeds the next
    block's ``deemph_lead``; lead_last/rot are ignored (|y| is rotation
    invariant)."""
    taps = np.asarray(taps)
    if not np.iscomplexobj(taps):
        taps = taps.astype(np.complex128)
    rot = complex(rot)
    c = x.re.shape[0]
    use_deemph = deemph_ab is not None
    if use_deemph:
        dmat = jnp.asarray(_deemph_mat(*deemph_ab))
        dlead = deemph_lead
    else:
        dmat = jnp.zeros((_S + 8, _S), jnp.float32)
        dlead = jnp.zeros((c, 1), jnp.float32)
    b = x.re.shape[-1]
    ft = _ft_for(stride, c, b, jnp.dtype(x.re.dtype).itemsize)
    # The prev-sample / deemph-state scratches are f32 regardless of the
    # input plane dtype (bf16 ingest); normalize the tiny lead inputs.
    out = _fir_fm_call(x.re, x.im, _mats_on_device(taps, stride, offset),
                       lead_last.re.astype(jnp.float32),
                       lead_last.im.astype(jnp.float32),
                       dmat, dlead.astype(jnp.float32), stride,
                       ft, float(rot.real), float(rot.imag), float(gain),
                       deemph=use_deemph, mode=mode, precision=_PRECISION,
                       interpret=interpret)
    if mode == "am" and use_deemph:
        audio, sd_state = out
        return audio, sd_state, _NSP_PAD
    return out, _NSP_PAD


# ---------------------------------------------------------------------------
# Exact-tiling FIR+FM kernel (v2): with the standard overlap-save offset
# (first output window ENDING at sample stride-1), the output windows tile
# the frames exactly — window j ends at sample (j+1)*stride-1, so no window
# ever crosses its frame's END.  Early windows of each frame instead reach
# BACK into the previous frame (or the carry tail for frame 0), which the
# kernel resolves with the PREVIOUS frame's matmul product — already
# computed one iteration earlier (a (ct, ncols) scratch carries it across
# grid steps; the block's frame -1 is the zero-padded carry tail, one extra
# matmul at each channel tile's first step).
#
# Consequences vs the v1 kernel: no halo DMAs, no spill garbage, no
# lead/rest XLA segments and — decisively — no full-rate audio concat in
# the caller: the kernel emits EXACTLY block/stride outputs.  Measured at
# the bench config the v1 chain lost ~10 ms/iter to that concat.
# ---------------------------------------------------------------------------


def _build_mats2(taps: np.ndarray, stride: int) -> np.ndarray:
    """[Ar | Ai | Cr | Ci] (SD, 2S + 2*NSP_PAD) float32 for the v2 layout.

    Window of in-frame output ss starts at lo = stride - T + ss*stride
    (ends at (ss+1)*stride - 1).  A holds the current-frame taps
    (rows >= 0); C holds the PREVIOUS-frame taps (rows sd+lo .. sd-1) for
    the early windows with lo < 0, LEFT-aligned (column ss)."""
    t = taps.shape[0]
    s = _S
    sd = s * stride
    taps = np.asarray(taps, np.complex128)
    a = np.zeros((sd, s), np.complex128)
    c = np.zeros((sd, _NSP_PAD), np.complex128)
    for ss in range(s):
        lo = stride - t + ss * stride
        for i in range(t):
            m = lo + i
            if m >= 0:
                a[m, ss] = taps[i]
            else:
                assert ss < _NSP_PAD, "left spill wider than _NSP_PAD"
                c[sd + m, ss] = taps[i]
    m2 = np.concatenate([a.real, a.imag, c.real, c.imag], axis=1)
    return m2.astype(np.float32)


def mxu_fir2_supported(taps_len: int, stride: int, channels: int,
                       block: int, dtype=jnp.float32) -> bool:
    """Gate for the exact-tiling kernel (offset must be stride-1)."""
    dtype = jnp.dtype(dtype)
    if dtype not in (jnp.dtype(d) for d in _OK_DTYPES):
        return False
    itemsize = dtype.itemsize
    sd = _S * stride
    n_left = max(0, -(-(taps_len - stride) // stride))
    ct = min(channels, _CT)
    ct_align = 16 if itemsize == 2 else 8
    return (stride > 1
            and taps_len - 1 <= sd          # tail pad fits one frame
            and n_left <= _NSP_PAD
            and channels % ct == 0 and ct % ct_align == 0
            and _ft_for(stride, channels, block, itemsize) > 0)


def mxu_afsk_supported(taps_len: int, stride: int, channels: int,
                       block: int, corr_len: int,
                       dtype=jnp.float32) -> bool:
    """Gate for the fused AFSK mode: the exact-tiling FIR constraints plus
    a correlator that spans at most one previous frame (the windowed sum is
    resolved with ONE previous-frame matmul, mirroring the FIR spill).
    VMEM is sized against the afsk mode's FULL scratch set (correlator
    buffers included), which the plain fir2 gate does not count."""
    itemsize = jnp.dtype(dtype).itemsize
    return (2 <= corr_len <= _S
            and mxu_fir2_supported(taps_len, stride, channels, block,
                                   dtype=dtype)
            and _ft_for(stride, channels, block, itemsize, afsk=True) > 0)


def _build_wmat(corr_len: int) -> np.ndarray:
    """(2S, S) float32 boxcar window matrices [W ; Wp] for the FSK
    correlator's length-L sliding sum over per-sample tone products
    (reference ring sum: src/fsk.cc:68-87): with u the current frame's
    products (S lanes) and up the previous frame's,
    ``s = u @ W + up @ Wp`` gives s[j] = sum_{m=j-L+1..j} u[m].  Entries
    are 0/1, so the bf16 MXU pass is exact in the matrix."""
    s = _S
    L = int(corr_len)
    w = np.zeros((s, s), np.float32)
    wp = np.zeros((s, s), np.float32)
    for j in range(s):
        for k in range(max(0, j - L + 1), j + 1):
            w[k, j] = 1.0
        for k in range(max(0, j + s - L + 1), s):
            wp[k, j] = 1.0
    return np.concatenate([w, wp], axis=0)


def _kernel_fm2(xr_hbm, xi_hbm, m_ref, tpr_ref, tpi_ref, lr_hbm, li_hbm,
                dm_ref, dl_hbm, fph_ref, rrow_ref, *refs, ct: int, ft: int,
                sd: int, b_total: int, precision, rot_re: float,
                rot_im: float, gain: float, deemph: bool, mode: str):
    if mode == "fir":
        (yr_ref, yi_ref, xr_s, xi_s, ppr_s, ppi_s, pr_s, pi_s,
         dp_s, sems) = refs
    elif mode == "afsk":
        (tpl_ref, wmat_ref, up_ref, audio_ref, ylr_ref, yli_ref, ulast_ref,
         xr_s, xi_s, ppr_s, ppi_s, pr_s, pi_s, dp_s, u_s, sems) = refs
    else:
        (audio_ref, ylr_ref, yli_ref, xr_s, xi_s, ppr_s, ppi_s, pr_s, pi_s,
         dp_s, sems) = refs
    s = _S
    ci = pl.program_id(0)
    wi = pl.program_id(1)
    n_wi = pl.num_programs(1)
    n_ci = pl.num_programs(0)
    step = ci * n_wi + wi

    def start_dmas(slot, ci_, wi_):
        main = pl.multiple_of(wi_ * (ft * sd), 128)
        row = pl.multiple_of(ci_ * ct, 8)
        pltpu.make_async_copy(
            xr_hbm.at[pl.ds(row, ct), pl.ds(main, ft * sd)],
            xr_s.at[slot], sems.at[slot, 0]).start()
        pltpu.make_async_copy(
            xi_hbm.at[pl.ds(row, ct), pl.ds(main, ft * sd)],
            xi_s.at[slot], sems.at[slot, 1]).start()

    def wait_dmas(slot):
        for scr, k in ((xr_s, 0), (xi_s, 1)):
            pltpu.make_async_copy(scr.at[slot], scr.at[slot],
                                  sems.at[slot, k]).wait()

    slot = step % 2

    @pl.when(step == 0)
    def _():
        start_dmas(0, ci, wi)

    @pl.when(step + 1 < n_ci * n_wi)
    def _():
        nxt_wrap = wi + 1 == n_wi
        start_dmas(1 - slot,
                   jnp.where(nxt_wrap, ci + 1, ci),
                   jnp.where(nxt_wrap, 0, wi + 1))

    wait_dmas(slot)
    mm = _make_mm(m_ref, precision)

    # Each channel tile's first step: previous-frame product = the
    # zero-padded carry tail's product; seed discriminator carries.
    @pl.when(wi == 0)
    def _():
        ptr = mm(tpr_ref[:])
        pti = mm(tpi_ref[:])
        ppr_s[:] = ptr
        ppi_s[:] = pti
        pr_s[:] = lr_hbm[:]
        pi_s[:] = li_hbm[:]
        if deemph:
            dp_s[:] = dl_hbm[:]
        if mode == "afsk":
            # Seed the previous-frame tone products from the host carry:
            # (ct, 4S) lane groups [um_re | um_im | us_re | us_im] ->
            # (4ct, S) stacked planes (the matmul row layout).
            u_s[:] = jnp.concatenate(
                [up_ref[:, 0:s], up_ref[:, s:2 * s],
                 up_ref[:, 2 * s:3 * s], up_ref[:, 3 * s:4 * s]], axis=0)

    col = jax.lax.broadcasted_iota(jnp.int32, (ct, s), 1)
    prev_r = pr_s[:]
    prev_i = pi_s[:]
    pp_r = ppr_s[:]
    pp_i = ppi_s[:]
    if mode == "afsk":
        u_prev = u_s[:]
        # 0/1 entries: the bf16 matrix cast is exact.
        wm_cur = wmat_ref[:s].astype(jnp.bfloat16)
        wm_prev = wmat_ref[s:].astype(jnp.bfloat16)
        dn_w = (((1,), (0,)), ((), ()))

        def wmm(v, wm):
            # f32-accurate boxcar matmul: hi/lo bf16 split of the data
            # against the exact 0/1 matrix (2 passes; 1 in fast mode).
            v_hi = v.astype(jnp.bfloat16)
            out = jax.lax.dot_general(v_hi, wm, dn_w,
                                      preferred_element_type=jnp.float32)
            if precision != "x1":
                v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                out = out + jax.lax.dot_general(
                    v_lo, wm, dn_w, preferred_element_type=jnp.float32)
            return out
    if deemph:
        dmat = dm_ref[:s, :]
        dpow = dm_ref[s:s + 1, :]
        dprev = dp_s[:]
        dm_hi = dmat.astype(jnp.bfloat16)
        dm_lo = (dmat - dm_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn_d = (((1,), (0,)), ((), ()))

        def dmm(v):
            v_hi = v.astype(jnp.bfloat16)
            v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return (jax.lax.dot_general(v_hi, dm_hi, dn_d,
                                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(v_hi, dm_lo, dn_d,
                                          preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(v_lo, dm_hi, dn_d,
                                          preferred_element_type=jnp.float32))

    for f in range(ft):
        p_r = mm(xr_s[slot, :, f * sd:(f + 1) * sd])
        p_i = mm(xi_s[slot, :, f * sd:(f + 1) * sd])
        yr = (p_r[:, :s] - p_i[:, s:2 * s]
              + pp_r[:, 2 * s:3 * s] - pp_i[:, 3 * s:])
        yi = (p_i[:, :s] + p_r[:, s:2 * s]
              + pp_i[:, 2 * s:3 * s] + pp_r[:, 3 * s:])
        pp_r, pp_i = p_r, p_i
        if mode == "fir":
            yr_ref[:, f * s:(f + 1) * s] = yr
            yi_ref[:, f * s:(f + 1) * s] = yi
            continue
        if mode == "am":
            sig = jnp.sqrt(yr * yr + yi * yi)
            if deemph:
                sdv = dmm(sig) + dprev * dpow
                dprev = sdv[:, s - 1:s]
                au = jnp.float32(gain) * sig / sdv
            else:
                au = jnp.float32(gain) * sig
            audio_ref[:, f * s:(f + 1) * s] = au
            prev_r = yr[:, s - 1:s]
            prev_i = yi[:, s - 1:s]
            continue
        if mode == "usb":
            # SSB: rotate this frame's outputs by the exact NCO phasor
            # A_f * r_j (per-frame scalar x per-lane row, see fir_fm_exact)
            # and take (re+im)/2 (reference: src/demod.hh:156-160), with
            # the AGC envelope IIR riding along like the AM mode.
            a_r = fph_ref[pl.ds(wi * ft + f, 1), 0:1]
            a_i = fph_ref[pl.ds(wi * ft + f, 1), 1:2]
            rot_r = a_r * rrow_ref[0:1, :] - a_i * rrow_ref[8:9, :]
            rot_i = a_r * rrow_ref[8:9, :] + a_i * rrow_ref[0:1, :]
            sig = 0.5 * ((yr * rot_r - yi * rot_i)
                         + (yr * rot_i + yi * rot_r))
            if deemph:
                sdv = dmm(jnp.abs(sig)) + dprev * dpow
                dprev = sdv[:, s - 1:s]
                au = jnp.float32(gain) * sig / sdv
            else:
                au = jnp.float32(gain) * sig
            audio_ref[:, f * s:(f + 1) * s] = au
            prev_r = yr[:, s - 1:s]
            prev_i = yi[:, s - 1:s]
            continue
        ypr = jnp.where(col == 0, prev_r, pltpu.roll(yr, 1, axis=1))
        ypi = jnp.where(col == 0, prev_i, pltpu.roll(yi, 1, axis=1))
        zr = yr * ypr + yi * ypi
        zi = yi * ypr - yr * ypi
        zr2 = zr * jnp.float32(rot_re) - zi * jnp.float32(rot_im)
        zi2 = zr * jnp.float32(rot_im) + zi * jnp.float32(rot_re)
        au = jnp.float32(gain) * _atan2_poly(zi2, zr2)
        if mode == "afsk":
            # FSK dual tone correlator on the in-register FM audio
            # (reference per-sample ring: src/fsk.cc:68-87): multiply by
            # the audio-rate tone template rows (mark/space re/im), take
            # the length-L sliding sum as two banded-ones MXU matmuls
            # (current + previous frame), and emit the mark-vs-space
            # power difference — the bit-sync PLL thresholds it at 0.
            tm_r = tpl_ref[0:1, f * s:(f + 1) * s]
            tm_i = tpl_ref[1:2, f * s:(f + 1) * s]
            ts_r = tpl_ref[2:3, f * s:(f + 1) * s]
            ts_i = tpl_ref[3:4, f * s:(f + 1) * s]
            u = jnp.concatenate([au * tm_r, au * tm_i,
                                 au * ts_r, au * ts_i], axis=0)
            sw = wmm(u, wm_cur) + wmm(u_prev, wm_prev)
            disc = (sw[0:ct] * sw[0:ct]
                    + sw[ct:2 * ct] * sw[ct:2 * ct]
                    - sw[2 * ct:3 * ct] * sw[2 * ct:3 * ct]
                    - sw[3 * ct:4 * ct] * sw[3 * ct:4 * ct])
            audio_ref[:, f * s:(f + 1) * s] = disc
            u_prev = u
            prev_r = yr[:, s - 1:s]
            prev_i = yi[:, s - 1:s]
            continue
        if deemph:
            au = dmm(au) + dprev * dpow
            dprev = au[:, s - 1:s]
        audio_ref[:, f * s:(f + 1) * s] = au
        prev_r = yr[:, s - 1:s]
        prev_i = yi[:, s - 1:s]
    ppr_s[:] = pp_r
    ppi_s[:] = pp_i
    if mode == "fir":
        return
    pr_s[:] = prev_r
    pi_s[:] = prev_i
    if deemph:
        dp_s[:] = dprev
    if mode == "afsk":
        u_s[:] = u_prev
        # export the last frame's tone products for the next block's seed
        # ((ct, 4S) lane groups, the inverse of the wi==0 unpack).
        ulast_ref[:, 0:s] = u_prev[0:ct]
        ulast_ref[:, s:2 * s] = u_prev[ct:2 * ct]
        ulast_ref[:, 2 * s:3 * s] = u_prev[2 * ct:3 * ct]
        ulast_ref[:, 3 * s:4 * s] = u_prev[3 * ct:4 * ct]
    # carry exports (constant-index out blocks — the last step's write per
    # channel tile is what flushes): y of the final output, except in AM
    # mode with AGC where the first slot carries the AGC envelope state.
    if mode in ("am", "usb") and deemph:
        ylr_ref[:] = dprev
        yli_ref[:] = prev_i
    else:
        ylr_ref[:] = prev_r
        yli_ref[:] = prev_i


@functools.partial(jax.jit, static_argnames=("stride", "ft", "rot_re",
                                             "rot_im", "gain", "deemph",
                                             "mode", "precision",
                                             "interpret"))
def _fir_fm2_call(xr, xi, m, tpr, tpi, lead_r, lead_i, dmat, dlead,
                  fph, rrow, stride: int, ft: int, rot_re: float,
                  rot_im: float, gain: float, deemph: bool = False,
                  mode: str = "fm", precision: str = "x3",
                  interpret: bool = False, tpl=None, wmat=None,
                  uprev=None):
    c, b = xr.shape
    sd = _S * stride
    ct = min(c, _CT)
    f_total = b // sd
    grid = (c // ct, f_total // ft)
    n_out = f_total * _S
    ncols = 2 * _S + 2 * _NSP_PAD
    afsk = mode == "afsk"
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((sd, ncols), lambda ci, wi: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ct, sd), lambda ci, wi: (ci, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ct, sd), lambda ci, wi: (ci, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ct, 1), lambda ci, wi: (ci, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ct, 1), lambda ci, wi: (ci, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_S + 8, _S), lambda ci, wi: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ct, 1), lambda ci, wi: (ci, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # fph (F, 8), whole
        pl.BlockSpec((16, _S), lambda ci, wi: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xr, xi, m, tpr, tpi, lead_r, lead_i, dmat, dlead, fph, rrow]
    if afsk:
        in_specs += [
            pl.BlockSpec((8, ft * _S), lambda ci, wi: (0, wi),
                         memory_space=pltpu.VMEM),      # tone templates
            pl.BlockSpec((2 * _S, _S), lambda ci, wi: (0, 0),
                         memory_space=pltpu.VMEM),      # window matrices
            pl.BlockSpec((ct, 4 * _S), lambda ci, wi: (ci, 0),
                         memory_space=pltpu.VMEM),      # u_prev seed
        ]
        operands += [tpl, wmat, uprev]
    if mode == "fir":
        out_specs = [pl.BlockSpec((ct, ft * _S), lambda ci, wi: (ci, wi),
                                  memory_space=pltpu.VMEM)] * 2
        out_shape = [jax.ShapeDtypeStruct((c, n_out), jnp.float32)] * 2
    else:
        out_specs = [pl.BlockSpec((ct, ft * _S), lambda ci, wi: (ci, wi),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((ct, 1), lambda ci, wi: (ci, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((ct, 1), lambda ci, wi: (ci, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((c, n_out), jnp.float32),
                     jax.ShapeDtypeStruct((c, 1), jnp.float32),
                     jax.ShapeDtypeStruct((c, 1), jnp.float32)]
        if afsk:
            out_specs.append(
                pl.BlockSpec((ct, 4 * _S), lambda ci, wi: (ci, 0),
                             memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((c, 4 * _S), jnp.float32))
    scratch_shapes = [
        pltpu.VMEM((2, ct, ft * sd), xr.dtype),
        pltpu.VMEM((2, ct, ft * sd), xr.dtype),
        pltpu.VMEM((ct, ncols), jnp.float32),
        pltpu.VMEM((ct, ncols), jnp.float32),
        pltpu.VMEM((ct, 1), jnp.float32),
        pltpu.VMEM((ct, 1), jnp.float32),
        pltpu.VMEM((ct, 1), jnp.float32),
    ]
    if afsk:
        scratch_shapes.append(pltpu.VMEM((4 * ct, _S), jnp.float32))
    scratch_shapes.append(pltpu.SemaphoreType.DMA((2, 2)))
    afsk_flops = (2 if afsk else 0) * 2 * 2 * c * b * _S // stride
    return pl.pallas_call(
        functools.partial(_kernel_fm2, ct=ct, ft=ft, sd=sd, b_total=b,
                          precision=precision, rot_re=rot_re,
                          rot_im=rot_im, gain=gain, deemph=deemph,
                          mode=mode),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=(3 * 2 * 2 * c * b * (2 * _S + 2 * _NSP_PAD) // stride
                   + afsk_flops),
            bytes_accessed=(xr.dtype.itemsize * 2 * c * b + 4 * c * n_out),
            transcendentals=c * n_out),
        interpret=interpret,
    )(*operands)


_MAT2_CACHE_NP: dict = {}
_MAT2_CACHE_DEV: dict = {}


def _mats2_on_device(taps: np.ndarray, stride: int):
    key = (taps.tobytes(), int(stride), _S, _NSP_PAD, "v2")
    m_np = _MAT2_CACHE_NP.get(key)
    if m_np is None:
        m_np = _build_mats2(taps, stride)
        if len(_MAT2_CACHE_NP) > 64:
            _MAT2_CACHE_NP.clear()
        _MAT2_CACHE_NP[key] = m_np
    return to_device_cached(_MAT2_CACHE_DEV, key, lambda: m_np)


def fir_fm_exact(x: Complex, taps: np.ndarray, stride: int,
                 tail: Complex, lead_last: Complex, rot: complex,
                 gain: float, deemph_ab=None, deemph_lead=None,
                 mode: str = "fm", usb_phasors=None,
                 interpret: bool = False):
    """Exact-tiling fused FIR + demod: consumes the WHOLE block plus the
    (C, T-1) carry ``tail`` and returns (audio (C, B/stride), y_last
    Complex (C, 1)) with NO garbage outputs — output j is the window
    ending at input sample (j+1)*stride - 1 (the standard overlap-save
    offset = stride-1 convention of ops/fir.py).

    ``lead_last``: y[-1] of the previous block (seeds the discriminator);
    ``deemph_ab``/``deemph_lead``: first-order state as in fir_fm_mxu.

    ``mode='usb'``: SSB demod (re+im)/2 after an exact per-output NCO
    rotation; ``usb_phasors`` = (fph (F, 8) f32 with [cos, sin] of the
    per-frame phasor in columns 0/1, rrow (16, 128) f32 with cos/sin of
    the per-lane phasor in rows 0/8); ``deemph_ab`` then carries the AGC
    IIR and the first export slot returns the AGC envelope state."""
    taps = np.asarray(taps)
    if not np.iscomplexobj(taps):
        taps = taps.astype(np.complex128)
    rot = complex(rot)
    c, b = x.re.shape
    t = taps.shape[0]
    sd = _S * stride
    use_deemph = deemph_ab is not None
    if use_deemph:
        dmat = jnp.asarray(_deemph_mat(*deemph_ab))
        dlead = deemph_lead
    else:
        dmat = jnp.zeros((_S + 8, _S), jnp.float32)
        dlead = jnp.zeros((c, 1), jnp.float32)
    ft = _ft_for(stride, c, b, jnp.dtype(x.re.dtype).itemsize)
    # zero-pad the carry tail to one frame (frame "-1" of the block)
    pad = sd - (t - 1)
    zpad = jnp.zeros((c, pad), x.re.dtype)
    tpr = jnp.concatenate([zpad, tail.re.astype(x.re.dtype)], axis=-1)
    tpi = jnp.concatenate([zpad, tail.im.astype(x.im.dtype)], axis=-1)
    if usb_phasors is not None:
        fph, rrow = usb_phasors
    else:
        f_total = (b // stride) // _S
        fph = jnp.zeros((f_total, 8), jnp.float32)
        rrow = jnp.zeros((16, _S), jnp.float32)
    audio, ylr, yli = _fir_fm2_call(
        x.re, x.im, _mats2_on_device(taps, stride), tpr, tpi,
        lead_last.re.astype(jnp.float32), lead_last.im.astype(jnp.float32),
        dmat, dlead.astype(jnp.float32), fph, rrow, stride, ft,
        float(rot.real), float(rot.imag), float(gain),
        deemph=use_deemph, mode=mode, precision=_PRECISION,
        interpret=interpret)
    return audio, Complex(ylr, yli)


def fir_exact(x: Complex, taps: np.ndarray, stride: int, tail: Complex,
              interpret: bool = False) -> Complex:
    """Exact-tiling decimating FIR: consumes the block plus the (C, T-1)
    carry tail and returns Complex (C, B/stride) — every output valid
    (window j ends at sample (j+1)*stride - 1, the fir_overlap_save
    offset = stride-1 convention)."""
    taps = np.asarray(taps)
    if not np.iscomplexobj(taps):
        taps = taps.astype(np.complex128)
    c, b = x.re.shape
    t = taps.shape[0]
    sd = _S * stride
    ft = _ft_for(stride, c, b, jnp.dtype(x.re.dtype).itemsize)
    pad = sd - (t - 1)
    zpad = jnp.zeros((c, pad), x.re.dtype)
    tpr = jnp.concatenate([zpad, tail.re.astype(x.re.dtype)], axis=-1)
    tpi = jnp.concatenate([zpad, tail.im.astype(x.im.dtype)], axis=-1)
    zc = jnp.zeros((c, 1), jnp.float32)
    dmat = jnp.zeros((_S + 8, _S), jnp.float32)
    f_total = (b // stride) // _S
    fph = jnp.zeros((f_total, 8), jnp.float32)
    rrow = jnp.zeros((16, _S), jnp.float32)
    yr, yi = _fir_fm2_call(
        x.re, x.im, _mats2_on_device(taps, stride), tpr, tpi, zc, zc,
        dmat, zc, fph, rrow, stride, ft, 1.0, 0.0, 1.0, deemph=False,
        mode="fir", precision=_PRECISION, interpret=interpret)
    return Complex(yr, yi)


_WMAT_CACHE_NP: dict = {}
_WMAT_CACHE_DEV: dict = {}


def _wmat_on_device(corr_len: int):
    key = (int(corr_len), _S)
    m_np = _WMAT_CACHE_NP.get(key)
    if m_np is None:
        m_np = _build_wmat(corr_len)
        _WMAT_CACHE_NP[key] = m_np
    return to_device_cached(_WMAT_CACHE_DEV, key, lambda: m_np)


def fir_afsk_exact(x: Complex, taps: np.ndarray, stride: int,
                   tail: Complex, lead_last: Complex, rot: complex,
                   gain: float, corr_len: int, tpl, uprev,
                   interpret: bool = False):
    """Exact-tiling fused AFSK front end: decimating FIR + quadrature FM
    demod + dual-tone FSK correlator in ONE kernel pass (reference chain:
    src/baseband.hh:226-236 -> src/demod.hh:191-203 -> src/fsk.cc:68-87).

    Args are as in ``fir_fm_exact`` plus:
      corr_len: correlator window L = floor(audio_fs / baud), 2..128.
      tpl: (8, B/stride) f32 — audio-rate tone template rows
        [mark_re, mark_im, space_re, space_im, 0...] already rolled to the
        stream's template phase (host side, see ops/afsk_fused.py).
      uprev: (C, 4*128) f32 — the previous block's final frame of tone
        products in lane groups [um_re | um_im | us_re | us_im]; the first
        block seeds zeros (lanes below 128-(L-1) are never read).

    Returns (disc (C, B/stride), y_last Complex (C, 1), u_last (C, 512))
    where ``disc`` is the mark-vs-space power difference (symbol =
    disc > 0) and ``u_last`` is the next block's ``uprev``."""
    taps = np.asarray(taps)
    if not np.iscomplexobj(taps):
        taps = taps.astype(np.complex128)
    rot = complex(rot)
    c, b = x.re.shape
    t = taps.shape[0]
    sd = _S * stride
    ft = _ft_for(stride, c, b, jnp.dtype(x.re.dtype).itemsize, afsk=True)
    pad = sd - (t - 1)
    zpad = jnp.zeros((c, pad), x.re.dtype)
    tpr = jnp.concatenate([zpad, tail.re.astype(x.re.dtype)], axis=-1)
    tpi = jnp.concatenate([zpad, tail.im.astype(x.im.dtype)], axis=-1)
    dmat = jnp.zeros((_S + 8, _S), jnp.float32)
    dlead = jnp.zeros((c, 1), jnp.float32)
    f_total = (b // stride) // _S
    fph = jnp.zeros((f_total, 8), jnp.float32)
    rrow = jnp.zeros((16, _S), jnp.float32)
    disc, ylr, yli, ulast = _fir_fm2_call(
        x.re, x.im, _mats2_on_device(taps, stride), tpr, tpi,
        lead_last.re.astype(jnp.float32), lead_last.im.astype(jnp.float32),
        dmat, dlead, fph, rrow, stride, ft,
        float(rot.real), float(rot.imag), float(gain),
        deemph=False, mode="afsk", precision=_PRECISION,
        interpret=interpret, tpl=tpl, wmat=_wmat_on_device(corr_len),
        uprev=uprev)
    return disc, Complex(ylr, yli), ulast
