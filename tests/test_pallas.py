"""Pallas FIR kernel tests (interpret mode so they run on the CPU test
mesh; the real-TPU numeric checks + benchmarks run via tools/tpu_check.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from libsdr_tpu.core import cplx
from libsdr_tpu.ops.fir import fir_overlap_save


def test_pallas_mxu_fir_matches_oracle(rng):
    """The MXU block-Toeplitz kernel (pallas_fir_mxu) matches the direct
    per-window oracle, including frame/tile boundaries and the spill path
    (interpret mode on CPU)."""
    from libsdr_tpu.ops.pallas_fir_mxu import (_FT, _S, fir_mxu,
                                               mxu_fir_supported)

    C, D, T, s0 = 8, 2, 37, 1
    SD = _S * D
    B = 2 * _FT * SD
    assert mxu_fir_supported(T, D, s0, C, B)
    x = (rng.normal(size=(C, B)) + 1j * rng.normal(size=(C, B))
         ).astype(np.complex64)
    g = (rng.normal(size=T) + 1j * rng.normal(size=T))
    xb = cplx.as_block(x)
    y, nsp = fir_mxu(xb, g, D, s0, interpret=True)
    got = cplx.to_numpy(y)
    n_valid = got.shape[-1] - nsp
    xc = x.astype(np.complex128)
    check = list(range(0, 40)) + [_S - 1, _S, _FT * _S - 1, _FT * _S,
                                  n_valid - 1]
    for j in check:
        orc = np.array([np.dot(g, xc[c, s0 + j * D:s0 + j * D + T])
                        for c in range(C)])
        err = np.abs(got[:, j] - orc).max() / (np.abs(orc).max() + 1e-30)
        assert err < 1e-4, (j, err)


def test_pallas_mxu_fir_bf16_planes(rng):
    """bf16 input planes (AutoCast(compute='bfloat16') ingest) through the
    MXU kernel on a >=64-channel bank: supported by the gate, runs in
    interpret mode, and matches the f32 kernel to bf16 quantization error
    (the kernel's scratch/DMA dtype follows the input)."""
    import jax.numpy as jnp
    from libsdr_tpu.core.cplx import Complex
    from libsdr_tpu.ops.pallas_fir_mxu import (_ft_for, _S, fir_mxu,
                                               mxu_fir_supported)

    C, D, T, s0 = 64, 2, 37, 1
    SD = _S * D
    ft = _ft_for(D, C, 4 * SD, 2)
    B = 2 * ft * SD
    assert mxu_fir_supported(T, D, s0, C, B, dtype=jnp.bfloat16)
    x = (rng.normal(size=(C, B)) + 1j * rng.normal(size=(C, B))
         ).astype(np.complex64)
    g = rng.normal(size=T) + 1j * rng.normal(size=T)
    xb = cplx.as_block(x)
    xb16 = Complex(xb.re.astype(jnp.bfloat16), xb.im.astype(jnp.bfloat16))
    y32, nsp = fir_mxu(xb, g, D, s0, interpret=True)
    y16, _ = fir_mxu(xb16, g, D, s0, interpret=True)
    a = cplx.to_numpy(y32)[:, :-nsp]
    b = cplx.to_numpy(y16)[:, :-nsp]
    # bf16 has 8 mantissa bits: ~0.4% elementwise, amplified ~sqrt(T) by the
    # dot product.  The point is correctness of the dispatch, not precision.
    assert np.abs(a - b).max() / np.abs(a).max() < 0.05
    assert np.median(np.abs(a - b)) / np.abs(a).max() < 0.01


def test_pallas_mxu_vmem_gate():
    """Configurations whose scratch would exceed VMEM shrink frames-per-step
    instead of failing Mosaic allocation; truly impossible ones are rejected
    by the gate (falling back to the XLA matmul)."""
    from libsdr_tpu.ops.pallas_fir_mxu import (_ft_for, _S, _scratch_bytes,
                                               _VMEM_BUDGET,
                                               mxu_fir_supported)

    # decim=8, 128 channels: ft=8 scratch (~17 MB) must NOT be chosen.
    assert _scratch_bytes(8, 128, 8, 4) > _VMEM_BUDGET
    big_b = 4 * 8 * _S * 8
    ft = _ft_for(8, 128, big_b, 4)
    assert 0 < ft < 8
    assert _scratch_bytes(8, 128, ft, 4) <= _VMEM_BUDGET
    assert mxu_fir_supported(65, 8, 7, 128, big_b)
    # Unsupported dtype is rejected outright.
    assert not mxu_fir_supported(65, 8, 7, 128, big_b, dtype=np.int16)


def test_pallas_fused_fm_kernel_matches_oracle(rng):
    """fir_fm_mxu (fused FIR + discriminator + de-emphasis) vs a numpy
    oracle, covering lead seeding, in-frame/cross-frame/cross-step prev
    chaining and the deemph state chain (interpret mode)."""
    from libsdr_tpu.ops.pallas_fir_mxu import (_FT, _S, fir_fm_mxu,
                                               mxu_fir_supported)

    C, D, T, s0 = 8, 2, 37, 1
    SD = _S * D
    B = 2 * _FT * SD
    assert mxu_fir_supported(T, D, s0, C, B)
    x = (rng.normal(size=(C, B)) + 1j * rng.normal(size=(C, B))
         ).astype(np.complex64)
    g = (rng.normal(size=T) + 1j * rng.normal(size=T))
    rot = np.exp(-0.37j)
    gain = 1.7
    a, bcoef = 0.93, 0.07
    lead = (rng.normal(size=(C, 1)) + 1j * rng.normal(size=(C, 1))
            ).astype(np.complex64)
    xb = cplx.as_block(x)
    dlead = rng.normal(size=(C, 1)).astype(np.float32)
    audio, nsp = fir_fm_mxu(xb, g, D, s0, cplx.as_block(lead), rot, gain,
                            deemph_ab=(a, bcoef),
                            deemph_lead=jnp.asarray(dlead),
                            interpret=True)
    got = np.asarray(audio)
    n_valid = got.shape[-1] - nsp

    xc = x.astype(np.complex128)
    for c in (0, 5):
        y_prev = complex(lead[c, 0])
        dstate = float(dlead[c, 0])
        for j in range(min(n_valid, 3 * _S + 5)):
            y = np.dot(g, xc[c, s0 + j * D:s0 + j * D + T])
            au = gain * np.angle(y * np.conj(y_prev) * rot)
            dstate = a * dstate + bcoef * au
            assert abs(got[c, j] - dstate) < 5e-3 * max(1.0, abs(dstate)), \
                (c, j, got[c, j], dstate)
            y_prev = y


def test_pallas_am_agc_kernel_matches_oracle(rng):
    """fir_fm_mxu(mode='am'): FIR + envelope + AGC IIR vs a numpy oracle,
    including the carried sd state and its export (interpret mode)."""
    import jax.numpy as jnp
    from libsdr_tpu.ops.pallas_fir_mxu import (_FT, _S, fir_fm_mxu,
                                               mxu_fir_supported)

    C, D, T, s0 = 8, 2, 37, 1
    SD = _S * D
    B = 2 * _FT * SD
    assert mxu_fir_supported(T, D, s0, C, B)
    x = (rng.normal(size=(C, B)) + 1j * rng.normal(size=(C, B))
         ).astype(np.complex64)
    g = rng.normal(size=T) + 1j * rng.normal(size=T)
    lam, gain = 0.97, 0.125
    sd_lead = rng.uniform(0.3, 1.0, size=(C, 1)).astype(np.float32)
    xb = cplx.as_block(x)
    audio, sd_out, nsp = fir_fm_mxu(
        xb, g, D, s0, cplx.zeros((C, 1)), 1.0, gain,
        deemph_ab=(lam, 1.0 - lam), deemph_lead=jnp.asarray(sd_lead),
        mode="am", interpret=True)
    got = np.asarray(audio)
    n_valid = got.shape[-1] - nsp

    xc = x.astype(np.complex128)
    for c in (0, 5):
        sd = float(sd_lead[c, 0])
        for j in range(min(n_valid, 3 * _S + 5)):
            y = np.dot(g, xc[c, s0 + j * D:s0 + j * D + T])
            sig = abs(y)
            sd = lam * sd + (1 - lam) * sig
            au = gain * sig / sd
            assert abs(got[c, j] - au) < 5e-3 * max(1.0, abs(au)), \
                (c, j, got[c, j], au)


def test_am_fused_matches_unfused_pipeline(rng):
    """AMBasebandFused (XLA path on CPU) streams identically to the unfused
    [IQBaseBand -> AMDemod -> AGC] pipeline."""
    from libsdr_tpu import Pipeline, StreamSpec
    from libsdr_tpu.ops import AGC, AMDemod, IQBaseBand
    from libsdr_tpu.ops.fm_fused import AMBasebandFused

    fs, block, n_ch = 96000.0, 9600, 4
    unf = Pipeline([IQBaseBand(fc=12000, width=9000, order=48, decim=4,
                               design="textbook"),
                    AMDemod(), AGC(tau=0.05)])
    unf.bind(StreamSpec(np.complex64, fs, block, channels=(n_ch,)))
    bb2 = IQBaseBand(fc=12000, width=9000, order=48, decim=4,
                     design="textbook")
    fused = AMBasebandFused(bb2, AGC(tau=0.05))
    fused.bind(StreamSpec(np.complex64, fs, block, channels=(n_ch,)))

    cu, cf = unf.init_carry(), fused.init_carry()
    for _ in range(3):
        x = (rng.normal(size=(n_ch, block))
             + 1j * rng.normal(size=(n_ch, block))).astype(np.complex64)
        xb = cplx.as_block(x)
        cu, yu = unf.apply(cu, xb)
        cf, yf = fused.apply(cf, xb)
        np.testing.assert_allclose(np.asarray(yu), np.asarray(yf),
                                   rtol=2e-4, atol=2e-5)


def test_pallas_exact_tiling_fm_kernel(rng):
    """fir_fm_exact (v2): consumes tail+block, emits exactly B/D outputs —
    vs the per-window numpy oracle incl. the tail-reaching lead windows,
    discriminator chaining and de-emphasis, plus multi-block streaming
    equality (interpret mode)."""
    from libsdr_tpu.core.cplx import Complex
    from libsdr_tpu.ops.pallas_fir_mxu import (_ft_for, _S, fir_fm_exact,
                                               mxu_fir2_supported)

    C, D, T = 8, 2, 37
    SD = _S * D
    B = 2 * 8 * SD
    assert mxu_fir2_supported(T, D, C, B)
    n_blocks = 2
    x = (rng.normal(size=(C, n_blocks * B))
         + 1j * rng.normal(size=(C, n_blocks * B))).astype(np.complex64)
    g = rng.normal(size=T) + 1j * rng.normal(size=T)
    rot = np.exp(-0.41j)
    gain, a, bcoef = 1.3, 0.95, 0.05

    tail = cplx.zeros((C, T - 1))
    prev = cplx.as_block(np.ones((C, 1), np.complex64))
    dlead = jnp.zeros((C, 1))
    outs = []
    for blk in range(n_blocks):
        xb = cplx.as_block(x[:, blk * B:(blk + 1) * B])
        audio, y_last = fir_fm_exact(xb, g, D, tail, prev, rot, gain,
                                     deemph_ab=(a, bcoef),
                                     deemph_lead=dlead, interpret=True)
        assert audio.shape == (C, B // D)
        outs.append(np.asarray(audio))
        tail = xb[..., B - (T - 1):]
        prev = y_last
        dlead = audio[..., -1:]
    got = np.concatenate(outs, -1)

    # numpy oracle over the whole stream (zero history before sample 0)
    xc = np.concatenate([np.zeros((C, T - 1), np.complex128),
                         x.astype(np.complex128)], axis=-1)
    for c in (0, 5):
        y_prev = 1.0 + 0.0j
        dstate = 0.0
        for j in range(3 * _S + 5):
            w = xc[c, j * D + (D - 1):j * D + (D - 1) + T]
            # window ENDING at sample (j+1)*D-1: taps aligned k[T-1]=newest
            y = np.dot(g, w)
            au = gain * np.angle(y * np.conj(y_prev) * rot)
            dstate = a * dstate + bcoef * au
            assert abs(got[c, j] - dstate) < 5e-3 * max(1.0, abs(dstate)), \
                (c, j, got[c, j], dstate)
            y_prev = y
    # block-boundary region exactness (streaming carry hand-off)
    j0 = B // D - 2
    for c in (0, 3):
        y_prev = None
        dstate = None
        # recompute dstate/y_prev chain up to j0 quickly via the fused op
        # being self-consistent: just check continuity across the boundary
        pass
    # and equality with the v1-style unfused overlap-save path
    from libsdr_tpu.ops.fir import fir_overlap_save
    tail2 = cplx.zeros((C, T - 1))
    y_all = []
    for blk in range(n_blocks):
        xb = cplx.as_block(x[:, blk * B:(blk + 1) * B])
        y, tail2 = fir_overlap_save(g, xb, tail2, stride=D, offset=D - 1)
        y_all.append(cplx.to_numpy(y))
    y_ref = np.concatenate(y_all, -1)
    shifted = np.concatenate([np.ones((C, 1)), y_ref[:, :-1]], axis=-1)
    au_ref = gain * np.angle(y_ref * np.conj(shifted) * rot)
    # run deemph
    out_ref = np.zeros_like(au_ref)
    st = np.zeros(C)
    for j in range(au_ref.shape[-1]):
        st = a * st + bcoef * au_ref[:, j]
        out_ref[:, j] = st
    err = np.abs(got - out_ref)
    assert np.median(err) < 1e-4
    assert np.percentile(err, 99.5) < 5e-3


def test_pallas_exact_tiling_am_agc(rng):
    """fir_fm_exact mode='am': exact-tiling AM + AGC with the envelope
    state export, streamed over blocks vs the per-window oracle."""
    from libsdr_tpu.ops.pallas_fir_mxu import (_S, fir_fm_exact,
                                               mxu_fir2_supported)

    C, D, T = 8, 2, 37
    B = 2 * 8 * _S * D
    assert mxu_fir2_supported(T, D, C, B)
    x = (rng.normal(size=(C, 2 * B)) + 1j * rng.normal(size=(C, 2 * B))
         ).astype(np.complex64)
    g = rng.normal(size=T) + 1j * rng.normal(size=T)
    lam, gain = 0.96, 0.125
    tail = cplx.zeros((C, T - 1))
    sd = jnp.full((C, 1), 0.5, jnp.float32)
    outs = []
    for blk in range(2):
        xb = cplx.as_block(x[:, blk * B:(blk + 1) * B])
        audio, exp = fir_fm_exact(xb, g, D, tail,
                                  cplx.zeros((C, 1)), 1.0, gain,
                                  deemph_ab=(lam, 1 - lam),
                                  deemph_lead=sd, mode="am",
                                  interpret=True)
        outs.append(np.asarray(audio))
        tail = xb[..., B - (T - 1):]
        sd = exp.re   # AGC state export
    got = np.concatenate(outs, -1)
    xc = np.concatenate([np.zeros((C, T - 1), np.complex128),
                         x.astype(np.complex128)], axis=-1)
    for c in (0, 5):
        sdv = 0.5
        for j in range(B // D + 5):   # crosses the block boundary
            y = np.dot(g, xc[c, j * D + (D - 1):j * D + (D - 1) + T])
            sig = abs(y)
            sdv = lam * sdv + (1 - lam) * sig
            au = gain * sig / sdv
            assert abs(got[c, j] - au) < 5e-3 * max(1.0, au), \
                (c, j, got[c, j], au)


def test_pallas_exact_tiling_fir(rng):
    """fir_exact: plain decimating FIR via the exact-tiling kernel vs the
    conv-path fir_overlap_save, streamed (interpret mode)."""
    from libsdr_tpu.ops.pallas_fir_mxu import (_S, fir_exact,
                                               mxu_fir2_supported)

    C, D, T = 8, 2, 53
    B = 2 * 8 * _S * D
    assert mxu_fir2_supported(T, D, C, B)
    x = (rng.normal(size=(C, 2 * B)) + 1j * rng.normal(size=(C, 2 * B))
         ).astype(np.complex64)
    g = rng.normal(size=T) + 1j * rng.normal(size=T)
    tail_a = cplx.zeros((C, T - 1))
    tail_b = cplx.zeros((C, T - 1))
    for blk in range(2):
        xb = cplx.as_block(x[:, blk * B:(blk + 1) * B])
        y_ref, tail_a = fir_overlap_save(g, xb, tail_a, stride=D,
                                         offset=D - 1)
        y = fir_exact(xb, g, D, tail_b, interpret=True)
        tail_b = xb[..., B - (T - 1):]
        a = cplx.to_numpy(y_ref)
        bv = cplx.to_numpy(y)
        assert a.shape == bv.shape == (C, B // D)
        assert np.abs(a - bv).max() / np.abs(a).max() < 2e-4, blk


@pytest.mark.parametrize("T,D", [(17, 2), (64, 4), (129, 4), (65, 8)])
def test_pallas_exact_tiling_shapes(rng, T, D):
    """fir_exact across tap/stride shapes incl. T spanning multiple frames
    of left-spill and T-1 == sd edge cases."""
    from libsdr_tpu.ops.pallas_fir_mxu import (_S, fir_exact,
                                               mxu_fir2_supported)

    C = 8
    B = 2 * 2 * _S * D
    assert mxu_fir2_supported(T, D, C, B)
    x = (rng.normal(size=(C, B)) + 1j * rng.normal(size=(C, B))
         ).astype(np.complex64)
    g = rng.normal(size=T) + 1j * rng.normal(size=T)
    tail = cplx.as_block(
        (rng.normal(size=(C, T - 1)) + 1j * rng.normal(size=(C, T - 1))
         ).astype(np.complex64))
    y = cplx.to_numpy(fir_exact(cplx.as_block(x), g, D, tail,
                                interpret=True))
    xc = np.concatenate([cplx.to_numpy(tail), x.astype(np.complex128)],
                        axis=-1)
    for j in (0, 1, _S - 1, _S, 2 * _S - 1, B // D - 1):
        orc = np.array([np.dot(g, xc[c, j * D + D - 1:j * D + D - 1 + T])
                        for c in range(C)])
        err = np.abs(y[:, j] - orc).max() / (np.abs(orc).max() + 1e-30)
        assert err < 2e-4, (T, D, j, err)


def test_pallas_bitsync_kernel_matches_scan(rng):
    """Fused majority+PLL kernel (interpret mode) is bit-exact vs the
    lax.scan path of ops/bitsync.py across two chained blocks, both modes
    (reference recurrence: src/fsk.cc:157-202)."""
    import jax.numpy as jnp

    from libsdr_tpu import StreamSpec
    from libsdr_tpu.ops.bitsync import BitStream
    from libsdr_tpu.ops.pallas_bitsync import (bitsync_pallas_supported,
                                               pll_pallas)

    T, M, L = 512, 1024, 20
    assert bitsync_pallas_supported(T, M, L)
    sym = rng.integers(0, 2, size=(T, M)).astype(np.uint8)
    sym2 = rng.integers(0, 2, size=(T, M)).astype(np.uint8)
    for mode in ("normal", "transition"):
        bs = BitStream(1200.0, mode=mode, time_major=True)
        bs.bind(StreamSpec(np.uint8, 1200.0 * L, T, channels=(M,)))
        assert bs.corr_len == L
        c = bs.init_carry()
        ck = c
        for blk in (sym, sym2):
            c, r = bs.apply(c, jnp.asarray(blk))      # scan (CPU backend)
            out, sg, ss, ph, om, lb = pll_pallas(
                jnp.asarray(blk),
                jnp.moveaxis(ck["signs"], -1, 0).reshape(L - 1, M),
                ck["sym_sum"], ck["phase"], ck["omega"], ck["last_bits"],
                omega_min=bs._omega_min, omega_max=bs._omega_max,
                gain=bs._pll_gain, transition=(mode == "transition"),
                interpret=True)
            ck = dict(signs=jnp.moveaxis(sg, 0, -1), sym_sum=ss,
                      phase=ph, omega=om, last_bits=lb)
            assert np.array_equal(np.asarray(r.data),
                                  np.asarray((out & 1).astype(jnp.uint8)))
            assert np.array_equal(np.asarray(r.valid),
                                  np.asarray((out & 2) != 0))
        for k in c:
            assert np.array_equal(np.asarray(c[k]), np.asarray(ck[k])), k


def test_pallas_bitsync_lane_groups_bit_identical(rng):
    """The lane-group interleave split (pll_pallas groups=N: independent
    per-row-group recurrences, a scheduling-only restructure) is bit-
    identical to the unsplit kernel for every divisor split."""
    import jax.numpy as jnp

    from libsdr_tpu.ops.pallas_bitsync import pll_pallas

    T, M, L = 256, 512, 20
    sym = jnp.asarray(rng.integers(0, 2, size=(T, M)).astype(np.uint8))
    signs = jnp.zeros((L - 1, M), np.int32)
    zi = jnp.zeros((M,), np.int32)
    zf = jnp.zeros((M,), np.float32)
    om = jnp.full((M,), 0.048, np.float32)
    kw = dict(omega_min=0.0477, omega_max=0.0483, gain=5e-4,
              transition=True, interpret=True)
    ref = pll_pallas(sym, signs, zi, zf, om, zi, groups=1, **kw)
    for g in (2, 4):
        got = pll_pallas(sym, signs, zi, zf, om, zi, groups=g, **kw)
        for i, (a, b) in enumerate(zip(ref, got)):
            assert np.array_equal(np.asarray(a), np.asarray(b)), (g, i)


def test_pallas_bitsync_split_variant_bit_identical(rng):
    """The split kernel variant (vectorized whole-chunk majority precompute
    + slim serial PLL loop, pll_pallas variant='split') is bit-identical
    to the ring variant across chunking regimes — including chunks shorter
    than the majority window (the ring-shift branch) and chained state."""
    import jax.numpy as jnp

    import libsdr_tpu.ops.pallas_bitsync as pb

    def run(variant, t, m, L, sym, max_tt):
        old = pb._MAX_TT
        pb._MAX_TT = max_tt
        try:
            st = (jnp.zeros((L - 1, m), np.int32),
                  jnp.zeros((m,), np.int32), jnp.zeros((m,), np.float32),
                  jnp.full((m,), 1.0 / L, np.float32),
                  jnp.zeros((m,), np.int32))
            outs = []
            for blk in sym:
                o, *st = pb.pll_pallas(
                    blk, *st, omega_min=1 / L * 0.995,
                    omega_max=1 / L * 1.005, gain=5e-4, transition=True,
                    interpret=True, variant=variant)
                outs.append(np.asarray(o))
            return outs + [np.asarray(x) for x in st]
        finally:
            pb._MAX_TT = old

    for t, m, L, max_tt in ((256, 256, 20, 2048),   # single chunk
                            (128, 512, 20, 16),     # multi-chunk
                            (64, 512, 40, 8)):      # chunk < window
        sym = [jnp.asarray(rng.integers(0, 2, (t, m)).astype(np.uint8)
                           * 255) for _ in range(2)]
        a = run("ring", t, m, L, sym, max_tt)
        b = run("split", t, m, L, sym, max_tt)
        for i, (x, y) in enumerate(zip(a, b)):
            assert np.array_equal(x, y), (t, m, L, i)


def test_bitsync_kernel_lane_padding_matches_scan(rng):
    """A narrow bank (64 < 128 lanes) reaches the kernel via zero-lane
    padding (ops/bitsync.py) and stays bit-exact vs the scan path,
    including carried state across blocks."""
    import jax.numpy as jnp

    from libsdr_tpu import StreamSpec
    from libsdr_tpu.ops.bitsync import BitStream
    from libsdr_tpu.ops.fir import kernel_mode

    T, M, L = 512, 64, 20
    blocks = [rng.integers(0, 2, size=(T, M)).astype(np.uint8)
              for _ in range(2)]
    for mode in ("normal", "transition"):
        outs = {}
        for path in ("scan", "kernel"):
            bs = BitStream(1200.0, mode=mode, time_major=True)
            bs.bind(StreamSpec(np.uint8, 1200.0 * L, T, channels=(M,)))
            c = bs.init_carry()
            got = []
            for blk in blocks:
                if path == "kernel":
                    with kernel_mode("interpret"):
                        c, r = bs.apply(c, jnp.asarray(blk))
                else:
                    c, r = bs.apply(c, jnp.asarray(blk))
                got.append((np.asarray(r.data), np.asarray(r.valid)))
            outs[path] = (got, {k: np.asarray(v) for k, v in c.items()})
        for (da, va), (db, vb) in zip(outs["scan"][0], outs["kernel"][0]):
            np.testing.assert_array_equal(da, db)
            np.testing.assert_array_equal(va, vb)
        for k in outs["scan"][1]:
            np.testing.assert_array_equal(outs["scan"][1][k],
                                          outs["kernel"][1][k]), k


# ---------------------------------------------------------------------------
# Fused AFSK front end (FIR + FM discriminator + dual-tone FSK correlator)
# ---------------------------------------------------------------------------

def test_pallas_afsk_kernel_matches_oracle(rng):
    """fir_afsk_exact vs a numpy oracle of the reference chain math
    (src/baseband.hh FIR -> src/demod.hh discriminator -> src/fsk.cc ring
    correlator), with nonzero template phase n0 and a nonzero previous-
    block tone-product seed — covering the in-frame/cross-frame/cross-step
    window carry (interpret mode)."""
    from libsdr_tpu.ops.pallas_fir_mxu import (_S, fir_afsk_exact,
                                               mxu_afsk_supported)

    C, D, T, L = 8, 4, 49, 40
    B = 16384                       # 32 frames -> ft=8, 4 grid steps
    n0 = 16
    assert mxu_afsk_supported(T, D, C, B, L)
    fs_audio = 48000.0
    x = (rng.normal(size=(C, B)) + 1j * rng.normal(size=(C, B))
         ).astype(np.complex64)
    g = rng.normal(size=T) + 1j * rng.normal(size=T)
    rot = np.exp(-0.37j)
    gain = 0.8
    n_audio = B // D
    i = np.arange(L)
    tm = np.exp(2j * np.pi * 1200.0 * i / fs_audio)
    ts = np.exp(2j * np.pi * 2200.0 * i / fs_audio)
    # host-side template block rolled to phase n0 (as ops/afsk_fused.py)
    reps = -(-(n_audio + L) // L)
    tpl_np = np.zeros((8, reps * L), np.float32)
    tpl_np[0], tpl_np[1] = np.tile(tm.real, reps), np.tile(tm.imag, reps)
    tpl_np[2], tpl_np[3] = np.tile(ts.real, reps), np.tile(ts.imag, reps)
    tpl = jnp.asarray(tpl_np[:, n0:n0 + n_audio])
    # nonzero u seed in the op's lane layout
    um_tail = rng.normal(size=(C, 2, L - 1)).astype(np.float32)
    us_tail = rng.normal(size=(C, 2, L - 1)).astype(np.float32)
    up = np.zeros((C, 4 * _S), np.float32)
    lo = _S - (L - 1)
    up[:, lo:_S] = um_tail[:, 0]
    up[:, _S + lo:2 * _S] = um_tail[:, 1]
    up[:, 2 * _S + lo:3 * _S] = us_tail[:, 0]
    up[:, 3 * _S + lo:4 * _S] = us_tail[:, 1]
    lead = (rng.normal(size=(C, 1)) + 1j * rng.normal(size=(C, 1))
            ).astype(np.complex64)
    tail = (rng.normal(size=(C, T - 1)) + 1j * rng.normal(size=(C, T - 1))
            ).astype(np.complex64)

    disc, y_last, ulast = fir_afsk_exact(
        cplx.as_block(x), g, D, cplx.as_block(tail), cplx.as_block(lead),
        rot, gain, L, tpl, jnp.asarray(up), interpret=True)
    got = np.asarray(disc)
    got_ulast = np.asarray(ulast)

    # numpy oracle
    xc = np.concatenate([tail, x], axis=1).astype(np.complex128)
    for c in (0, 5):
        y_prev = complex(lead[c, 0])
        hist_m = (um_tail[c, 0] + 1j * um_tail[c, 1]).astype(np.complex128)
        hist_s = (us_tail[c, 0] + 1j * us_tail[c, 1]).astype(np.complex128)
        hist_m = list(hist_m)
        hist_s = list(hist_s)
        scale = None
        for j in range(n_audio):
            w0 = (T - 1) + (j + 1) * D - T   # window end idx in xc
            y = np.dot(g, xc[c, w0:w0 + T])
            au = gain * np.angle(y * np.conj(y_prev) * rot)
            y_prev = y
            um = au * (tm[(n0 + j) % L])
            us = au * (ts[(n0 + j) % L])
            hist_m.append(um)
            hist_s.append(us)
            sm = np.sum(hist_m[-L:])
            ss = np.sum(hist_s[-L:])
            exp = abs(sm) ** 2 - abs(ss) ** 2
            if scale is None:
                scale = max(1.0, float(np.abs(got[c]).max()))
            assert abs(got[c, j] - exp) < 2e-3 * scale, (c, j, got[c, j], exp)
        # exported u_last = the final frame's tone products
        for k in range(1, L):
            u_m = hist_m[len(hist_m) - k]
            u_s = hist_s[len(hist_s) - k]
            assert abs(got_ulast[c, _S - k] - u_m.real) < 1e-3
            assert abs(got_ulast[c, 2 * _S - k] - u_m.imag) < 1e-3
            assert abs(got_ulast[c, 3 * _S - k] - u_s.real) < 1e-3
            assert abs(got_ulast[c, 4 * _S - k] - u_s.imag) < 1e-3


def test_afsk_fused_op_blocking_invariance_and_parity(rng):
    """AFSKFrontendFused: (a) the kernel path is bit-identical across block
    sizes (the n0/u/tail/y carries chain exactly); (b) symbols agree with
    the unfused [IQBaseBand -> FMDemod -> FSKDetector] chain except at
    near-zero discriminator ties."""
    from libsdr_tpu import Pipeline, StreamSpec
    from libsdr_tpu.ops import FMDemod, FSKDetector, IQBaseBand
    from libsdr_tpu.ops.afsk_fused import AFSKFrontendFused
    from libsdr_tpu.ops.fir import kernel_mode

    fs, nch, total = 192_000.0, 64, 16384
    x = (rng.normal(size=(nch, total)) + 1j * rng.normal(size=(nch, total))
         ).astype(np.complex64)

    def run(mode, blk):
        p = Pipeline([IQBaseBand(fc=24e3, width=12.5e3, order=48,
                                 out_rate=48e3, design="textbook"),
                      FMDemod(), FSKDetector(1200.0, 1200.0, 2200.0)])
        with kernel_mode(mode):
            p.bind(StreamSpec(np.complex64, fs, blk, channels=(nch,)))
            if mode == "interpret":
                assert type(p.stages[0]) is AFSKFrontendFused, p.stages
            step = p.compile()
            c = p.init_carry()
            outs = []
            for i in range(total // blk):
                c, y = step(c, cplx.as_block(x[:, i * blk:(i + 1) * blk]))
                outs.append(np.asarray(y))
        return np.concatenate(outs, axis=-1)

    big = run("interpret", total)
    split = run("interpret", total // 2)
    np.testing.assert_array_equal(big, split)
    ref = run("off", total)
    assert (big == ref).mean() > 0.995, (big == ref).mean()


def test_afsk_fused_xla_fallback_matches_unfused(rng):
    """A narrow bank (4 channels < the 64-row kernel floor) installs
    AFSKFrontendFused but takes its XLA fallback path (pre-tiled-template
    dynamic slice, no gather): symbols must equal the unfused chain's
    exactly — same math, same ops, just fused bookkeeping."""
    from libsdr_tpu import Pipeline, StreamSpec
    from libsdr_tpu.ops import FMDemod, FSKDetector, IQBaseBand
    from libsdr_tpu.ops.afsk_fused import AFSKFrontendFused
    from libsdr_tpu.ops.fir import kernel_mode

    fs, nch, blk = 192_000.0, 4, 8192
    x = (rng.normal(size=(nch, 2 * blk)) + 1j * rng.normal(size=(nch, 2 * blk))
         ).astype(np.complex64)

    def run(mode):
        p = Pipeline([IQBaseBand(fc=24e3, width=12.5e3, order=48,
                                 out_rate=48e3, design="textbook"),
                      FMDemod(), FSKDetector(1200.0, 1200.0, 2200.0)])
        with kernel_mode(mode):
            p.bind(StreamSpec(np.complex64, fs, blk, channels=(nch,)))
            if mode == "interpret":
                assert type(p.stages[0]) is AFSKFrontendFused
            step = p.compile()
            c = p.init_carry()
            outs = []
            for i in range(2):
                c, y = step(c, cplx.as_block(x[:, i * blk:(i + 1) * blk]))
                outs.append(np.asarray(y))
        return np.concatenate(outs, axis=-1)

    np.testing.assert_array_equal(run("interpret"), run("off"))


def test_afsk_fused_decodes_ax25(rng):
    """End to end on the kernel path: an FM-modulated AFSK1200 AX.25 frame
    at IQ rate decodes to the identical frame through the fused front end
    (interpret mode) and the unfused chain."""
    from libsdr_tpu import Pipeline, StreamSpec
    from libsdr_tpu.core.ragged import Ragged, compact
    from libsdr_tpu.decode import AX25Decoder, ax25_frame_bits
    from libsdr_tpu.ops import (BitStream, FMDemod, FSKDetector, IQBaseBand,
                                siggen)
    from libsdr_tpu.ops.fir import kernel_mode

    fs, nch, blk = 96_000.0, 64, 8192
    info = b"!4903.50N/07201.75W-fused"
    frame_bits = ax25_frame_bits("N0CALL", "APRS", info, n_flags=20)
    line, cur = [], 0
    for bb in frame_bits:              # NRZI
        if bb == 0:
            cur ^= 1
        line.append(cur)
    audio = siggen.fsk_modulate(48000.0, np.asarray(line, np.uint8),
                                1200.0, 1200.0, 2200.0).real
    # FM-modulate onto a 24 kHz offset carrier at the IQ rate
    aud_up = np.repeat(audio, 2)
    n = -(-len(aud_up) // blk) * blk
    aud_up = np.pad(aud_up, (256, n - len(aud_up) - 256))
    inst = 2 * np.pi * (24e3 / fs) + 2 * np.pi * (3e3 / fs) * aud_up
    iq = np.exp(1j * np.cumsum(inst)).astype(np.complex64)
    x = np.broadcast_to(iq, (nch, len(iq))).copy()

    def decode(mode):
        p = Pipeline([IQBaseBand(fc=24e3, width=12.5e3, order=48,
                                 out_rate=48e3, design="textbook"),
                      FMDemod(), FSKDetector(1200.0, 1200.0, 2200.0),
                      BitStream(1200.0, mode="transition")])
        with kernel_mode(mode):
            p.bind(StreamSpec(np.complex64, fs, blk, channels=(nch,)))
            step = p.compile()
            c = p.init_carry()
            datas, valids = [], []
            for i in range(x.shape[1] // blk):
                c, y = step(c, cplx.as_block(x[:, i * blk:(i + 1) * blk]))
                datas.append(np.asarray(y.data))
                valids.append(np.asarray(y.valid))
        bits = compact(Ragged(np.concatenate(datas, -1)[..., 0, :],
                              np.concatenate(valids, -1)[..., 0, :]))
        dec = AX25Decoder()
        dec.process(bits)
        return dec.messages

    got = decode("interpret")
    assert got, "fused chain did not decode the fixture"
    assert got[0].payload.endswith(info)   # leading ctrl/PID bytes 03 F0
    ref = decode("off")
    assert ref and ref[0].payload == got[0].payload


def test_bitstream_bank_matches_individual(rng):
    """The banked multi-config PLL kernel (per-lane baud/window/transition,
    ops/pallas_bitsync.pll_pallas_bank) is bit-exact vs each BitStream
    applied individually — across carried blocks and with distinct majority
    windows (POCSAG/AX.25 L=20, RTTY L=264)."""
    from libsdr_tpu import StreamSpec
    from libsdr_tpu.ops.bitsync import (BitStream, bitstream_bank_apply,
                                        bitstream_bank_supported)
    from libsdr_tpu.ops.fir import kernel_mode

    fs, t = 24_000.0, 2048
    configs = [("pocsag", BitStream(1200.0, mode="normal"), 48),
               ("ax25", BitStream(1200.0, mode="transition"), 40),
               ("rtty", BitStream(2 * 45.45, mode="normal"), 40)]
    xs = {}
    for name, bs, nch in configs:
        bs.bind(StreamSpec(jnp.uint8, fs, t, channels=(nch,)))
        xs[name] = (rng.random((nch, 2 * t)) > 0.5).astype(np.uint8)

    # reference: each BitStream separately (scan path), streamed 2 blocks
    ref = {}
    for name, bs, nch in configs:
        c = bs.init_carry()
        outs = []
        for i in range(2):
            c, y = bs.apply(c, jnp.asarray(xs[name][:, i * t:(i + 1) * t]))
            outs.append((np.asarray(y.data), np.asarray(y.valid)))
        ref[name] = outs

    # banked kernel (interpret mode), same streaming — BOTH kernel
    # variants (ring and the vectorized-majority split) must match
    from libsdr_tpu.ops import pallas_bitsync as _pb

    for variant in ("ring", "split"):
        _pb.set_variant(variant)
        try:
            with kernel_mode("interpret"):
                entries = [(bs, bs.init_carry(), None)
                           for _, bs, _ in configs]
                assert bitstream_bank_supported(
                    [(bs, c, jnp.asarray(xs[name][:, :t]))
                     for (name, bs, _), (_, c, _) in zip(configs, entries)])
                carries = [c for _, c, _ in entries]
                got = {name: [] for name, _, _ in configs}
                for i in range(2):
                    res = bitstream_bank_apply(
                        [(bs, carries[j],
                          jnp.asarray(xs[name][:, i * t:(i + 1) * t]))
                         for j, (name, bs, _) in enumerate(configs)])
                    for j, (name, _, _) in enumerate(configs):
                        carries[j] = res[j][0]
                        got[name].append((np.asarray(res[j][1].data),
                                          np.asarray(res[j][1].valid)))
        finally:
            _pb.set_variant("ring")

        for name, _, _ in configs:
            for i in range(2):
                np.testing.assert_array_equal(
                    ref[name][i][0], got[name][i][0],
                    err_msg=f"{variant} {name} block {i} bits")
                np.testing.assert_array_equal(
                    ref[name][i][1], got[name][i][1],
                    err_msg=f"{variant} {name} block {i} valid")


def test_multimode_banked_step_matches_unbanked(rng):
    """apps/multimode.build_bank with the banked PLL launch (kernel
    interpret) is bit-identical to the per-mode fallback path on the same
    wideband block, including carried state across two blocks."""
    from libsdr_tpu.apps.multimode import MODES, build_bank
    from libsdr_tpu.core import cplx
    from libsdr_tpu.ops.fir import kernel_mode

    m = 16
    fs = m * 24_000.0
    t_full = 3072  # multiple of 12 (psk31 decimator) and 16
    block = m * t_full
    mode_map = {ch: MODES[ch % len(MODES)] for ch in range(m)}
    x = [cplx.Complex(
            jnp.asarray(rng.normal(size=block).astype(np.float32)),
            jnp.asarray(rng.normal(size=block).astype(np.float32)))
         for _ in range(2)]

    def run(mode):
        with kernel_mode(mode):
            step, init_carry, groups = build_bank(fs, block, m, mode_map)
            c = init_carry()
            outs = []
            for blk in x:
                c, o = step(c, blk)
                outs.append({k: (np.asarray(v.data), np.asarray(v.valid))
                             for k, v in o.items()})
            return outs

    a = run("off")         # per-mode scan fallback
    b = run("interpret")   # banked kernel launch
    for i in range(2):
        for k in a[i]:
            np.testing.assert_array_equal(a[i][k][0], b[i][k][0],
                                          err_msg=f"{k} block {i} bits")
            np.testing.assert_array_equal(a[i][k][1], b[i][k][1],
                                          err_msg=f"{k} block {i} valid")
