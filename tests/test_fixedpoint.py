"""Fixed-point parity tests: the integer kernels must match a direct python
re-statement of the reference's C++ math exactly (reference: src/math.hh)."""

import jax.numpy as jnp
import numpy as np

from libsdr_tpu import StreamSpec
from libsdr_tpu.core import cplx
from libsdr_tpu.ops.fixedpoint import FMDemodInt, fast_atan2_i16


def _fast_atan2_py(a: int, b: int) -> int:
    """reference: src/math.hh:31-40 (int16 in, int16 out, C semantics)."""
    pi4 = 1 << 12
    pi34 = 3 * (1 << 12)
    if a == 0 and b == 0:
        return 0
    aabs = a if a >= 0 else -a
    if b >= 0:
        angle = pi4 - int(pi4 * (b - aabs) / (b + aabs))  # trunc toward 0
    else:
        angle = pi34 - int(pi4 * (b + aabs) / (aabs - b))
    return angle if a >= 0 else -angle


def test_fast_atan2_matches_reference_exactly(rng):
    a = rng.integers(-32768, 32768, 5000).astype(np.int32)
    b = rng.integers(-32768, 32768, 5000).astype(np.int32)
    got = np.asarray(fast_atan2_i16(jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray([_fast_atan2_py(int(x), int(y)) for x, y in zip(a, b)])
    np.testing.assert_array_equal(got, want)
    # include axis / degenerate cases
    cases = [(0, 0), (1, 0), (0, 1), (-1, 0), (0, -1), (32767, -32768),
             (-32768, -32768), (-32768, 32767)]
    for x, y in cases:
        got1 = int(np.asarray(fast_atan2_i16(jnp.asarray([x], jnp.int32),
                                             jnp.asarray([y], jnp.int32)))[0])
        assert got1 == _fast_atan2_py(x, y), (x, y)


def test_fast_atan2_angle_convention():
    """pi == 1<<14: atan2(1,0) (a on the 'sine' axis) = pi/2."""
    v = int(np.asarray(fast_atan2_i16(jnp.asarray([1000], jnp.int32),
                                      jnp.asarray([0], jnp.int32)))[0])
    assert v == (1 << 13)  # pi/2


def test_fm_demod_int_matches_python_loop(rng):
    n = 512
    re = rng.integers(-32768, 32768, n).astype(np.int32)
    im = rng.integers(-32768, 32768, n).astype(np.int32)
    x = (re + 1j * im).astype(np.complex64) / 32767.0

    demod = FMDemodInt()
    demod.bind(StreamSpec(np.complex64, 24000, n))
    _, y = demod.apply(demod.init_carry(), cplx.as_block(x))
    got = np.asarray(y)

    # python loop: reference src/demod.hh:242-254 in int16
    last = 0
    want = []
    for k in range(n):
        phi = int(_fast_atan2_py(int(re[k]), int(im[k])) / 2)  # trunc
        d = last - phi
        d = ((d + (1 << 15)) & 0xFFFF) - (1 << 15)  # int16 wrap
        want.append(d)
        last = phi
    np.testing.assert_array_equal(got, np.asarray(want))


# ---------------------------------------------------------------------------
# Integer IQBaseBand chain (reference: src/baseband.hh int16 path)
# ---------------------------------------------------------------------------

def _iqbaseband_int_oracle(x, fc, ff, width, order, sub, fs):
    """Per-sample numpy loop faithful to the C++ int16 IQBaseBand
    (src/baseband.hh:198-236 + freqshift.hh:58-87), independent of the
    vectorized op.  Returns the emitted complex-int16 stream."""
    from libsdr_tpu.ops.fixedpoint import ref_nco_lut, ref_q14_kernel

    def w32(a):
        return ((int(a) + (1 << 31)) & 0xFFFFFFFF) - (1 << 31)

    def w16(a):
        return ((int(a) + (1 << 15)) & 0xFFFF) - (1 << 15)

    def tdiv(a, b):
        return abs(a) // abs(b) * (1 if (a >= 0) == (b >= 0) else -1)

    k = ref_q14_kernel(order, ff, width, fs)
    kr = [int(v) for v in k.real]
    ki = [int(v) for v in k.imag]
    lut = ref_nco_lut()
    lut_inc = int(128 * 256 * abs(fc) / fs)
    lut_count = 0
    ring = [(0, 0)] * order
    pos = 0
    last_r = last_i = 0
    count = 0
    out = []
    for n in range(len(x)):
        ring[pos] = (int(x[n].real), int(x[n].imag))
        pos = (pos + 1) % order
        # filter ring: kernel[i] multiplies entries oldest..newest
        rr = ri = 0
        idx = pos % order
        for i in range(order):
            sr, si = ring[idx]
            rr = w32(rr + w32(kr[i] * sr) - w32(ki[i] * si))
            ri = w32(ri + w32(kr[i] * si) + w32(ki[i] * sr))
            idx = (idx + 1) % order
        yr, yi = rr >> 14, ri >> 14
        if lut_inc:
            idx_l = lut_count >> 8
            if fc < 0:
                idx_l = 127 - idx_l
            lr, li = int(lut[idx_l].real), int(lut[idx_l].imag)
            zr = w32(w32(lr * yr) - w32(li * yi)) >> 16
            zi = w32(w32(lr * yi) + w32(li * yr)) >> 16
            lut_count = (lut_count + lut_inc) % (128 * 256)
        else:
            zr, zi = yr, yi
        last_r = w32(last_r + zr)
        last_i = w32(last_i + zi)
        if count == sub:
            out.append((w16(tdiv(last_r, sub)), w16(tdiv(last_i, sub))))
            last_r = last_i = 0
            count = 0
        count += 1
    return np.array(out)


def test_iqbaseband_int_matches_cpp_loop(rng):
    """Vectorized IQBaseBandInt (incl. streaming carry and the first-group
    quirk) == the per-sample C++-faithful loop, with an active NCO."""
    import jax.numpy as jnp
    from libsdr_tpu import StreamSpec
    from libsdr_tpu.core import cplx
    from libsdr_tpu.ops import IQBaseBandInt

    fs, fc, width, order, sub = 96000.0, 12000.0, 11000.0, 21, 4
    B = 480
    n_blocks = 3
    x = (rng.integers(-12000, 12000, size=n_blocks * B)
         + 1j * rng.integers(-12000, 12000, size=n_blocks * B))
    ref = _iqbaseband_int_oracle(x, fc, fc, width, order, sub, fs)

    bb = IQBaseBandInt(fc=fc, width=width, order=order, decim=sub)
    bb.bind(StreamSpec(np.complex64, fs, B))
    carry = bb.init_carry()
    outs = []
    for b in range(n_blocks):
        blk = x[b * B:(b + 1) * B]
        xb = cplx.Complex(jnp.asarray(blk.real, jnp.int32),
                          jnp.asarray(blk.imag, jnp.int32))
        carry, y = bb.apply(carry, xb)
        got = np.asarray(y.re) + 1j * np.asarray(y.im)
        if b == 0:
            got = got[:-1]   # first block's final slot is padding
        outs.append(got)
    got = np.concatenate(outs)
    assert len(got) == len(ref)
    np.testing.assert_array_equal(got.real, ref[:, 0])
    np.testing.assert_array_equal(got.imag, ref[:, 1])


def test_fm_deemph_int_matches_cpp_loop(rng):
    from libsdr_tpu import StreamSpec
    from libsdr_tpu.ops import FMDeemphInt

    fs = 22050.0
    x = rng.integers(-30000, 30000, size=400).astype(np.int32)
    import math
    alpha = int(round(1.0 / (1.0 - math.exp(-1.0 / (fs * 75e-6)))))

    def w16(a):
        return ((int(a) + (1 << 15)) & 0xFFFF) - (1 << 15)

    avg = 0
    ref = []
    for v in x:
        diff = w16(int(v) - avg)
        if diff > 0:
            avg = w16(avg + (diff + alpha // 2) // alpha)
        else:
            avg = w16(avg + -((-(diff - alpha // 2)) // alpha))
        ref.append(avg)

    de = FMDeemphInt()
    de.bind(StreamSpec(np.float32, fs, 200))
    carry = de.init_carry()
    c, y1 = de.apply(carry, jnp.asarray(x[:200]))
    c, y2 = de.apply(c, jnp.asarray(x[200:]))
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])
    np.testing.assert_array_equal(got, np.array(ref))


import jax.numpy as jnp  # noqa: E402
