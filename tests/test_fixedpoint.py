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
