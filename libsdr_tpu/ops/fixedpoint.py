"""Fixed-point parity ops (reference: src/math.hh, src/operators.hh).

The reference computes in Q-format integers throughout (SURVEY.md section 7
"hard parts": bit-exact POCSAG/AX.25 needs either int emulation or proof that
the float pipeline crosses the same decision thresholds).  The float pipeline
is the default; this module provides the integer kernels for parity gates —
TPUs execute int32 on the VPU natively.
"""

from __future__ import annotations

import jax.numpy as jnp

from libsdr_tpu.core.block import Processor
from libsdr_tpu.core.stream import StreamSpec


def _div_trunc(a, b):
    """C-style integer division (truncate toward zero), which jnp's
    floor-divide is not for negative operands."""
    q = jnp.abs(a) // jnp.abs(b)
    return jnp.sign(a) * jnp.sign(b) * q


def fast_atan2_i16(a, b):
    """The reference's integer atan2 approximation
    (reference: src/math.hh:31-40, fast_atan2<int16_t,int16_t>):
    maps angle to int16 with pi == 1<<14 (pi/4 == 1<<12).

    Args:
      a, b: int32 arrays (int16 range); returns int32 angles.
    """
    a = a.astype(jnp.int32)
    b = b.astype(jnp.int32)
    pi4 = jnp.int32(1 << 12)
    pi34 = jnp.int32(3 * (1 << 12))
    aabs = jnp.abs(a)
    angle_pos = pi4 - _div_trunc(pi4 * (b - aabs), b + aabs)
    angle_neg = pi34 - _div_trunc(pi4 * (b + aabs), aabs - b)
    angle = jnp.where(b >= 0, angle_pos, angle_neg)
    angle = jnp.where(a >= 0, angle, -angle)
    return jnp.where((a == 0) & (b == 0), jnp.int32(0), angle)


class FMDemodInt(Processor):
    """Bit-faithful integer FM discriminator
    (reference: src/demod.hh:242-254 FMDemod<int16_t> _process):
    ``phi[n] = fast_atan2(re, im) / 2; y[n] = phi[n-1] - phi[n]`` with int16
    wraparound semantics.

    Input: planar complex whose planes hold int16-range values (pass
    ``scale`` to map float input to the reference's integer grid).
    Output: int32 stream (int16-range values).
    """

    def __init__(self, scale: float = 32767.0):
        super().__init__()
        self.scale = float(scale)

    def _bind(self, in_spec: StreamSpec) -> StreamSpec:
        in_spec.require_complex("FMDemodInt")
        return in_spec.with_(dtype=jnp.int32)

    def init_carry(self):
        return jnp.zeros(self.in_spec.channels, jnp.int32)

    def apply(self, carry, x):
        re = jnp.clip(jnp.round(x.re * self.scale), -32768, 32767
                      ).astype(jnp.int32)
        im = jnp.clip(jnp.round(x.im * self.scale), -32768, 32767
                      ).astype(jnp.int32)
        phi = _div_trunc(fast_atan2_i16(re, im), jnp.int32(2))
        prev = jnp.concatenate([carry[..., None], phi[..., :-1]], axis=-1)
        # int16 wraparound of (prev - phi), as the C++ int16 subtraction does
        y = ((prev - phi + (1 << 15)) & 0xFFFF) - (1 << 15)
        return phi[..., -1], y
