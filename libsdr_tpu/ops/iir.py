"""IIR filtering on TPU via parallel (associative) scans.

The reference's only IIR filters are first-order exponential averages — the
FM de-emphasis (reference: src/demod.hh:342-351) and the AGC envelope
(reference: src/utils.hh:657-793).  A first-order recurrence
``y[n] = a*y[n-1] + b[n]`` is associative under

    (a2, b2) o (a1, b1) = (a1*a2, a2*b1 + b2)

so it runs in O(log B) depth with ``jax.lax.associative_scan`` — fully
parallel on the VPU instead of a sequential per-sample loop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def iir_first_order(x: jnp.ndarray, a, b, y0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run ``y[n] = a*y[n-1] + b*x[n]`` along the trailing axis.

    Args:
      x: (..., B) input block.
      a, b: scalar coefficients (or broadcastable to x's leading dims).
      y0: (...,) initial state ``y[-1]``.

    Returns:
      (y, y_last): the full output block and the final state.
    """
    a = jnp.asarray(a, dtype=x.dtype)
    bx = jnp.asarray(b, dtype=x.dtype) * x
    # Fold the initial condition into the first element.
    bx = bx.at[..., 0].add(a * y0)
    a_full = jnp.broadcast_to(a, x.shape)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, ar * bl + br

    _, y = jax.lax.associative_scan(combine, (a_full, bx), axis=-1)
    return y, y[..., -1]


def iir_first_order_varcoef(x: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                            y0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same as :func:`iir_first_order` but with per-sample coefficients
    (needed by the AGC, whose decay depends on the signal)."""
    bx = b * x
    bx = bx.at[..., 0].add(a[..., 0] * y0)
    a = a.at[..., 0].set(jnp.ones_like(a[..., 0]))

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, ar * bl + br

    _, y = jax.lax.associative_scan(combine, (a, bx), axis=-1)
    return y, y[..., -1]
