"""Ragged block outputs.

Decoders emit a variable number of items per fixed-size input block (bits from
the bit-sync PLL, chars from Varicode...).  The reference handles this with
variable-length ``Buffer::head(o)`` views (e.g. src/fsk.cc:201); under XLA
shapes must be static, so a ragged stream is a fixed-capacity ``data`` array
plus a boolean ``valid`` mask, compacted on the host with :func:`compact`.
"""

from __future__ import annotations

import jax
import numpy as np


@jax.tree_util.register_pytree_node_class
class Ragged:
    """Fixed-capacity block with a validity mask (time = trailing axis)."""

    __slots__ = ("data", "valid")

    def __init__(self, data, valid):
        self.data = data
        self.valid = valid

    def tree_flatten(self):
        return (self.data, self.valid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.data.shape

    def __repr__(self):
        return f"Ragged(capacity={self.data.shape}, dtype={self.data.dtype})"


def compact(r) -> np.ndarray:
    """Host-side: extract the valid items of a (possibly multi-block
    concatenated) ragged stream as a dense 1-D (or per-channel list) array."""
    data = np.asarray(r.data)
    valid = np.asarray(r.valid).astype(bool)
    if data.ndim == 1:
        return data[valid]
    # leading channel dims: return an object array of per-channel vectors
    flat_d = data.reshape(-1, data.shape[-1])
    flat_v = valid.reshape(-1, valid.shape[-1])
    return [d[v] for d, v in zip(flat_d, flat_v)]


def concat_host(blocks) -> "Ragged":
    """Concatenate host-side ragged blocks along time."""
    return Ragged(np.concatenate([np.asarray(b.data) for b in blocks], axis=-1),
                  np.concatenate([np.asarray(b.valid) for b in blocks], axis=-1))
