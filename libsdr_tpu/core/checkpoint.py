"""Checkpoint / resume of streaming state.

The reference has no checkpointing (SURVEY.md section 5): its DSP state is
scattered across mutable node members.  Here ALL state is the explicit carry
pytree, so resume-at-block-N is just (carry, position) serialization: a
pipeline restarted from a checkpoint continues bit-identically.
"""

from __future__ import annotations

import json
import os
from typing import Any, Tuple

import jax
import numpy as np


def _storable(a: np.ndarray) -> np.ndarray:
    """npz cannot store ml_dtypes (bfloat16 round-trips as raw void bytes);
    widen such leaves to float32 — lossless, and load_checkpoint casts back
    to the live carry's dtype."""
    a = np.asarray(a)
    if a.dtype.kind == "V" or str(a.dtype) in ("bfloat16", "float8_e4m3fn",
                                               "float8_e5m2"):
        return a.astype(np.float32)
    return a


def save_checkpoint(path: str, carry: Any, position: int,
                    meta: dict | None = None) -> None:
    """Serialize a carry pytree + stream position to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    arrays = {f"leaf_{i}": _storable(l) for i, l in enumerate(leaves)}
    header = json.dumps({
        "position": int(position),
        "n_leaves": len(leaves),
        "treedef": str(treedef),
        "meta": meta or {},
    })
    np.savez(path, __header__=np.frombuffer(header.encode(), np.uint8),
             **arrays)


def load_checkpoint(path: str, carry_like: Any) -> Tuple[Any, int, dict]:
    """Restore (carry, position, meta); ``carry_like`` (e.g.
    ``pipeline.init_carry()``) provides the pytree structure and device
    placement."""
    with np.load(path) as z:
        header = json.loads(bytes(z["__header__"]).decode())
        leaves = [z[f"leaf_{i}"] for i in range(header["n_leaves"])]
    like_leaves, treedef = jax.tree_util.tree_flatten(carry_like)
    if len(like_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, pipeline carry has "
            f"{len(like_leaves)} — pipeline structure changed?")
    restored = [
        jax.device_put(np.asarray(saved, dtype=np.asarray(like).dtype),
                       like.sharding) if hasattr(like, "sharding")
        else np.asarray(saved)
        for saved, like in zip(leaves, like_leaves)]
    return (jax.tree_util.tree_unflatten(treedef, restored),
            header["position"], header["meta"])


def run_resumable(pipeline, blocks, checkpoint_path: str,
                  checkpoint_every: int = 64, sink=None):
    """Drive a pipeline with periodic checkpoints; resumes automatically if
    ``checkpoint_path`` exists.  Returns the final (carry, position).

    Blocks must be an indexable/re-iterable factory: a callable
    ``blocks(start_block) -> iterator`` so resume can skip ahead — the
    failure-recovery contract the reference lacks (SURVEY.md section 5).
    """
    from libsdr_tpu.core import cplx

    carry = pipeline.init_carry()
    start = 0
    if os.path.exists(checkpoint_path):
        carry, start, _ = load_checkpoint(checkpoint_path, carry)
    step = pipeline.compile()
    pos = start
    for blk in blocks(start):
        carry, y = step(carry, cplx.as_block(blk))
        if sink is not None:
            sink(cplx.to_numpy(y))
        pos += 1
        if pos % checkpoint_every == 0:
            save_checkpoint(checkpoint_path, carry, pos)
    save_checkpoint(checkpoint_path, carry, pos)
    return carry, pos
