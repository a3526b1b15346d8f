"""Fused wideband receiver op: PFB channelizer + quadrature FM demod bank.

One Processor executes the whole wideband front end (the reference's
FilterNode band bank + per-band FMDemod chains,
/root/reference/src/filternode.hh:231-283 + demod.hh:242-254) as a single
Pallas kernel (ops/pallas_pfb.py) on TPU: the wideband block is read from
HBM once and only the f32 audio bank is written — measured ~18 Gsps at
M=1024 on the v5e vs ~2.2 Gsps for the staged XLA path.

Layouts:
  * ``layout='lane'`` (fast): output is (F, M) f32, TIME-major, with
    channels lane-PERMUTED — lane L carries channel ``channel_of_lane(M)[L]``
    (center freq c*fs/M).  Per-channel downstream ops (ASK, bit-sync scans)
    are lane-parallel and layout-agnostic; use the maps for channel naming.
  * ``layout='channel'``: conventional (..., M, F) channel-major output,
    identical to [Channelizer -> FMDemod] — costs one transpose+gather of
    the (decimated) audio.  This is what the fusion pass installs so the
    public pipeline contract is unchanged.

The op's carry is (P history frames, y[-1] per lane): the same information
as Channelizer's carry plus FMDemod's, so streamed block boundaries match
the unfused pair (verified in tests/test_pallas_pfb.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from libsdr_tpu.core import cplx
from libsdr_tpu.core.block import Processor
from libsdr_tpu.core.cplx import Complex
from libsdr_tpu.core.stream import ConfigError, StreamSpec
from libsdr_tpu.ops.channelizer import fold_commutator, prototype_lowpass


def fm_local_kernel_ok(lead, f_total: int, m: int, p: int, dtype) -> bool:
    """Whether :func:`wideband_fm_local` will take the Pallas kernel path
    for these shapes in the CURRENT trace context — exposed so the sharded
    step (parallel/wideband.py) can pick the matching row-0 re-demod
    formula (:func:`fm_demod1`)."""
    from libsdr_tpu.ops import pallas_pfb
    from libsdr_tpu.ops.fir import kernel_dispatch

    use_k, _ = kernel_dispatch()
    return bool(not tuple(lead) and f_total > p and use_k
                and pallas_pfb.mxu_pfb_supported(m, f_total, p, dtype=dtype,
                                                 demod=True))


def fm_demod1(y, prev, gain: float):
    """ONE discriminator output row per lane from (..., 1, M) ``y`` and
    ``prev`` — the EXACT elementwise op sequence of the Pallas kernel's
    demod epilogue (planar z products + ``_atan2_poly``,
    ops/pallas_pfb.py::_kernel_pfb), so a row patched with this matches the
    in-kernel value.  Used by the sharded wideband step to seed shard
    boundaries with the left neighbor's kernel-exported y_last (the XLA
    fallback path instead seeds its boundaries IN-CALL)."""
    from libsdr_tpu.ops.pallas_fir_mxu import _atan2_poly
    zr = y.re * prev.re + y.im * prev.im
    zi = y.im * prev.re - y.re * prev.im
    return jnp.float32(gain) * _atan2_poly(zi, zr)


def wideband_fm_local(x, hist, prev, taps3_np, taps3_dev, m: int, p: int,
                      gain: float = 1.0):
    """The per-device fused channelize+FM stage, SHARED by the single-chip
    op (:class:`WidebandFM`) and the multi-chip shard_map bodies
    (parallel/wideband.py) — a device-local segment is just a smaller
    single-chip problem, so both paths dispatch to the same Pallas kernel
    (or its bit-equivalent XLA fallback off-TPU).

    Args:
      x: (..., B_local) planar complex 1-D segment (B_local % m == 0).
      hist: (..., P, M) planar carry/halo frames preceding the segment.
      prev: (..., 1, M) planar y[-1] per LANE (discriminator seed).
      taps3_np / taps3_dev: folded-commutator taps (numpy for the kernel
        const cache, device array for the XLA fallback).

    Returns (audio_lane (..., F, M) f32 time-major lane-permuted,
    y_last (..., 1, M) planar — the next segment's ``prev`` — and
    y_first (..., 1, M) planar — the first frame's channel samples, the
    RIGHT neighbor's true seed in the sharded step).
    """
    from libsdr_tpu.ops import pallas_pfb
    from libsdr_tpu.ops.fir import kernel_dispatch
    from libsdr_tpu.parallel.wideband import channelize_segment

    lead = x.shape[:-1]
    f_total = x.shape[-1] // m
    _, interp = kernel_dispatch()
    if fm_local_kernel_ok(lead, f_total, m, p, x.re.dtype):
        frames = x.reshape(lead + (f_total, m))
        return pallas_pfb.pfb_mxu(frames, hist, taps3_np, m, gain=gain,
                                  prev=prev, demod=True, interpret=interp)
    # XLA fallback (CPU / leading dims / unsupported shapes): staged
    # channelize + demod in the kernel's lane layout.
    chan = pallas_pfb.channel_of_lane(m)
    y_chan = channelize_segment(x, hist, taps3_dev, m, p)
    y_lane = y_chan[..., chan, :].map(
        lambda a: jnp.swapaxes(a, -1, -2))            # (..., F, M)
    shifted = cplx.concatenate([prev, y_lane[..., :-1, :]], axis=-2)
    audio_lane = (y_lane * shifted.conj()).angle() * gain
    return (audio_lane, y_lane[..., f_total - 1:f_total, :],
            y_lane[..., 0:1, :])


class WidebandFM(Processor):
    """Fused channelizer + FM demod bank over a wideband stream.

    Args:
      n_channels: channel count M (output rate fs/M per channel).
      taps_per_branch: polyphase taps P per branch.
      gain: demod audio gain (reference FMDemod scale contract).
      prototype: optional custom prototype filter (length M*P).
      layout: 'lane' (time-major lane-permuted, fast) or 'channel'
        ((..., M, F) channel-major, drop-in for Channelizer->FMDemod).
    """

    def __init__(self, n_channels: int, taps_per_branch: int = 8,
                 gain: float = 1.0, prototype: Optional[np.ndarray] = None,
                 layout: str = "lane"):
        super().__init__()
        if layout not in ("lane", "channel"):
            raise ConfigError(f"WidebandFM: unknown layout {layout!r}")
        self.m = int(n_channels)
        self.p = int(taps_per_branch)
        self.gain = float(gain)
        self.layout = layout
        self._proto = prototype

    def _bind(self, in_spec: StreamSpec) -> StreamSpec:
        in_spec.require_complex("WidebandFM")
        m, p = self.m, self.p
        in_spec.require_block_multiple("WidebandFM", m)
        # The carry is the last P raw frames of the block, so each block
        # must contain at least P frames (apply slices x[(F-P)*M:]).
        if in_spec.block_size // m < p:
            raise ConfigError(
                f"WidebandFM: block holds {in_spec.block_size // m} frames, "
                f"needs >= taps_per_branch = {p} (block_size >= M*P)")
        proto = (np.asarray(self._proto) if self._proto is not None
                 else prototype_lowpass(m, p))
        if len(proto) != m * p:
            raise ConfigError(
                f"WidebandFM: prototype length {len(proto)} != M*P = {m * p}")
        # Pallas modules load lazily (bind time, not package import time).
        from libsdr_tpu.ops import pallas_pfb
        self._taps3 = fold_commutator(proto, m, p)
        self._taps3_dev = jnp.asarray(self._taps3)
        self._lp = pallas_pfb.lane_of_channel(m)
        self._chan = pallas_pfb.channel_of_lane(m)
        return in_spec.with_(
            dtype=jnp.float32, plane_dtype=None,
            channels=in_spec.channels + (m,),
            sample_rate=in_spec.sample_rate / m,
            block_size=in_spec.block_size // m)

    @property
    def channel_of_lane(self) -> np.ndarray:
        """chan[L] = channel index carried by output lane L (layout='lane')."""
        return self._chan

    @property
    def lane_of_channel(self) -> np.ndarray:
        """lane[c] = output lane carrying channel c (layout='lane')."""
        return self._lp

    def init_carry(self):
        m, p = self.m, self.p
        lead = self.in_spec.channels
        hist = cplx.zeros(lead + (p, m), self.in_spec.real_dtype)
        prev = Complex(jnp.ones(lead + (1, m), jnp.float32),
                       jnp.zeros(lead + (1, m), jnp.float32))
        return (hist, prev)

    def apply(self, carry, x):
        m, p = self.m, self.p
        hist, prev = carry       # hist (..., p, m); prev (..., 1, m) [lane]
        lead = x.shape[:-1]
        b = x.shape[-1]
        f_total = b // m
        audio_lane, new_prev, _ = wideband_fm_local(
            x, hist, prev, self._taps3, self._taps3_dev, m, p,
            gain=self.gain)
        # Carry: the last P raw frames.  NOTE: slice the 1-D stream FIRST,
        # then reshape the small piece — slicing a reshape of the full block
        # materializes the whole reshaped array (~3 ms at 128 MB, measured).
        new_hist = x[..., (f_total - p) * m:].reshape(lead + (p, m))
        if self.layout == "channel":
            audio = jnp.swapaxes(audio_lane[..., self._lp], -1, -2)
        else:
            audio = audio_lane
        return (new_hist, new_prev), audio
