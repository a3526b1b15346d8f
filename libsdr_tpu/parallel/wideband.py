"""Multi-chip wideband receiver: time-sharded channelizer + channel-sharded
demod bank — the flagship scale-out pipeline (BASELINE.json config 5).

Stage layout over an n-device 1-D mesh ('d',):

1. **Channelize, time-sharded**: the wideband block (B,) is split along
   time; each device runs the polyphase channelizer on its B/n segment, with
   the P-frame filter history exchanged as a ppermute halo (the distributed
   form of the channelizer carry).
2. **Reshard**: one all_to_all turns (M channels, t/n local time) into
   (M/n local channels, t full time) — channels ride the ICI once.
3. **Demodulate, channel-sharded**: each device FM-demodulates its M/n
   channels over the full block; per-channel demod state (prev sample)
   stays device-local.

This is the moral equivalent of sequence parallelism (stage 1) feeding data
parallelism (stage 3) with a single collective between them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from libsdr_tpu.core import cplx
from libsdr_tpu.core.cplx import Complex
from libsdr_tpu.ops.channelizer import fold_commutator, prototype_lowpass
from libsdr_tpu.ops.fft import fft
from libsdr_tpu.parallel.halo import _tree_where, last_shard_tail, pass_right


def channelize_segment(x_local: Complex, hist: Complex, taps3: jnp.ndarray,
                       m: int, p: int) -> Complex:
    """Channelizer body on a time segment given the P-frame history (same
    math as ops/channelizer.py Channelizer.apply: commutator folded into
    ``taps3 = fold_commutator(...)`` + forward DFT)."""
    lead = x_local.shape[:-1]
    t = x_local.shape[-1] // m
    frames = x_local.reshape(lead + (t, m))
    histf = cplx.concatenate([hist, frames], axis=-2)
    acc = None
    for k in range(p + 1):
        seg = histf[..., (p - k):(p - k) + t, :]
        term = seg * taps3[k]
        acc = term if acc is None else acc + term
    y = fft(acc)
    return y.map(lambda a: jnp.swapaxes(a, -1, -2))  # (..., M, t)


def build_wideband_step(mesh: Mesh, n_channels: int, block: int,
                        taps_per_branch: int = 8, axis: str = "d"):
    """Build (step, init_carry, place_input) for the sharded wideband RX.

    ``step(carry, x)`` consumes a global (B,) complex block and returns the
    FM-demodulated (M, B/M) float32 channel bank, jit-compiled over the mesh
    with shard_map.
    """
    n = int(mesh.devices.size)
    m, p = n_channels, taps_per_branch
    if block % (m * n):
        raise ValueError("block must divide by M * n_devices")
    if m % n:
        raise ValueError("channels must divide by n_devices")
    if block // (m * n) < p:
        raise ValueError(
            "each device's segment must hold >= taps_per_branch frames "
            f"(block // (M*n) = {block // (m * n)} < P = {p})")
    proto = prototype_lowpass(m, p)
    taps = jnp.asarray(fold_commutator(proto, m, p))

    def step_local(carry, x_local):
        hist_global, prev_local = carry
        new_hist, new_prev, audio = _wideband_body(
            hist_global, prev_local, x_local, taps, m, p, n, axis)
        return (new_hist, new_prev), audio

    if n == 1:
        step = jax.jit(step_local)
    else:
        step = jax.jit(jax.shard_map(
            step_local, mesh=mesh,
            in_specs=((P(), P(axis)), P(axis)),
            out_specs=((P(), P(axis)), P(axis, None)),
            check_vma=False,
        ))

    init_carry, place_input = _wideband_carry_and_place(mesh, m, p, axis)
    return step, init_carry, place_input


def _wideband_body(hist_global, prev_local, x_local, taps, m: int, p: int,
                   n: int, axis: str):
    """The shared per-device wideband stages:

    1. time-sharded channelizer with a ppermute frame halo,
    2. all_to_all reshard channels <-> time,
    3. channel-sharded quadrature FM demod.

    Returns (new_hist, new_prev, audio (M/n, t_full))."""
    t_seg = x_local.shape[-1] // m
    frames_local = x_local.reshape((t_seg, m))
    tail_frames = frames_local[t_seg - p:, :]
    if n == 1:
        # Collectives on a 1-device mesh are identities, but this backend
        # lowers them (ppermute/all_to_all inside shard_map) to paths ~6x
        # slower than the op itself — skip them statically.
        hist = hist_global
        new_hist = tail_frames
    else:
        idx = jax.lax.axis_index(axis)
        halo = pass_right(tail_frames, axis)
        hist = _tree_where(idx == 0, hist_global, halo)
        new_hist = last_shard_tail(tail_frames, axis)
    y = channelize_segment(x_local, hist, taps, m, p)       # (M, t_seg)
    if n > 1:
        def a2a(a):
            return jax.lax.all_to_all(a, axis, split_axis=0,
                                      concat_axis=1, tiled=True)
        y = y.map(a2a)                                      # (M/n, t_full)
    shifted = cplx.concatenate([prev_local[..., None], y[..., :-1]],
                               axis=-1)
    audio = (y * shifted.conj()).angle()
    return new_hist, y[..., -1], audio


def _wideband_carry_and_place(mesh: Mesh, m: int, p: int, axis: str):
    """(init_carry, place_input) shared by the wideband/scanner builders.

    Placement goes through :func:`parallel.distributed.place_global`, so the
    same builders run unchanged in multi-process (DCN) deployments — each
    host then materializes only its own shards (host-sharded ingest)."""
    from libsdr_tpu.parallel.distributed import place_global

    def init_carry():
        hist = jax.tree_util.tree_map(
            lambda a: place_global(a, mesh, P()), cplx.zeros((p, m)))
        prev = jax.tree_util.tree_map(
            lambda a: place_global(a, mesh, P(axis)),
            cplx.full_like_phasor((m,)))
        return (hist, prev)

    def place_input(x):
        xb = cplx.as_block(x)
        return jax.tree_util.tree_map(
            lambda a: place_global(a, mesh, P(axis)), xb)

    return init_carry, place_input


def build_scanner_step(mesh: Mesh, n_channels: int, block: int,
                       fs_hz: float, taps_per_branch: int = 8,
                       baud: float = 1200.0, axis: str = "d"):
    """Sharded whole-band pager scanner: the wideband stages (time-sharded
    channelizer -> all_to_all reshard -> channel-sharded FM demod) extended
    with the ASK detector and bit-sync PLL.  After the reshard each device
    owns M/n channels over the FULL block, so the per-channel sequential PLL
    scan is device-local — this is exactly why the reshard sits where it
    does (the PLL cannot scan across a time-sharded axis).

    ``step(carry, x)`` consumes a global (B,) complex block and returns a
    Ragged (M, B/M) uint8 bit stream — compact each channel's row and feed
    it to decode.pocsag_decode_bits.
    """
    from libsdr_tpu import StreamSpec
    from libsdr_tpu.core.ragged import Ragged
    from libsdr_tpu.ops import ASKDetector, BitStream

    n = int(mesh.devices.size)
    m, p = n_channels, taps_per_branch
    if block % (m * n) or m % n:
        raise ValueError("need block % (M*n) == 0 and M % n == 0")
    if block // (m * n) < p:
        raise ValueError(
            "each device's segment must hold >= taps_per_branch frames "
            f"(block // (M*n) = {block // (m * n)} < P = {p})")
    proto = prototype_lowpass(m, p)
    taps = jnp.asarray(fold_commutator(proto, m, p))
    t_full = block // m
    ch_rate = fs_hz / m

    if n == 1:
        # Single-chip fast path: the fused PFB+FM Pallas kernel feeds the
        # bit chain in its natural TIME-major lane layout (no transposes
        # until the final ragged-bit regather to the (M, T) contract).  On
        # non-TPU backends WidebandFM's XLA fallback computes the same
        # values, so outputs are identical to the sharded path.
        from libsdr_tpu.ops.wideband_rx import WidebandFM

        wb = WidebandFM(m, p, gain=1.0, layout="lane")
        wb.bind(StreamSpec(np.complex64, fs_hz, block))
        ask_t = ASKDetector(invert=True)
        bs_t = BitStream(baud, mode="normal", time_major=True)
        spec_t = StreamSpec(np.float32, ch_rate, t_full, channels=(m,))
        bs_t.bind(ask_t.bind(spec_t))
        lane = wb.lane_of_channel

        def step_fused(carry, x_local):
            wbc, bsc = carry
            wbc, audio = wb.apply(wbc, x_local)        # (T, M) lane-major
            _, sym = ask_t.apply(None, audio)
            bsc, bits = bs_t.apply(bsc, sym)
            data = jnp.swapaxes(bits.data[..., lane], -1, -2)
            valid = jnp.swapaxes(bits.valid[..., lane], -1, -2)
            return (wbc, bsc), Ragged(data, valid)

        def init_carry_fused():
            return (wb.init_carry(), bs_t.init_carry())

        return (jax.jit(step_fused), init_carry_fused,
                lambda x: cplx.as_block(x))

    # Two bindings of the bit chain: LOCAL (per-device channel count) for
    # the shard_map body, GLOBAL (all M channels) for carry construction.
    def make_chain(nch):
        ask = ASKDetector(invert=True)
        bs = BitStream(baud, mode="normal")
        spec = StreamSpec(np.float32, ch_rate, t_full, channels=(nch,))
        bs.bind(ask.bind(spec))
        return ask, bs

    ask_l, bs_l = make_chain(m // n)
    _, bs_g = make_chain(m)

    def step_local(carry, x_local):
        hist_global, prev_local, bsc = carry
        new_hist, new_prev, audio = _wideband_body(
            hist_global, prev_local, x_local, taps, m, p, n, axis)
        _, sym = ask_l.apply(None, audio)
        bsc, bits = bs_l.apply(bsc, sym)
        return (new_hist, new_prev, bsc), bits

    # (n == 1 returned above with the fused single-chip path.)
    # Derive the BitStream carry spec from its own pytree (scalars
    # replicated, per-channel leaves sharded on the channel axis) so the
    # scanner never restates bitsync.py's internal state fields.
    def leaf_spec(v):
        return P() if np.ndim(v) == 0 else P(
            axis, *([None] * (np.ndim(v) - 1)))
    bs_carry_spec = jax.tree_util.tree_map(leaf_spec, bs_g.init_carry())
    step = jax.jit(jax.shard_map(
        step_local, mesh=mesh,
        in_specs=((P(), P(axis), bs_carry_spec), P(axis)),
        out_specs=((P(), P(axis), bs_carry_spec),
                   Ragged(P(axis, None), P(axis, None))),
        check_vma=False,
    ))

    wb_init, place_input = _wideband_carry_and_place(mesh, m, p, axis)

    def init_carry():
        from libsdr_tpu.parallel.distributed import place_global
        hist, prev = wb_init()
        bsc = jax.tree_util.tree_map(
            lambda v: place_global(
                v, mesh, P() if v.ndim == 0 else P(axis)),
            bs_g.init_carry())
        return (hist, prev, bsc)

    return step, init_carry, place_input
