"""Multi-chip wideband receiver: time-sharded channelizer + channel-sharded
demod bank — the flagship scale-out pipeline (BASELINE.json config 5).

Stage layout over an n-device 1-D mesh ('d',):

1. **Channelize + demodulate, time-sharded**: the wideband block (B,) is
   split along time; each device runs the SAME fused PFB+FM path as the
   single-chip op (ops/wideband_rx.py::wideband_fm_local — the Pallas
   kernel on TPU, its bit-equivalent XLA fallback elsewhere) on its B/n
   segment.  The P-frame filter history arrives as a ppermute halo (the
   distributed form of the channelizer carry).  The quadrature
   discriminator's y[-1] seed is the LEFT neighbor's last channelizer
   output, carried by a second tiny (1, M) ppermute: on the kernel path it
   is the kernel's own y_last EXPORT (an XLA recompute would differ by the
   kernel's ~1e-5 matmul error) and the first audio row is re-demodulated
   from it with the kernel's per-sample op sequence (fm_demod1); on the
   XLA fallback each shard recomputes its own last frame's y with the
   in-path op sequence and the seed enters the demod in-call.  Either way
   the n > 1 stream matches the n == 1 run (bit-exactly on the fallback
   and in interpret mode) while only f32 audio crosses the ICI in bulk.
2. **Reshard**: one all_to_all turns (t/n local time, M channels) into
   (t full time, M/n local channels) — the decimated AUDIO rides the ICI
   once (half the bytes of the complex channel bank).
3. **Per-channel decode, channel-sharded**: each device owns M/n channels
   over the full block; sequential per-channel state (bit-sync PLL) stays
   device-local.

This is the moral equivalent of sequence parallelism (stage 1) feeding data
parallelism (stage 3) with a single collective between them.  n == 1
degenerates to exactly the single-chip fused program (collectives skipped
statically — on this backend they lower ~6x slower than the op even on a
1-device mesh).
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

_LANES = 128


def channelize_local(x_local: Complex, hist: Complex, taps3_np, taps3_dev,
                     m: int, p: int) -> Complex:
    """Demod-free sibling of ops/wideband_rx.py::wideband_fm_local: the
    per-device channelize stage SHARED by single- and multi-chip bodies —
    the fused Pallas PFB kernel where shapes allow (ops/pallas_pfb.py),
    its bit-equivalent XLA fallback (:func:`channelize_segment`)
    elsewhere.  Returns the (..., M, t) channel-major complex bank."""
    from libsdr_tpu.ops import pallas_pfb
    from libsdr_tpu.ops.fir import kernel_dispatch

    lead = x_local.shape[:-1]
    t = x_local.shape[-1] // m
    use_k, interp = kernel_dispatch()
    if (not lead and t > p and use_k
            and pallas_pfb.mxu_pfb_supported(m, t, p,
                                             dtype=x_local.re.dtype)):
        frames = x_local.reshape((t, m))
        y_lane = pallas_pfb.pfb_mxu(frames, hist, taps3_np, m,
                                    interpret=interp)
        lp = pallas_pfb.lane_of_channel(m)
        return y_lane[:, lp].map(lambda a: jnp.swapaxes(a, -1, -2))
    return channelize_segment(x_local, hist, taps3_dev, m, p)


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


def _seed_from_frames(framesp1: Complex, taps3: jnp.ndarray, m: int,
                      p: int) -> Complex:
    """y (1, M) LANE-major of the single frame ``framesp1[p]`` given its
    own P-frame history ``framesp1[:p]`` — used on the XLA fallback path to
    compute a device's OWN last channelizer output, which rides a (1, M)
    ppermute to the right neighbor as its discriminator seed.  Identical op
    sequence to :func:`channelize_segment` on a one-frame segment, so it is
    bit-equal to this device's own in-path y_lane[-1] (the same value the
    n == 1 program feeds the demod)."""
    from libsdr_tpu.ops.pallas_pfb import channel_of_lane

    acc = None
    for k in range(p + 1):
        seg = framesp1[..., (p - k):(p - k) + 1, :]
        term = seg * taps3[k]
        acc = term if acc is None else acc + term
    # Tile the single frame to 8 rows before the DFT: a 1-row fft lowers to
    # a matvec whose reduction order differs from the multi-row matmul
    # (measured: 8.6e-7 divergence on CPU), while any >=2-row shape is
    # bitwise row-deterministic — the tile keeps the recomputed seed
    # bit-equal to the in-path channelizer output.
    acc = acc.map(lambda a: jnp.broadcast_to(
        a, a.shape[:-2] + (8, a.shape[-1])))
    y = fft(acc)[..., 0:1, :]                    # (..., 1, M) channel-major
    return y[..., channel_of_lane(m)]            # lane layout


def _lane_to_channel_cols(a: jnp.ndarray, m: int) -> jnp.ndarray:
    """Reorder the LANE-permuted columns of a (..., t, M) array to channel
    order (out[..., c] = a[..., lane_of_channel(m)[c]]).  The permutation
    lane L = 128*(c % n2) + c//n2 is exactly a (n2, 128) -> (128, n2) axis
    swap, so this lowers as one XLA transpose — no gather."""
    if m <= _LANES:
        return a
    n2 = m // _LANES
    lead = a.shape[:-1]
    b = a.reshape(lead + (n2, _LANES))
    b = jnp.swapaxes(b, -1, -2)
    return b.reshape(lead + (m,))


def build_wideband_step(mesh: Mesh, n_channels: int, block: int,
                        taps_per_branch: int = 8, axis: str = "d",
                        gain: float = 1.0, plane_dtype=None):
    """Build (step, init_carry, place_input) for the sharded wideband RX.

    ``step(carry, x)`` consumes a global (B,) complex block and returns the
    FM-demodulated (M, B/M) float32 channel bank, jit-compiled over the mesh
    with shard_map.  Every device runs the fused single-chip kernel path on
    its segment (see module docstring).
    """
    n = int(mesh.devices.size)
    m, p = n_channels, taps_per_branch
    _validate(block, m, n, p)
    taps_np, taps = _taps(m, p)

    def step_local(carry, x_local):
        return _wideband_body(carry, x_local, taps_np, taps, m, p, n, axis,
                              gain)

    if n == 1:
        body = step_local
    else:
        body = jax.shard_map(
            step_local, mesh=mesh,
            in_specs=(_carry_specs(), P(axis)),
            out_specs=(_carry_specs(), P(None, axis)),
            check_vma=False,
        )

    def step(carry, x):
        carry, audio_cols = body(carry, x)        # (t_full, M or M/n local)
        return carry, jnp.swapaxes(audio_cols, -1, -2)

    init_carry, place_input = _wideband_carry_and_place(
        mesh, m, p, axis, plane_dtype)
    return jax.jit(step), init_carry, place_input


def _validate(block: int, m: int, n: int, p: int) -> None:
    if block % (m * n):
        raise ValueError("block must divide by M * n_devices")
    if m % n:
        raise ValueError("channels must divide by n_devices")
    if block // (m * n) < p + 1:
        raise ValueError(
            "each device's segment must hold >= taps_per_branch + 1 frames "
            f"(block // (M*n) = {block // (m * n)} < P + 1 = {p + 1})")


def _taps(m: int, p: int):
    proto = prototype_lowpass(m, p)
    taps_np = fold_commutator(proto, m, p)
    return taps_np, jnp.asarray(taps_np)


def _carry_specs():
    # P-frame history + y[-1] lane seed, both replicated (they describe
    # the GLOBAL stream boundary; shard 0 consumes them).
    return (P(), P())


def _wideband_body(carry, x_local, taps_np, taps, m: int, p: int, n: int,
                   axis: str, gain: float = 1.0, reorder: bool = True):
    """The unified per-device wideband stages:

    1. ppermute P-frame halo (the channelizer history),
    2. the SAME fused channelize+FM path as the single-chip op
       (wideband_fm_local: Pallas kernel on TPU, XLA fallback elsewhere),
       then a second (1, M) ppermute of the kernel-exported y_last and a
       row-0 re-demod (fm_demod1) — the shard-boundary seed is the left
       neighbor's OWN channelizer output, so the sharded stream is
       bit-identical to the n == 1 run on both paths,
    3. lane -> channel column reorder (one transpose) + all_to_all reshard
       of the f32 audio: time-sharded -> channel-sharded.  For n == 1 the
       reorder is a pure column permutation, so callers whose downstream
       chain is lane-parallel (the scanner bit chain) pass
       ``reorder=False`` and permute the (decimated) RESULT instead —
       skipping a full (T, M) f32 pass.

    carry = (hist (P, M) raw frames, prev (1, M) lane y seed), both
    global-stream state.  Returns (new_carry, audio): (t_full, M/n)
    channel-ordered columns, or (t, M) LANE-ordered when n == 1 and
    ``reorder=False``."""
    from libsdr_tpu.ops.wideband_rx import (fm_demod1, fm_local_kernel_ok,
                                            wideband_fm_local)

    hist_g, prev_g = carry
    t_seg = x_local.shape[-1] // m
    # Slice the 1-D stream FIRST, then reshape the small piece: slicing a
    # reshape of the full block materializes the whole reshaped array on
    # this backend (~3 ms per 128 MB — see WidebandFM.apply's NOTE).
    tail = x_local[..., (t_seg - p) * m:].reshape((p, m))
    if n == 1:
        # Collectives on a 1-device mesh are identities, but this backend
        # lowers them (ppermute/all_to_all inside shard_map) to paths ~6x
        # slower than the op itself — skip them statically.
        hist = hist_g
        new_hist = tail
    else:
        idx = jax.lax.axis_index(axis)
        halo = pass_right(tail, axis)
        hist = _tree_where(idx == 0, hist_g, halo)
        new_hist = last_shard_tail(tail, axis)
    # Shard-boundary discriminator seed — each shard needs its LEFT
    # neighbor's last channelizer output (what the n == 1 program feeds the
    # demod at that position), by path:
    #   * XLA fallback: each shard computes its OWN last frame's y with the
    #     exact in-path op sequence (_seed_from_frames on its own tail) and
    #     a (1, M) ppermute hands it right; the demod consumes it IN-CALL,
    #     inside the same fused formula as every other row -> bit-exact.
    #   * Pallas kernel: the true value exists only as the kernel's y_last
    #     export, so the in-call seed is a placeholder and row 0 is
    #     re-demodulated AFTER a (1, M) ppermute of y_last with the
    #     kernel's own per-sample op sequence (fm_demod1).
    # Shard 0 always uses the carried global seed (a prior y_last export).
    kernel = fm_local_kernel_ok(x_local.shape[:-1], t_seg, m, p,
                                x_local.re.dtype)
    prev = prev_g
    if n > 1 and not kernel:
        tailp1 = x_local[..., (t_seg - (p + 1)) * m:].reshape((p + 1, m))
        my_last = _seed_from_frames(tailp1, taps, m, p)
        prev = _tree_where(idx == 0, prev_g, pass_right(my_last, axis))
    audio_lane, y_last, y_first = wideband_fm_local(
        x_local, hist, prev, taps_np, taps, m, p, gain=gain)
    if n > 1 and kernel:
        seed = pass_right(y_last, axis)
        row0 = fm_demod1(y_first, seed, gain)
        row0 = jnp.where(idx == 0, audio_lane[..., 0:1, :], row0)
        audio_lane = jax.lax.dynamic_update_slice_in_dim(
            audio_lane, row0, 0, axis=-2)
    new_prev = y_last if n == 1 else last_shard_tail(y_last, axis)
    if n == 1 and not reorder:
        return (new_hist, new_prev), audio_lane         # (t, M) lane
    audio_cols = _lane_to_channel_cols(audio_lane, m)   # (t_seg, M)
    if n > 1:
        audio_cols = jax.lax.all_to_all(audio_cols, axis, split_axis=1,
                                        concat_axis=0, tiled=True)
    return (new_hist, new_prev), audio_cols             # (t_full, M/n)


def _wideband_carry_and_place(mesh: Mesh, m: int, p: int, axis: str,
                              plane_dtype=None):
    """(init_carry, place_input) shared by the wideband/scanner builders.

    Placement goes through :func:`parallel.distributed.place_global`, so the
    same builders run unchanged in multi-process (DCN) deployments — each
    host then materializes only its own shards (host-sharded ingest)."""
    from libsdr_tpu.parallel.distributed import place_global

    dtype = plane_dtype if plane_dtype is not None else jnp.float32

    def init_carry():
        hist = jax.tree_util.tree_map(
            lambda a: place_global(a, mesh, P()),
            cplx.zeros((p, m), dtype))
        prev = jax.tree_util.tree_map(
            lambda a: place_global(a, mesh, P()),
            cplx.full_like_phasor((1, m)))
        return (hist, prev)

    def place_input(x):
        xb = cplx.as_block(x)
        return jax.tree_util.tree_map(
            lambda a: place_global(a, mesh, P(axis)), xb)

    return init_carry, place_input


def build_scanner_step(mesh: Mesh, n_channels: int, block: int,
                       fs_hz: float, taps_per_branch: int = 8,
                       baud: float = 1200.0, axis: str = "d",
                       compact_window: int = 0, plane_dtype=None,
                       packed: bool = False):
    """Sharded whole-band pager scanner: the unified wideband stages (fused
    time-sharded channelize+FM -> all_to_all audio reshard) extended with
    the ASK detector and bit-sync PLL, all in the kernel's natural
    TIME-major layout.  After the reshard each device owns M/n channels
    over the FULL block, so the per-channel sequential PLL runs
    device-local — on TPU via the Pallas bit-sync kernel
    (ops/pallas_bitsync.py) whenever the local channel count fills whole
    128-lane rows.  On one device the whole chain stays LANE-major
    (no full-rate transposes; the channel permutation applies to the
    decimated bits).

    ``step(carry, x)`` consumes a global (B,) complex block and returns a
    Ragged (M, T') uint8 bit stream (rows = channels, channel-major) —
    compact each channel's row and feed it to decode.pocsag_decode_bits.
    T' = B/M, or B/M/compact_window when ``compact_window`` > 0: the PLL
    emits bits >= ~fs_ch/baud samples apart (core/ragged.py
    ``min_valid_gap``), so any window up to that gap losslessly decimates
    the bit stream ON DEVICE — the (M, B/M) scatter compaction it
    replaces measured ~510 ms/block at the 1024-channel flagship vs ~2 ms
    for the windowed reduce.  Must divide B/M and not exceed the gap.
    """
    from libsdr_tpu import StreamSpec
    from libsdr_tpu.core.ragged import Ragged, min_valid_gap
    from libsdr_tpu.ops import ASKDetector, BitStream
    from libsdr_tpu.ops.pallas_pfb import lane_of_channel

    n = int(mesh.devices.size)
    m, p = n_channels, taps_per_branch
    _validate(block, m, n, p)
    taps_np, taps = _taps(m, p)
    t_full = block // m
    ch_rate = fs_hz / m
    g = m // n                       # channels per device after the reshard
    w = int(compact_window)

    # The bit chain runs time-major on the device-local channel group; a
    # GLOBAL binding builds the carry pytree (per-channel leaves sharded).
    def make_chain(nch):
        ask = ASKDetector(invert=True)
        bs = BitStream(baud, mode="normal", time_major=True)
        spec = StreamSpec(np.float32, ch_rate, t_full, channels=(nch,))
        bs.bind(ask.bind(spec))
        return ask, bs

    ask_l, bs_l = make_chain(g)
    _, bs_g = make_chain(m)
    if w:
        if t_full % w:
            raise ValueError(f"compact_window {w} must divide T={t_full}")
        if w > min_valid_gap(bs_g):
            raise ValueError(
                f"compact_window {w} exceeds the PLL's guaranteed bit gap "
                f"{min_valid_gap(bs_g)} — bits could be lost")

    def _window_rows(a, fill):
        # (T, C) time-major -> (T/w, C): <=1 valid per window (see above).
        if not w:
            return a
        t = a.shape[0]
        aw = a.reshape((t // w, w) + a.shape[1:])
        if a.dtype == jnp.bool_:
            return jnp.any(aw, axis=1)
        return jnp.sum(jnp.where(fill.reshape(aw.shape), aw, 0),
                       axis=1).astype(a.dtype)

    def _out(data, vw):
        # (C, T') channel-major: Ragged, or ONE uint8 array with bit 0 =
        # data and bit 1 = valid (``packed``) — halves the device->host
        # readback bytes, which the tunnel serializes at ~200 MB/s.
        data = jnp.swapaxes(data, -1, -2)
        vw = jnp.swapaxes(vw, -1, -2)
        if packed:
            return data | (vw.astype(jnp.uint8) << 1)
        return Ragged(data, vw)

    def _bits_out(bits):
        # time-major (T, C) -> windowed -> channel-major contract
        valid = bits.valid
        return _out(_window_rows(bits.data, valid),
                    _window_rows(valid, valid))

    def step_local(carry, x_local):
        wb_carry, bsc = carry
        wb_carry, audio_cols = _wideband_body(
            wb_carry, x_local, taps_np, taps, m, p, n, axis)
        # audio_cols: (t_full, g) time-major, channel-ordered columns —
        # exactly the bit chain's time_major layout.
        _, sym = ask_l.apply(None, audio_cols)
        bsc, bits = bs_l.apply(bsc, sym)
        return (wb_carry, bsc), _bits_out(bits)

    if n == 1:
        # Single-chip: keep the WHOLE chain lane-major — the PLL recurrence
        # is per-lane, so lane order only matters at the END, where the
        # permutation applies to the (windowed) bits instead of a full-rate
        # (T, M) f32 audio pass + (M, T) uint8 regather.
        lp = np.asarray(lane_of_channel(m))

        def step_lane(carry, x_local):
            wb_carry, bsc = carry
            wb_carry, audio_lane = _wideband_body(
                wb_carry, x_local, taps_np, taps, m, p, 1, axis,
                reorder=False)
            _, sym = ask_l.apply(None, audio_lane)
            bsc, bits = bs_l.apply(bsc, sym)
            valid = bits.valid
            return (wb_carry, bsc), _out(
                _window_rows(bits.data, valid)[..., lp],
                _window_rows(valid, valid)[..., lp])

        step = jax.jit(step_lane)
    else:
        def leaf_spec(v):
            return P() if np.ndim(v) == 0 else P(
                axis, *([None] * (np.ndim(v) - 1)))
        bs_carry_spec = jax.tree_util.tree_map(leaf_spec, bs_g.init_carry())
        step = jax.jit(jax.shard_map(
            step_local, mesh=mesh,
            in_specs=((_carry_specs(), bs_carry_spec), P(axis)),
            out_specs=((_carry_specs(), bs_carry_spec),
                       (P(axis, None) if packed
                        else Ragged(P(axis, None), P(axis, None)))),
            check_vma=False,
        ))

    wb_init, place_input = _wideband_carry_and_place(
        mesh, m, p, axis, plane_dtype)

    def init_carry():
        from libsdr_tpu.parallel.distributed import place_global
        bsc = jax.tree_util.tree_map(
            lambda v: place_global(
                v, mesh, P() if v.ndim == 0 else P(axis)),
            bs_g.init_carry())
        return (wb_init(), bsc)

    return step, init_carry, place_input
