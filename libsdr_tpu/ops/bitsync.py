"""Bit-clock recovery PLL (reference: src/fsk.{hh,cc} BitStream).

The reference recovers the bit clock with a per-sample PLL: a majority vote
over the last L symbols, a phase accumulator that samples a bit on overflow,
and a +-0.5% bounded frequency nudge on every symbol transition
(reference: src/fsk.cc:157-202).  This is inherently sequential per channel,
so it runs as a ``lax.scan`` over time with all state vectorized over the
leading channel dims — sequential in time, massively parallel across
channels (SURVEY.md section 7 "hard parts").

Output is a :class:`~libsdr_tpu.core.ragged.Ragged` bit stream: one slot per
input symbol, valid where the PLL sampled a bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from libsdr_tpu.core.block import Processor
from libsdr_tpu.core.ragged import Ragged
from libsdr_tpu.core.stream import StreamSpec

NORMAL = "normal"          # mark -> 1, space -> 0
TRANSITION = "transition"  # transition -> 0, no transition -> 1 (NRZI)


class BitStream(Processor):
    """Args:
      baud: bit rate of the input symbol stream.
      mode: 'normal' or 'transition' (reference: src/fsk.hh:127-131).
      time_major: when True, blocks are (T, channels...) instead of
        (channels..., T) — the natural layout of the fused wideband kernel
        (ops/wideband_rx.py layout='lane') and of the scan itself, skipping
        two transposes per block.  The carry layout is unchanged.
    """

    def __init__(self, baud: float, mode: str = TRANSITION,
                 time_major: bool = False):
        super().__init__()
        if mode not in (NORMAL, TRANSITION):
            raise ValueError(f"BitStream: unknown mode {mode!r}")
        self.baud = float(baud)
        self.mode = mode
        self.time_major = bool(time_major)

    def _bind(self, in_spec: StreamSpec) -> StreamSpec:
        in_spec.require_dtype("BitStream", jnp.uint8)
        fs = in_spec.rate_hz
        self.corr_len = int(fs / self.baud)       # src/fsk.cc:122
        self._omega0 = self.baud / fs             # src/fsk.cc:127
        self._omega_min = self._omega0 * (1 - 0.005)  # src/fsk.cc:129-130
        self._omega_max = self._omega0 * (1 + 0.005)
        self._pll_gain = 0.0005                   # src/fsk.cc:132
        return in_spec.with_(dtype=jnp.uint8, sample_rate=self.baud,
                             ragged=True)

    def init_carry(self):
        ch = self.in_spec.channels
        L = self.corr_len
        return dict(
            # last L-1 symbol signs + the previous windowed sum: together
            # they replace the reference's per-sample majority ring — the
            # windowed sum is data-independent of the PLL state, so it is
            # precomputed OUTSIDE the sequential scan (a cumsum), leaving
            # an O(1)-per-channel scan body.
            signs=jnp.zeros(ch + (L - 1,), jnp.int32),
            sym_sum=jnp.zeros(ch, jnp.int32),
            phase=jnp.zeros(ch, jnp.float32),
            omega=jnp.full(ch, self._omega0, jnp.float32),
            last_bits=jnp.zeros(ch, jnp.int32),
        )

    def apply(self, carry, x):
        L = self.corr_len
        mode_transition = self.mode == TRANSITION
        x_t = x if self.time_major else jnp.moveaxis(x, -1, 0)  # (T, ch..)

        t_steps = x_t.shape[0]
        ch_shape = x_t.shape[1:]
        m_flat = int(np.prod(ch_shape)) if ch_shape else 1
        from libsdr_tpu.ops.fir import kernel_dispatch
        from libsdr_tpu.ops.pallas_bitsync import bitsync_pallas_supported
        use_k, interp = kernel_dispatch()
        # Lanes pad up to whole 128-lane rows: a 64-channel bank runs the
        # kernel on 128 lanes (pad lanes carry zero symbols, outputs and
        # states discarded) — still ~60x cheaper than the per-step scan on
        # long blocks (the scan costs ~0.5 us/step regardless of width; the
        # AX.25 bank at 64 ch x 512k audio steps measured ~260 ms on it).
        m_pad = -(-m_flat // 128) * 128
        if use_k and bitsync_pallas_supported(t_steps, m_pad, L):
            # Fused majority+PLL Pallas kernel: same recurrence as below,
            # bit-exact, ~5x faster on wide channel banks (VMEM sign ring +
            # register-resident PLL state instead of block cumsums and
            # per-step XLA slicing; see ops/pallas_bitsync.py).
            from libsdr_tpu.ops.pallas_bitsync import (pll_pallas,
                                                       preferred_variant)

            def pad(a):
                if m_pad == m_flat:
                    return a
                widths = [(0, 0)] * (a.ndim - 1) + [(0, m_pad - m_flat)]
                return jnp.pad(a, widths)

            out, sg2, ss2, phase, omega, last_bits = pll_pallas(
                pad(x_t.reshape(t_steps, m_flat)),
                pad(jnp.moveaxis(carry["signs"], -1, 0
                                 ).reshape(L - 1, m_flat)),
                pad(carry["sym_sum"].reshape(m_flat)),
                pad(carry["phase"].reshape(m_flat)),
                pad(carry["omega"].reshape(m_flat)),
                pad(carry["last_bits"].reshape(m_flat)),
                omega_min=self._omega_min, omega_max=self._omega_max,
                gain=self._pll_gain, transition=mode_transition,
                interpret=interp, variant=preferred_variant())
            out = out[..., :m_flat]
            sg2 = sg2[..., :m_flat]
            ss2, phase = ss2[..., :m_flat], phase[..., :m_flat]
            omega, last_bits = omega[..., :m_flat], last_bits[..., :m_flat]
            bits = (out & 1).astype(jnp.uint8).reshape(x_t.shape)
            valid = ((out & 2) != 0).reshape(x_t.shape)
            new_carry = dict(
                signs=jnp.moveaxis(
                    sg2.reshape((L - 1,) + ch_shape), 0, -1),
                sym_sum=ss2.reshape(ch_shape),
                phase=phase.reshape(ch_shape),
                omega=omega.reshape(ch_shape),
                last_bits=last_bits.reshape(ch_shape))
            if self.time_major:
                return new_carry, Ragged(bits, valid)
            return new_carry, Ragged(jnp.moveaxis(bits, 0, -1),
                                     jnp.moveaxis(valid, 0, -1))

        # ---- majority vote, vectorized (src/fsk.cc:163-168): the ring of
        # the last L signs reduces to a length-L moving sum — exact in int32
        # via the cumsum difference; the zero-initialized ring is the zero
        # signs carry.
        new = jnp.where(x_t > 0, 1, -1).astype(jnp.int32)
        signs_c = jnp.concatenate(
            [jnp.moveaxis(carry["signs"], -1, 0), new], axis=0)
        cs = jnp.cumsum(signs_c, axis=0)
        sym_sum_t = cs[L - 1:] - jnp.concatenate(
            [jnp.zeros_like(cs[:1]), cs[:-L]], axis=0)
        last_sum_t = jnp.concatenate(
            [carry["sym_sum"][None], sym_sum_t[:-1]], axis=0)
        crossed_t = ((last_sum_t < 0) & (sym_sum_t >= 0)) | \
                    ((last_sum_t >= 0) & (sym_sum_t < 0))
        bit_now_t = (sym_sum_t > 0).astype(jnp.int32)

        def step(state, inp):
            phase, omega, last_bits = state
            bit_now, crossed = inp
            # -- phase advance & bit sampling (src/fsk.cc:170-187)
            phase = phase + omega
            emit = phase >= 1.0
            phase = jnp.where(emit, phase - 1.0, phase)
            new_last_bits = jnp.where(
                emit, ((last_bits << 1) | bit_now) & 0xFFFF, last_bits)
            if mode_transition:
                bit = (new_last_bits ^ (new_last_bits >> 1) ^ 1) & 1
            else:
                bit = new_last_bits & 1
            # -- PLL nudge on symbol transition (src/fsk.cc:189-198);
            # g*(0.5-phase) == -g*(phase-0.5) exactly in IEEE, so one
            # expression covers both halves of the reference's branch.
            omega = jnp.where(crossed,
                              omega + self._pll_gain * (0.5 - phase),
                              omega)
            omega = jnp.clip(omega, self._omega_min, self._omega_max)
            return (phase, omega, new_last_bits), (bit.astype(jnp.uint8),
                                                   emit)

        state = (carry["phase"], carry["omega"], carry["last_bits"])
        # unroll cuts the sequential-loop bookkeeping (measured 33 ms
        # at 8 -> 23 ms at 16 on 65536x1024; the Pallas branch above
        # takes over where shapes allow).
        state, (bits, valid) = jax.lax.scan(step, state,
                                            (bit_now_t, crossed_t),
                                            unroll=16)
        phase, omega, last_bits = state
        new_carry = dict(
            signs=jnp.moveaxis(signs_c[signs_c.shape[0] - (L - 1):], 0, -1),
            sym_sum=sym_sum_t[-1],
            phase=phase, omega=omega, last_bits=last_bits)
        if self.time_major:
            return new_carry, Ragged(bits, valid)
        return new_carry, Ragged(jnp.moveaxis(bits, 0, -1),
                                 jnp.moveaxis(valid, 0, -1))


_BANK_PARAM_CACHE: dict = {}


def bitstream_bank_supported(entries) -> bool:
    """True when the banked kernel can run this set: >= 2 configurations,
    channel-major layouts, equal step counts, every majority window in the
    kernel's range (the per-lane departing-row select needs ell >= 2 like
    the single-mode gate), and the stacked lane bank passing the kernel
    gate at the LARGEST window."""
    from libsdr_tpu.ops.fir import kernel_dispatch
    from libsdr_tpu.ops.pallas_bitsync import bitsync_pallas_supported

    use_k, _ = kernel_dispatch()
    if not use_k or len(entries) < 2:
        return False
    if any(bs.time_major for bs, _, _ in entries):
        return False
    ts = {x.shape[-1] for _, _, x in entries}
    if len(ts) != 1:
        return False
    t = ts.pop()
    m = sum(int(np.prod(x.shape[:-1])) for _, _, x in entries)
    m_pad = -(-m // 128) * 128
    if min(bs.corr_len for bs, _, _ in entries) < 2:
        return False
    ell = max(bs.corr_len for bs, _, _ in entries)
    return bitsync_pallas_supported(t, m_pad, ell)


def bitstream_bank_apply(entries):
    """Run SEVERAL bound BitStreams as ONE banked Pallas kernel launch.

    ``entries``: list of ``(bitstream, carry, x)`` with ``x`` shaped
    ``(channels..., T)`` (uint8 symbols), all sharing T.  Returns a list of
    ``(new_carry, Ragged)`` in order — per lane bit-exact vs calling each
    ``bitstream.apply`` separately (same recurrence, per-lane parameters).

    The PLL is time-sequential, so N separate launches pay N serial passes
    over T; stacked lanes pay ONE (the multimode decoder bank's three
    BitStreams were its profiled wall, tools/profile_multimode.py).  Falls
    back to per-entry apply when the kernel path is unavailable.
    """
    if not bitstream_bank_supported(entries):
        return [bs.apply(c, x) for bs, c, x in entries]

    from libsdr_tpu.ops.fir import kernel_dispatch
    from libsdr_tpu.ops.pallas_bitsync import (pll_pallas_bank,
                                               preferred_variant)

    from libsdr_tpu.ops.pallas_fir_mxu import to_device_cached

    _, interp = kernel_dispatch()
    t = entries[0][2].shape[-1]
    ms = [int(np.prod(x.shape[:-1])) for _, _, x in entries]
    m = sum(ms)
    m_pad = -(-m // 128) * 128
    ells = tuple(sorted({bs.corr_len for bs, _, _ in entries}))
    nring = max(ells) - 1

    # Static per-lane parameter vectors: cached device constants (repo
    # rule: rebuilding/uploading per call silently dominates kernels on
    # the tunneled backend) — keyed by the full bank configuration so any
    # retune/rebind rebuilds them.
    cfg = tuple((bs.corr_len, bs.mode, float(bs._omega_min),
                 float(bs._omega_max), float(bs._pll_gain), mi)
                for (bs, _, _), mi in zip(entries, ms))

    def build_params():
        omin = np.zeros(m_pad, np.float32)
        omax = np.zeros(m_pad, np.float32)
        gain = np.zeros(m_pad, np.float32)
        trans = np.zeros(m_pad, np.int32)
        onehot = np.zeros((len(ells), m_pad), np.int32)
        off = 0
        for ell, mode, o_lo, o_hi, g, mi in cfg:
            sl = slice(off, off + mi)
            omin[sl], omax[sl], gain[sl] = o_lo, o_hi, g
            trans[sl] = 1 if mode == TRANSITION else 0
            onehot[ells.index(ell), sl] = 1
            off += mi
        # pad lanes: the first window length + sane omega bounds (their
        # outputs and states are discarded)
        if m_pad != m:
            omin[m:], omax[m:] = cfg[0][2], cfg[0][3]
            onehot[0, m:] = 1
        return omin, omax, gain, trans, onehot

    omin, omax, gain, trans, onehot = to_device_cached(
        _BANK_PARAM_CACHE, ("bank", cfg, m_pad, ells), build_params)

    f32, i32 = jnp.float32, jnp.int32
    sym = jnp.concatenate(
        [jnp.moveaxis(x, -1, 0).reshape(t, mi)
         for (_, _, x), mi in zip(entries, ms)], axis=-1)
    # Per-call STATE (carries) assembled by lane offset; the sign rings
    # enter zero-padded above each lane's own window rows so the kernel's
    # import-time window sum is per-lane correct.
    signs = jnp.zeros((nring, m), i32)
    sym_sum = jnp.zeros(m, i32)
    phase = jnp.zeros(m, f32)
    omega = jnp.zeros(m, f32)
    last_bits = jnp.zeros(m, i32)
    off = 0
    for (bs, c, x), mi in zip(entries, ms):
        sl = slice(off, off + mi)
        li = bs.corr_len - 1
        # lane's previous signs occupy the LAST li rows (oldest first)
        signs = signs.at[nring - li:, sl].set(
            jnp.moveaxis(c["signs"], -1, 0).reshape(li, mi))
        sym_sum = sym_sum.at[sl].set(c["sym_sum"].reshape(mi))
        phase = phase.at[sl].set(c["phase"].reshape(mi))
        omega = omega.at[sl].set(c["omega"].reshape(mi))
        last_bits = last_bits.at[sl].set(c["last_bits"].reshape(mi))
        off += mi

    def pad(a):
        if m_pad == m:
            return a
        widths = [(0, 0)] * (a.ndim - 1) + [(0, m_pad - m)]
        return jnp.pad(a, widths)

    out, sg2, ss2, ph2, om2, lb2 = pll_pallas_bank(
        pad(sym), pad(signs), pad(sym_sum), pad(phase), pad(omega),
        pad(last_bits), omin, omax, gain, trans, onehot,
        ells=ells, interpret=interp, variant=preferred_variant())

    results = []
    off = 0
    for (bs, c, x), mi in zip(entries, ms):
        sl = slice(off, off + mi)
        ch_shape = x.shape[:-1]
        li = bs.corr_len - 1
        o = out[:, sl]
        bits = jnp.moveaxis((o & 1).astype(jnp.uint8).reshape((t,) + ch_shape),
                            0, -1)
        valid = jnp.moveaxis(((o & 2) != 0).reshape((t,) + ch_shape), 0, -1)
        new_c = dict(
            signs=jnp.moveaxis(
                sg2[nring - li:, sl].reshape((li,) + ch_shape), 0, -1),
            sym_sum=ss2[sl].reshape(ch_shape),
            phase=ph2[sl].reshape(ch_shape),
            omega=om2[sl].reshape(ch_shape),
            last_bits=lb2[sl].reshape(ch_shape))
        results.append((new_c, Ragged(bits, valid)))
        off += mi
    return results


def apply_mode_chains(sub, carries, y, groups,
                      windows):
    """Run every mode pipeline on its channel group of the complex bank
    ``y``, merging all final BitStream PLLs into ONE banked Pallas launch
    (ops/bitsync.bitstream_bank_apply).  The PLLs are time-sequential, so
    N per-mode launches pay N serial passes over T; stacked lanes pay one —
    the bank's profiled wall (tools/profile_multimode.py).  Falls back to
    per-mode apply off-TPU, bit-identically.  Returns (outs, new_carries);
    shared by the single-chip bank (apps/multimode.py)
    and the shard_map body (parallel/multimode.py).  ``sub``:
    {mode: bound Pipeline}; ``windows``: {mode: compaction window}."""
    from libsdr_tpu.core.ragged import compact_windows
    def take_rows(bank, idxs):
        # Round-robin mode patterns make each group an arithmetic
        # progression: a strided basic slice instead of a row gather.
        if len(idxs) > 1:
            d = np.diff(idxs)
            if np.all(d == d[0]) and d[0] > 0:
                s, st = int(idxs[0]), int(d[0])
                return bank[s:s + st * len(idxs):st]
        return bank[idxs]

    outs, new = {}, {}
    banked = []   # (mode, bitstream, bs_carry, symbols, new_pre_carries)
    for mode, p in sub.items():
        pc = carries[mode]
        if isinstance(p.stages[-1], BitStream):
            xm = take_rows(y, groups[mode])
            new_pre = []
            for stage, c in zip(p.stages[:-1], pc[:-1]):
                c, xm = stage.apply(c, xm)
                new_pre.append(c)
            banked.append((mode, p.stages[-1], pc[-1], xm, tuple(new_pre)))
        else:
            cg, bits = p.apply(pc, take_rows(y, groups[mode]))
            new[mode] = cg
            outs[mode] = (compact_windows(bits, windows[mode])
                          if windows[mode] else bits)
    if banked:
        results = bitstream_bank_apply(
            [(bs, c, xm) for _, bs, c, xm, _ in banked])
        for (mode, _, _, _, new_pre), (nc, bits) in zip(banked, results):
            new[mode] = new_pre + (nc,)
            outs[mode] = (compact_windows(bits, windows[mode])
                          if windows[mode] else bits)
    return outs, new
