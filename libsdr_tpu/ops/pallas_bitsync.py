"""Pallas TPU kernel for the bit-clock recovery chain (majority vote +
PLL) of ops/bitsync.py (reference: src/fsk.cc:157-202).

The PLL is sequential in time, so as a ``lax.scan`` its cost is per-step
loop bookkeeping (~0.5 us/step however slim the body), and the vectorized
majority-vote precompute materializes ~2.5 GB of cumsum intermediates per
64M-sample 1024-channel scanner block — together ~21 ms.  This kernel
runs the WHOLE chain in one pass:

- the M channel lanes are viewed as (SUB, 128) register tiles
  (SUB = M/128), so every per-step op runs at full VPU utilization;
- the majority vote over the last L symbols is a running windowed sum
  with a circular (L-1)-row sign ring in VMEM — the direct analog of the
  reference's ring (src/fsk.cc:163-168), here one (SUB, 128) load + store
  per step instead of a block-level cumsum;
- input is the raw uint8 symbol stream (64 MB/block), output packs
  bit/valid in one int8 (bit 0 = bit, bit 1 = valid; 64 MB/block) — an
  8x HBM-traffic cut vs the int32 scan arrays; the caller's unpack fuses
  into downstream XLA ops;
- input/output chunks move via manual double-buffered DMA (the axon auto
  block-pipeline is ~4x slower on long streams, see pallas_fir_mxu.py),
  with whole-buffer DMA destinations (partial destinations crash this
  backend's worker);
- PLL state lives in the fori_loop carry (vector registers), persisting
  across grid chunks in the constant-index VMEM state output blocks; the
  loop body unrolls _UNROLL time steps so scalar bookkeeping amortizes.

The arithmetic is IDENTICAL (bit-exact, including float op order) to the
scan path in ops/bitsync.py: windowed sign sum + zero-crossing detect
(src/fsk.cc:163-168), phase accumulate + wrap-sample (src/fsk.cc:170-187)
and the bounded omega nudge on symbol transitions (src/fsk.cc:189-198).
``g*(0.5-phase) == -g*(phase-0.5)`` exactly in IEEE, so one fma covers
both halves of the reference's nudge branch.

Measured (v5e, 65536 x 1024 incl. majority): 21.7 ms scan path -> ~4 ms
(best capture; 7.4-7.9 ms on the r5 tunnel day, carry-chained).

Optimization bound (measured, r5): the kernel is ISSUE-bound, not
dependency-latency-bound — unroll 8->32 and chunk-size sweeps move it
<=6%, and splitting the bank into independent lane-group chains (the
classic latency-hiding interleave; ``groups=``) measures 7.57/7.56/8.30/
9.60 ms for groups=1/2/4/8, i.e. no win.  ~22 dependent vector ops per
step x 2-5 native VPU ops each ~= the observed ~100 cycles/step.  The
``variant='split'`` restructure (vectorized whole-chunk majority
precompute + slim serial loop, bit-identical) was ALSO measured on chip:
13.54 ms vs ring's 13.07 ms at the scanner config
(SCANNERPROFILE_r05.json) — the removed serial ops are bought back by
the precompute's own passes, so 'ring' stays the default and both
negative results are recorded here.  The scaling axis is lanes:
throughput grows linearly with channel count at equal work (see the
ax25_wide bench row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_MAX_TT = 2048         # time steps per grid chunk (VMEM-bound)
_UNROLL = 8            # time steps per fori_loop iteration
_MAX_RING = 512        # max majority window L (VMEM ring rows)
_VMEM_BUDGET = 13_500_000  # same headroom rule as pallas_fir_mxu


def _tt_for(t: int, sub: int) -> int:
    """Largest _UNROLL-multiple divisor of t <= _MAX_TT (scaled down for
    wide banks so a chunk stays ~2 MB); 0 if none suitable.

    Multi-chunk runs DMA the (u)int8 streams from HBM at row offset
    ci*tt*sub; 1-byte TPU tiles are (32, 128), so that offset must stay
    32-aligned — the same constraint class as the bf16 ct_align gate in
    ops/pallas_fir_mxu.mxu_fir_supported.  A single-chunk run (tt == t)
    always starts at offset 0 and is exempt."""
    cap = max(_UNROLL, min(_MAX_TT, _MAX_TT * 8 // sub))
    for tt in range(min(cap, t) // _UNROLL * _UNROLL, _UNROLL - 1, -_UNROLL):
        if t % tt == 0 and (tt == t or (tt * sub) % 32 == 0):
            return tt
    return 0


# Production kernel variant for BitStream.apply ('ring' | 'split').  Both
# are bit-identical (tests); flip with set_variant after on-chip A/B.
_VARIANT = "ring"


def set_variant(name: str) -> None:
    """Select the production bit-sync kernel variant ('ring' | 'split').
    Callers must recompile (fresh jit) afterwards — Pipeline.compile
    already wraps steps in fresh lambdas on re-bind."""
    global _VARIANT
    if name not in ("ring", "split"):
        raise ValueError(name)
    _VARIANT = name


def preferred_variant() -> str:
    return _VARIANT


def _groups_for(sub: int) -> int:
    """Default lane-group split.  Hypothesis tested on chip (v5e,
    65536x1024, sub=8): if the per-step serial chain were latency-bound,
    interleaving independent row-group chains would hide it — measured
    groups=1/2/4/8 -> 7.57/7.56/8.30/9.60 ms, i.e. NO win: the kernel is
    issue/VMEM-bound, not dependency-latency-bound.  Default stays 1; the
    parameter remains for measurement (tools/ experiments) and as the
    documented negative result."""
    return 1


def bitsync_pallas_supported(t: int, m: int, corr_len: int) -> bool:
    """Shape gate: M lanes must fill whole 128-lane rows and the majority
    window must fit the VMEM ring (callers fall back to the lax.scan
    path).  Sub-(8,128)-tile banks (M = 128..896) run at partial sublane
    utilization but still beat the scan ~2x (measured M=128: 7.7 vs
    14.8 ms on 65536 steps)."""
    return (m >= _LANES and m % _LANES == 0 and t >= _UNROLL
            and 2 <= corr_len <= _MAX_RING
            and _tt_for(t, m // _LANES) > 0)


def _kernel(sym_hbm, sg_in, ss_in, ph_in, om_in, lb_in,
            out_hbm, sg_out, ss_out, ph_out, om_out, lb_out,
            sym_s, out_s, ring, rsum, sin, sout, *,
            tt: int, sub: int, ell: int, omega_min: float,
            omega_max: float, gain: float, transition: bool,
            groups: int = 1):
    ci = pl.program_id(0)
    n_ci = pl.num_programs(0)
    nring = ell - 1            # ring rows (majority window minus newest)

    def start_in(slot, ci_):
        pltpu.make_async_copy(
            sym_hbm.at[pl.ds(pl.multiple_of(ci_ * (tt * sub), 8), tt * sub), :],
            sym_s.at[slot], sin.at[slot]).start()

    slot = ci % 2

    @pl.when(ci == 0)
    def _():
        start_in(0, ci)
        # Import carry state.  The sign ring enters time-ordered
        # (oldest first) and starts at ring position 0; rsum caches the
        # running sum of the ring's L-1 signs.
        ring[...] = sg_in[...]
        acc = sg_in[0:sub, :]
        for k in range(1, nring):
            acc = acc + sg_in[k * sub:(k + 1) * sub, :]
        rsum[...] = acc
        ss_out[...] = ss_in[...]
        ph_out[...] = ph_in[...]
        om_out[...] = om_in[...]
        lb_out[...] = lb_in[...]

    @pl.when(ci + 1 < n_ci)
    def _():
        start_in(1 - slot, ci + 1)

    pltpu.make_async_copy(sym_s.at[slot], sym_s.at[slot], sin.at[slot]).wait()
    # The out-DMA launched two grid steps ago reused this slot's buffer.
    @pl.when(ci >= 2)
    def _():
        pltpu.make_async_copy(out_s.at[slot], out_s.at[slot],
                              sout.at[slot]).wait()

    # Lane GROUPS: the per-step recurrence is a serial chain of ~8 vector
    # ops whose latencies dominate (the VPU sits mostly idle between
    # dependent ops).  Splitting the (sub, 128) state into `groups`
    # independent row groups gives the scheduler `groups` interleavable
    # chains per time step — identical per-lane arithmetic (bit-exact by
    # construction, asserted on chip by test_bitsync_pallas_vs_scan), at
    # the cost of `groups`x the issue count on narrower tiles.
    sg_rows = sub // groups

    def step_group(sym, st):
        phase, omega, lb, last_sum, rs = st
        # -- majority vote: running windowed sign sum with a circular
        # ring of the previous L-1 signs (src/fsk.cc:163-168)
        sign = jnp.where(sym > 0, 1, -1)
        s_now = rs + sign
        bn = (s_now > 0).astype(jnp.int32)
        crossed = ((last_sum < 0) & (s_now >= 0)) | \
                  ((last_sum >= 0) & (s_now < 0))
        # -- phase advance & bit sampling (src/fsk.cc:170-187)
        phase = phase + omega
        emit = phase >= 1.0
        phase = jnp.where(emit, phase - 1.0, phase)
        lb = jnp.where(emit, ((lb << 1) | bn) & 0xFFFF, lb)
        if transition:
            bit = (lb ^ (lb >> 1) ^ 1) & 1
        else:
            bit = lb & 1
        # -- bounded omega nudge on symbol transition (src/fsk.cc:189-198)
        omega = jnp.where(crossed, omega + gain * (0.5 - phase), omega)
        omega = jnp.clip(omega, omega_min, omega_max)
        out = bit | (emit.astype(jnp.int32) << 1)
        return sign, out, (phase, omega, lb, s_now, rs)

    def body(j, st):
        rpos = st[-1]
        gst = list(st[:-1])
        r = pl.multiple_of(j * (_UNROLL * sub), 8)
        symu = sym_s[slot, pl.ds(r, _UNROLL * sub), :].astype(jnp.int32)
        outs = []
        for u in range(_UNROLL):
            rr = pl.multiple_of(rpos * sub, sub)
            for g in range(groups):
                lo = u * sub + g * sg_rows
                sign, out, ns = step_group(symu[lo:lo + sg_rows, :], gst[g])
                oldest = ring[pl.ds(rr + g * sg_rows, sg_rows), :]
                ring[pl.ds(rr + g * sg_rows, sg_rows), :] = sign
                phase, omega, lb, s_now, rs = ns
                gst[g] = (phase, omega, lb, s_now, s_now - oldest)
                outs.append(out)
            rpos = jnp.where(rpos + 1 >= nring, 0, rpos + 1)
        packed = jnp.concatenate(outs, axis=0).astype(jnp.int8)
        out_s[slot, pl.ds(r, _UNROLL * sub), :] = packed
        return (*gst, rpos)

    def split(a):
        return [a[g * sg_rows:(g + 1) * sg_rows, :] for g in range(groups)]

    ph0, om0 = split(ph_out[...]), split(om_out[...])
    lb0, ss0, rs0 = split(lb_out[...]), split(ss_out[...]), split(rsum[...])
    st = (*[(ph0[g], om0[g], lb0[g], ss0[g], rs0[g])
            for g in range(groups)],
          (ci * tt) % nring)
    st = jax.lax.fori_loop(0, tt // _UNROLL, body, st)
    gst = st[:-1]
    ph_out[...] = jnp.concatenate([g[0] for g in gst], axis=0)
    om_out[...] = jnp.concatenate([g[1] for g in gst], axis=0)
    lb_out[...] = jnp.concatenate([g[2] for g in gst], axis=0)
    ss_out[...] = jnp.concatenate([g[3] for g in gst], axis=0)
    rsum[...] = jnp.concatenate([g[4] for g in gst], axis=0)

    pltpu.make_async_copy(out_s.at[slot], out_hbm.at[ci],
                          sout.at[slot]).start()

    @pl.when(ci == n_ci - 1)
    def _():
        # Export the ring time-ordered (oldest first): rotate by the final
        # ring position.  nring static copies of one (SUB, 128) row each.
        rpos_f = (n_ci * tt) % nring
        for k in range(nring):
            src = rpos_f + k
            src = jnp.where(src >= nring, src - nring, src)
            sg_out[k * sub:(k + 1) * sub, :] = \
                ring[pl.ds(pl.multiple_of(src * sub, sub), sub), :]
        pltpu.make_async_copy(out_s.at[slot], out_s.at[slot],
                              sout.at[slot]).wait()

        @pl.when(n_ci > 1)
        def _():
            pltpu.make_async_copy(out_s.at[1 - slot], out_s.at[1 - slot],
                                  sout.at[1 - slot]).wait()


def _tt_split(t: int, sub: int, ell: int) -> int:
    """Chunk length for the split variant: its vectorized majority buffers
    (ext + s_ext int32, bncr int8) cost ~11 KB x tt at sub=8, so the chunk
    is sized against the VMEM budget independently of _tt_for."""
    per_tt = sub * _LANES * (2      # sym u8 x2 slots
                             + 2    # out i8 x2 slots
                             + 4    # ext i32
                             + 4    # s_ext i32
                             + 1)   # bncr i8
    fixed = ell * sub * _LANES * 8 + 1_500_000  # ext/s_ext tails + headroom
    cap = max(_UNROLL, min(_MAX_TT, (_VMEM_BUDGET - fixed) // per_tt))
    for tt in range(min(cap, t) // _UNROLL * _UNROLL, _UNROLL - 1, -_UNROLL):
        if t % tt == 0 and (tt == t or (tt * sub) % 32 == 0):
            return tt
    return 0


def _kernel_split(sym_hbm, sg_in, ss_in, ph_in, om_in, lb_in,
                  out_hbm, sg_out, ss_out, ph_out, om_out, lb_out,
                  sym_s, out_s, ext, s_ext, bncr, sin, sout, *,
                  tt: int, sub: int, ell: int, omega_min: float,
                  omega_max: float, gain: float, transition: bool):
    """Split variant of :func:`_kernel`: the majority vote (windowed sign
    sum + zero-crossing detect) is DATA-INDEPENDENT of the PLL state, so
    it is computed for the whole chunk as ~L pipelined vector adds over a
    time-extended sign buffer (``ext`` = carried last L-1 signs ++ this
    chunk's signs, all time-ordered — no circular ring, no dynamic
    addressing), leaving the serial fori_loop with only the true
    recurrence (phase/omega/last_bits).  Arithmetic per lane is identical:
    the windowed sum is an exact integer regardless of summation order.

    Extra VMEM vs _kernel: ext ((tt+L-1)*sub rows i32), s_ext
    ((tt+1)*sub rows i32), bncr (tt*sub rows i8) — _tt_split sizes the
    chunk against the budget."""
    ci = pl.program_id(0)
    n_ci = pl.num_programs(0)
    nring = ell - 1

    def start_in(slot, ci_):
        pltpu.make_async_copy(
            sym_hbm.at[pl.ds(pl.multiple_of(ci_ * (tt * sub), 8), tt * sub), :],
            sym_s.at[slot], sin.at[slot]).start()

    slot = ci % 2

    @pl.when(ci == 0)
    def _():
        start_in(0, ci)
        # Carry state enters time-ordered (oldest first), and stays so.
        sg_out[...] = sg_in[...]
        ss_out[...] = ss_in[...]
        ph_out[...] = ph_in[...]
        om_out[...] = om_in[...]
        lb_out[...] = lb_in[...]

    @pl.when(ci + 1 < n_ci)
    def _():
        start_in(1 - slot, ci + 1)

    pltpu.make_async_copy(sym_s.at[slot], sym_s.at[slot], sin.at[slot]).wait()

    @pl.when(ci >= 2)
    def _():
        pltpu.make_async_copy(out_s.at[slot], out_s.at[slot],
                              sout.at[slot]).wait()

    # -- vectorized majority phase (no serial dependence) ------------------
    # ext = [last L-1 signs (time-ordered) ; this chunk's signs]
    ext[0:nring * sub, :] = sg_out[...]
    ext[nring * sub:, :] = jnp.where(
        sym_s[slot].astype(jnp.int32) > 0, 1, -1)
    # windowed sum: s[t] = sum_{k=0..L-1} ext[t+k]  (exact in int32)
    acc = ext[0:tt * sub, :]
    for k in range(1, ell):
        acc = acc + ext[pl.ds(k * sub, tt * sub), :]
    s_ext[0:sub, :] = ss_out[...]          # s[-1]: carried windowed sum
    s_ext[sub:, :] = acc
    s_prev = s_ext[0:tt * sub, :]
    bn = (acc > 0).astype(jnp.int32)
    crossed = (((s_prev < 0) & (acc >= 0)) |
               ((s_prev >= 0) & (acc < 0))).astype(jnp.int32)
    bncr[...] = (bn | (crossed << 1)).astype(jnp.int8)
    # carry exports of the vector phase: last windowed sum + last L-1 signs
    ss_out[...] = acc[(tt - 1) * sub:, :]
    if tt >= nring:
        sg_out[...] = ext[pl.ds((tt) * sub, nring * sub), :]
    else:
        # chunk shorter than the window: shift the old ring up
        old = sg_out[pl.ds(tt * sub, (nring - tt) * sub), :]
        sg_out[0:(nring - tt) * sub, :] = old
        sg_out[(nring - tt) * sub:, :] = ext[pl.ds(nring * sub, tt * sub), :]

    # -- serial recurrence (phase/omega/last_bits only) ---------------------
    def body(j, st):
        phase, omega, lb = st
        r = pl.multiple_of(j * (_UNROLL * sub), 8)
        bu = bncr[pl.ds(r, _UNROLL * sub), :].astype(jnp.int32)
        outs = []
        for u in range(_UNROLL):
            row = bu[u * sub:(u + 1) * sub, :]
            bn = row & 1
            crossed = (row & 2) > 0
            phase = phase + omega
            emit = phase >= 1.0
            phase = jnp.where(emit, phase - 1.0, phase)
            lb = jnp.where(emit, ((lb << 1) | bn) & 0xFFFF, lb)
            if transition:
                bit = (lb ^ (lb >> 1) ^ 1) & 1
            else:
                bit = lb & 1
            omega = jnp.where(crossed, omega + gain * (0.5 - phase), omega)
            omega = jnp.clip(omega, omega_min, omega_max)
            outs.append(bit | (emit.astype(jnp.int32) << 1))
        packed = jnp.concatenate(outs, axis=0).astype(jnp.int8)
        out_s[slot, pl.ds(r, _UNROLL * sub), :] = packed
        return phase, omega, lb

    st = (ph_out[...], om_out[...], lb_out[...])
    st = jax.lax.fori_loop(0, tt // _UNROLL, body, st)
    ph_out[...], om_out[...], lb_out[...] = st

    pltpu.make_async_copy(out_s.at[slot], out_hbm.at[ci],
                          sout.at[slot]).start()

    @pl.when(ci == n_ci - 1)
    def _():
        pltpu.make_async_copy(out_s.at[slot], out_s.at[slot],
                              sout.at[slot]).wait()

        @pl.when(n_ci > 1)
        def _():
            pltpu.make_async_copy(out_s.at[1 - slot], out_s.at[1 - slot],
                                  sout.at[1 - slot]).wait()


@functools.partial(jax.jit, static_argnames=("omega_min", "omega_max",
                                             "gain", "transition",
                                             "interpret", "groups",
                                             "variant"))
def pll_pallas(sym, signs, sym_sum, phase, omega, last_bits, *,
               omega_min: float, omega_max: float, gain: float,
               transition: bool, interpret: bool = False,
               groups: int = 0, variant: str = "ring"):
    """Run majority vote + PLL over ``sym`` (T, M) uint8 symbols.

    Args (all per-channel state flattened to M lanes):
      signs: (L-1, M) int32 — previous window signs, oldest first.
      sym_sum: (M,) int32 — previous windowed sum (crossing seed).
      phase/omega: (M,) float32; last_bits: (M,) int32.

    Returns (packed (T, M) int8 with bit 0 = sampled bit / bit 1 = valid,
    signs', sym_sum', phase', omega', last_bits').  Bit-exact vs the
    ops/bitsync.py scan path.  Caller guarantees
    ``bitsync_pallas_supported(T, M, L)``.
    """
    t, m = sym.shape
    nring = signs.shape[0]
    sub = m // _LANES
    if variant == "split":
        tt = _tt_split(t, sub, nring + 1)
        if tt == 0:            # split's bigger buffers don't fit: fall back
            variant, tt = "ring", _tt_for(t, sub)
    else:
        tt = _tt_for(t, sub)
    n_chunks = t // tt
    if groups <= 0:
        # Latency-hiding default: interleave independent per-step chains
        # when the bank is wide enough to split (see _kernel).
        groups = _groups_for(sub)
    st_f = jax.ShapeDtypeStruct((sub, _LANES), jnp.float32)
    st_i = jax.ShapeDtypeStruct((sub, _LANES), jnp.int32)
    rep = pl.BlockSpec((sub, _LANES), lambda c: (0, 0),
                       memory_space=pltpu.VMEM)
    ring_spec = pl.BlockSpec((nring * sub, _LANES), lambda c: (0, 0),
                             memory_space=pltpu.VMEM)
    if variant == "split":
        kern = functools.partial(_kernel_split, tt=tt, sub=sub,
                                 ell=nring + 1, omega_min=omega_min,
                                 omega_max=omega_max, gain=gain,
                                 transition=transition)
        scratch = [pltpu.VMEM((2, tt * sub, _LANES), jnp.uint8),
                   pltpu.VMEM((2, tt * sub, _LANES), jnp.int8),
                   pltpu.VMEM(((tt + nring) * sub, _LANES), jnp.int32),
                   pltpu.VMEM(((tt + 1) * sub, _LANES), jnp.int32),
                   pltpu.VMEM((tt * sub, _LANES), jnp.int8),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        kern = functools.partial(_kernel, tt=tt, sub=sub, ell=nring + 1,
                                 omega_min=omega_min, omega_max=omega_max,
                                 gain=gain, transition=transition,
                                 groups=groups)
        scratch = [pltpu.VMEM((2, tt * sub, _LANES), jnp.uint8),
                   pltpu.VMEM((2, tt * sub, _LANES), jnp.int8),
                   pltpu.VMEM((nring * sub, _LANES), jnp.int32),
                   pltpu.VMEM((sub, _LANES), jnp.int32),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,))]
    out, sg2, ss2, ph2, om2, lb2 = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  ring_spec, rep, rep, rep, rep],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   ring_spec, rep, rep, rep, rep],
        out_shape=[jax.ShapeDtypeStruct((n_chunks, tt * sub, _LANES),
                                        jnp.int8),
                   jax.ShapeDtypeStruct((nring * sub, _LANES), jnp.int32),
                   st_i, st_f, st_f, st_i],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=30 * t * m, transcendentals=0,
            bytes_accessed=2 * t * m),
        interpret=interpret,
    )(sym.reshape(t * sub, _LANES), signs.reshape(nring * sub, _LANES),
      sym_sum.reshape(sub, _LANES), phase.reshape(sub, _LANES),
      omega.reshape(sub, _LANES), last_bits.reshape(sub, _LANES))
    return (out.reshape(t, m), sg2.reshape(nring, m), ss2.reshape(m),
            ph2.reshape(m), om2.reshape(m), lb2.reshape(m))


# ---------------------------------------------------------------------------
# Banked variant: SEVERAL BitStream configurations (different baud, majority
# window, transition mode) in ONE kernel launch.  The PLL is sequential in
# time, so N per-mode kernel calls cost N serial passes over T steps; lanes
# are nearly free — stacking all modes' channels into one lane bank runs the
# time loop ONCE (the multimode bank's three BitStreams were its profiled
# wall, tools/profile_multimode.py).
#
# Generalizations vs _kernel (arithmetic per lane stays bit-exact):
# - omega_min/omega_max/gain/transition become per-lane (SUB, 128) vectors;
# - the majority window length ell is per lane, drawn from the (static)
#   distinct set `ells`: the shared sign ring is sized max(ells)-1 rows, and
#   each step reads ONE departing row per distinct ell (scalar row index,
#   same for all lanes) and selects per lane by precomputed masks.  The
#   caller zero-pads each lane's imported signs to the shared depth, so the
#   import-time window sum (sum over all rows) is already per-lane correct.
# ---------------------------------------------------------------------------


def _kernel_bank(sym_hbm, sg_in, ss_in, ph_in, om_in, lb_in,
                 omin_v, omax_v, gain_v, trans_v, msk,
                 out_hbm, sg_out, ss_out, ph_out, om_out, lb_out,
                 sym_s, out_s, ring, rsum, sin, sout, *,
                 tt: int, sub: int, ells: tuple):
    ci = pl.program_id(0)
    n_ci = pl.num_programs(0)
    nring = max(ells) - 1

    def start_in(slot, ci_):
        pltpu.make_async_copy(
            sym_hbm.at[pl.ds(pl.multiple_of(ci_ * (tt * sub), 8), tt * sub), :],
            sym_s.at[slot], sin.at[slot]).start()

    slot = ci % 2

    @pl.when(ci == 0)
    def _():
        start_in(0, ci)
        ring[...] = sg_in[...]
        acc = sg_in[0:sub, :]
        for k in range(1, nring):
            acc = acc + sg_in[k * sub:(k + 1) * sub, :]
        rsum[...] = acc
        ss_out[...] = ss_in[...]
        ph_out[...] = ph_in[...]
        om_out[...] = om_in[...]
        lb_out[...] = lb_in[...]

    @pl.when(ci + 1 < n_ci)
    def _():
        start_in(1 - slot, ci + 1)

    pltpu.make_async_copy(sym_s.at[slot], sym_s.at[slot], sin.at[slot]).wait()

    @pl.when(ci >= 2)
    def _():
        pltpu.make_async_copy(out_s.at[slot], out_s.at[slot],
                              sout.at[slot]).wait()

    omin = omin_v[...]
    omax = omax_v[...]
    gn = gain_v[...]
    tr = trans_v[...] > 0
    # loop-invariant per-lane window masks, one (SUB, 128) tile per
    # distinct ell — loaded once, not per unrolled step
    msks = [msk[pl.ds(k * sub, sub), :] for k in range(len(ells))]

    def body(j, st):
        phase, omega, lb, last_sum, rs, rpos = st
        r = pl.multiple_of(j * (_UNROLL * sub), 8)
        symu = sym_s[slot, pl.ds(r, _UNROLL * sub), :].astype(jnp.int32)
        outs = []
        for u in range(_UNROLL):
            sym = symu[u * sub:(u + 1) * sub, :]
            sign = jnp.where(sym > 0, 1, -1)
            s_now = rs + sign
            bn = (s_now > 0).astype(jnp.int32)
            crossed = ((last_sum < 0) & (s_now >= 0)) | \
                      ((last_sum >= 0) & (s_now < 0))
            # departing sign per lane: one scalar-indexed row per distinct
            # window length, selected by the lane masks (read BEFORE the
            # write — the max-ell row IS the write row)
            oldest = jnp.zeros_like(sign)
            for k, ellk in enumerate(ells):
                back = rpos - (ellk - 1)
                back = jnp.where(back < 0, back + nring, back)
                rr_k = pl.multiple_of(back * sub, sub)
                oldest = oldest + msks[k] * ring[pl.ds(rr_k, sub), :]
            rr = pl.multiple_of(rpos * sub, sub)
            ring[pl.ds(rr, sub), :] = sign
            rs = s_now - oldest
            last_sum = s_now
            rpos = jnp.where(rpos + 1 >= nring, 0, rpos + 1)
            phase = phase + omega
            emit = phase >= 1.0
            phase = jnp.where(emit, phase - 1.0, phase)
            lb = jnp.where(emit, ((lb << 1) | bn) & 0xFFFF, lb)
            bit = jnp.where(tr, (lb ^ (lb >> 1) ^ 1) & 1, lb & 1)
            omega = jnp.where(crossed, omega + gn * (0.5 - phase), omega)
            omega = jnp.clip(omega, omin, omax)
            outs.append(bit | (emit.astype(jnp.int32) << 1))
        packed = jnp.concatenate(outs, axis=0).astype(jnp.int8)
        out_s[slot, pl.ds(r, _UNROLL * sub), :] = packed
        return phase, omega, lb, last_sum, rs, rpos

    st = (ph_out[...], om_out[...], lb_out[...], ss_out[...], rsum[...],
          (ci * tt) % nring)
    st = jax.lax.fori_loop(0, tt // _UNROLL, body, st)
    ph_out[...], om_out[...], lb_out[...], ss_out[...], rsum[...] = st[:5]

    pltpu.make_async_copy(out_s.at[slot], out_hbm.at[ci],
                          sout.at[slot]).start()

    @pl.when(ci == n_ci - 1)
    def _():
        rpos_f = (n_ci * tt) % nring
        for k in range(nring):
            src = rpos_f + k
            src = jnp.where(src >= nring, src - nring, src)
            sg_out[k * sub:(k + 1) * sub, :] = \
                ring[pl.ds(pl.multiple_of(src * sub, sub), sub), :]
        pltpu.make_async_copy(out_s.at[slot], out_s.at[slot],
                              sout.at[slot]).wait()

        @pl.when(n_ci > 1)
        def _():
            pltpu.make_async_copy(out_s.at[1 - slot], out_s.at[1 - slot],
                                  sout.at[1 - slot]).wait()


def _kernel_bank_split(sym_hbm, sg_in, ss_in, ph_in, om_in, lb_in,
                       omin_v, omax_v, gain_v, trans_v, msk,
                       out_hbm, sg_out, ss_out, ph_out, om_out, lb_out,
                       sym_s, out_s, bncr, sin, sout, *,
                       tt: int, sub: int, ells: tuple):
    """Split variant of :func:`_kernel_bank` (see :func:`_kernel_split`):
    the per-lane majority vote is vectorized for the whole chunk — ONE
    inclusive doubling cumsum over the time-extended sign buffer (pure
    value semantics: each pass reads the previous pass's value, so there
    is no in-place aliasing), then each distinct window length L is two
    slices + a subtract, mask-combined per lane (integer sums: order-
    exact, bit-identical) — and the serial loop keeps only the
    phase/omega/last_bits recurrence with per-lane parameters."""
    ci = pl.program_id(0)
    n_ci = pl.num_programs(0)
    nring = max(ells) - 1

    def start_in(slot, ci_):
        pltpu.make_async_copy(
            sym_hbm.at[pl.ds(pl.multiple_of(ci_ * (tt * sub), 8), tt * sub), :],
            sym_s.at[slot], sin.at[slot]).start()

    slot = ci % 2

    @pl.when(ci == 0)
    def _():
        start_in(0, ci)
        sg_out[...] = sg_in[...]
        ss_out[...] = ss_in[...]
        ph_out[...] = ph_in[...]
        om_out[...] = om_in[...]
        lb_out[...] = lb_in[...]

    @pl.when(ci + 1 < n_ci)
    def _():
        start_in(1 - slot, ci + 1)

    pltpu.make_async_copy(sym_s.at[slot], sym_s.at[slot], sin.at[slot]).wait()

    @pl.when(ci >= 2)
    def _():
        pltpu.make_async_copy(out_s.at[slot], out_s.at[slot],
                              sout.at[slot]).wait()

    # -- vectorized majority (per-lane window via one shared cumsum) -------
    nxt = tt + nring           # ext row blocks
    sign = jnp.where(sym_s[slot].astype(jnp.int32) > 0, 1, -1)
    extv = jnp.concatenate([sg_out[...], sign], axis=0)
    zrow = jnp.zeros((sub, _LANES), jnp.int32)
    # inclusive cumsum over row blocks by doubling (value semantics)
    cs = extv
    shift = 1
    while shift < nxt:
        pad = jnp.zeros((shift * sub, _LANES), jnp.int32)
        cs = cs + jnp.concatenate([pad, cs[:(nxt - shift) * sub, :]], axis=0)
        shift *= 2
    czs = jnp.concatenate([zrow, cs], axis=0)  # czs[j] = sum_{i<=j-1}
    # s[t] = czs[t+nring+1] - czs[t+nring+1-L]  per lane's L, mask-combined
    acc = jnp.zeros((tt * sub, _LANES), jnp.int32)
    for k, ellk in enumerate(ells):
        hi = czs[(nring + 1) * sub:(nring + 1 + tt) * sub, :]
        lo = czs[(nring + 1 - ellk) * sub:(nring + 1 - ellk + tt) * sub, :]
        mrow = msk[pl.ds(k * sub, sub), :]
        acc = acc + jnp.tile(mrow, (tt, 1)) * (hi - lo)
    s_prev = jnp.concatenate([ss_out[...], acc[:(tt - 1) * sub, :]], axis=0)
    bn = (acc > 0).astype(jnp.int32)
    crossed = (((s_prev < 0) & (acc >= 0)) |
               ((s_prev >= 0) & (acc < 0))).astype(jnp.int32)
    bncr[...] = (bn | (crossed << 1)).astype(jnp.int8)
    ss_out[...] = acc[(tt - 1) * sub:, :]
    if tt >= nring:
        sg_out[...] = extv[tt * sub:, :]
    else:
        sg_out[...] = jnp.concatenate(
            [sg_out[pl.ds(tt * sub, (nring - tt) * sub), :],
             extv[nring * sub:, :]], axis=0)

    # -- serial recurrence with per-lane parameters -------------------------
    omin = omin_v[...]
    omax = omax_v[...]
    gn = gain_v[...]
    tr = trans_v[...] > 0

    def body(j, st):
        phase, omega, lb = st
        r = pl.multiple_of(j * (_UNROLL * sub), 8)
        bu = bncr[pl.ds(r, _UNROLL * sub), :].astype(jnp.int32)
        outs = []
        for u in range(_UNROLL):
            row = bu[u * sub:(u + 1) * sub, :]
            bn = row & 1
            crossed = (row & 2) > 0
            phase = phase + omega
            emit = phase >= 1.0
            phase = jnp.where(emit, phase - 1.0, phase)
            lb = jnp.where(emit, ((lb << 1) | bn) & 0xFFFF, lb)
            bit = jnp.where(tr, (lb ^ (lb >> 1) ^ 1) & 1, lb & 1)
            omega = jnp.where(crossed, omega + gn * (0.5 - phase), omega)
            omega = jnp.clip(omega, omin, omax)
            outs.append(bit | (emit.astype(jnp.int32) << 1))
        packed = jnp.concatenate(outs, axis=0).astype(jnp.int8)
        out_s[slot, pl.ds(r, _UNROLL * sub), :] = packed
        return phase, omega, lb

    st = (ph_out[...], om_out[...], lb_out[...])
    st = jax.lax.fori_loop(0, tt // _UNROLL, body, st)
    ph_out[...], om_out[...], lb_out[...] = st

    pltpu.make_async_copy(out_s.at[slot], out_hbm.at[ci],
                          sout.at[slot]).start()

    @pl.when(ci == n_ci - 1)
    def _():
        pltpu.make_async_copy(out_s.at[slot], out_s.at[slot],
                              sout.at[slot]).wait()

        @pl.when(n_ci > 1)
        def _():
            pltpu.make_async_copy(out_s.at[1 - slot], out_s.at[1 - slot],
                                  sout.at[1 - slot]).wait()


@functools.partial(jax.jit, static_argnames=("ells", "interpret",
                                             "variant"))
def pll_pallas_bank(sym, signs, sym_sum, phase, omega, last_bits,
                    omega_min_v, omega_max_v, gain_v, transition_v,
                    ell_onehot, *, ells: tuple, interpret: bool = False,
                    variant: str = "ring"):
    """Banked majority+PLL over ``sym`` (T, M) uint8: per-lane parameters.

    Args beyond :func:`pll_pallas`:
      signs: (max(ells)-1, M) int32 — each lane's previous window signs
        occupy the LAST ell_lane-1 rows (oldest first), other rows ZERO.
      omega_min_v/omega_max_v/gain_v: (M,) float32 per-lane PLL bounds/gain.
      transition_v: (M,) int32 (nonzero = transition bit mapping).
      ell_onehot: (len(ells), M) int32 — lane k's window-length selector.
      ells: static distinct majority window lengths.

    Returns the same tuple as :func:`pll_pallas`; per lane bit-exact vs a
    single-mode kernel/scan run with that lane's configuration.
    """
    t, m = sym.shape
    nring = max(ells) - 1
    assert signs.shape[0] == nring
    sub = m // _LANES
    if variant == "split":
        tt = _tt_split(t, sub, max(ells))
        if tt == 0:
            variant, tt = "ring", _tt_for(t, sub)
    else:
        tt = _tt_for(t, sub)
    n_chunks = t // tt
    st_f = jax.ShapeDtypeStruct((sub, _LANES), jnp.float32)
    st_i = jax.ShapeDtypeStruct((sub, _LANES), jnp.int32)
    rep = pl.BlockSpec((sub, _LANES), lambda c: (0, 0),
                       memory_space=pltpu.VMEM)
    ring_spec = pl.BlockSpec((nring * sub, _LANES), lambda c: (0, 0),
                             memory_space=pltpu.VMEM)
    msk_spec = pl.BlockSpec((len(ells) * sub, _LANES), lambda c: (0, 0),
                            memory_space=pltpu.VMEM)
    if variant == "split":
        kern = functools.partial(_kernel_bank_split, tt=tt, sub=sub,
                                 ells=ells)
        scratch = [pltpu.VMEM((2, tt * sub, _LANES), jnp.uint8),
                   pltpu.VMEM((2, tt * sub, _LANES), jnp.int8),
                   pltpu.VMEM((tt * sub, _LANES), jnp.int8),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        kern = functools.partial(_kernel_bank, tt=tt, sub=sub, ells=ells)
        scratch = [pltpu.VMEM((2, tt * sub, _LANES), jnp.uint8),
                   pltpu.VMEM((2, tt * sub, _LANES), jnp.int8),
                   pltpu.VMEM((nring * sub, _LANES), jnp.int32),
                   pltpu.VMEM((sub, _LANES), jnp.int32),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,))]
    out, sg2, ss2, ph2, om2, lb2 = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  ring_spec, rep, rep, rep, rep,
                  rep, rep, rep, rep, msk_spec],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   ring_spec, rep, rep, rep, rep],
        out_shape=[jax.ShapeDtypeStruct((n_chunks, tt * sub, _LANES),
                                        jnp.int8),
                   jax.ShapeDtypeStruct((nring * sub, _LANES), jnp.int32),
                   st_i, st_f, st_f, st_i],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=30 * t * m, transcendentals=0,
            bytes_accessed=2 * t * m),
        interpret=interpret,
    )(sym.reshape(t * sub, _LANES), signs.reshape(nring * sub, _LANES),
      sym_sum.reshape(sub, _LANES), phase.reshape(sub, _LANES),
      omega.reshape(sub, _LANES), last_bits.reshape(sub, _LANES),
      omega_min_v.reshape(sub, _LANES), omega_max_v.reshape(sub, _LANES),
      gain_v.reshape(sub, _LANES), transition_v.reshape(sub, _LANES),
      ell_onehot.reshape(len(ells) * sub, _LANES))
    return (out.reshape(t, m), sg2.reshape(nring, m), ss2.reshape(m),
            ph2.reshape(m), om2.reshape(m), lb2.reshape(m))
