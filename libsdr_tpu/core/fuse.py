"""Graph peephole fusions — the optimization half of the "Config
propagation" compile pass (reference: src/node.cc:97-114 propagates configs;
here binding a Pipeline also algebraically rewrites adjacent stages).

Rules (all EXACT in exact arithmetic, applied to adjacent stages of one
Pipeline — a sequential pipeline edge has a single consumer, so dropping an
intermediate representation is always safe):

1. ``FreqShift(f, exact) -> FMDemod(quadrature)``: the quadrature
   discriminator only sees ``x[n] * conj(x[n-1])``; a mixer rotation
   ``e^(-i w n)`` collapses to the CONSTANT ``e^(-i w)`` in that product.
   The per-sample NCO (two transcendentals + a full complex multiply per
   sample) is deleted; FMDemod picks up one constant complex rotation.

2. ``IQBaseBand -> FMDemod(quadrature)``: same, for the decimated-rate NCO
   that IQBaseBand commutes to its output (ops/baseband.py); IQBaseBand then
   emits the unrotated filtered stream straight from the FIR matmul.

3. ``FreqShift/IQBaseBand-NCO -> AMDemod``: ``|x|`` is rotation-invariant —
   the NCO is dropped outright.

The rewrite happens in ``Pipeline._bind`` before spec propagation, so nested
pipelines (e.g. app chains) fuse on their own stage lists.
"""

from __future__ import annotations

from typing import List


def _on_tpu() -> bool:
    """Whether fused ops may be installed: kernels available in the current
    kernel_mode (auto-on-TPU, or interpret mode forcing them anywhere).  The
    fused ops carry exact XLA fallbacks, so fusing is always correct — this
    gate only decides where the rewrite is *profitable*."""
    try:
        from libsdr_tpu.ops.fir import kernel_dispatch
        return kernel_dispatch()[0]
    except Exception:
        return False


def reset_fusion_state(stages: List) -> None:
    """Clear the fusion state fuse_stages writes onto stage INSTANCES
    (folded rotations, fold_nco flags).  Called before every rewrite, and
    by Pipeline._bind's unfused fallback — restoring the original stage
    list after a fused bind failure without this would leave a dropped
    FreqShift's rotation folded in the demod and apply it twice."""
    from libsdr_tpu.ops.baseband import IQBaseBand
    from libsdr_tpu.ops.demod import FMDemod

    for st in stages:
        if isinstance(st, FMDemod):
            st._pending_rot_freqs = []
            st._rot = None
        if isinstance(st, IQBaseBand):
            st.fold_nco = False


def fuse_stages(stages: List) -> List:
    """Return a rewritten stage list with NCO rotations folded into
    rotation-invariant / product-form consumers."""
    from libsdr_tpu.ops.baseband import IQBaseBand
    from libsdr_tpu.ops.demod import AMDemod, FMDemod
    from libsdr_tpu.ops.nco import FreqShift

    # Fusion state lives on the stage instances; reset it first so that
    # re-binding, or reusing a stage object in a different pipeline, never
    # inherits stale rotations/flags from an earlier fusion decision.
    reset_fusion_state(stages)

    out: List = []
    i = 0
    while i < len(stages):
        st = stages[i]
        nxt = stages[i + 1] if i + 1 < len(stages) else None

        def _demod_takes_rot(d):
            return isinstance(d, FMDemod) and d.mode == "quadrature"

        if (isinstance(st, FreqShift) and st.mode == "exact"
                and st.freq != 0.0 and _demod_takes_rot(nxt)):
            nxt._pending_rot_freqs.append(st.freq)
            i += 1  # drop the FreqShift; demod folds the rotation
            continue
        if (isinstance(st, FreqShift) and st.mode == "exact"
                and isinstance(nxt, AMDemod)):
            i += 1  # |x| is rotation-invariant: drop outright
            continue
        from libsdr_tpu.ops.fsk import FSKDetector
        if (isinstance(st, IQBaseBand) and type(st) is IQBaseBand
                and _demod_takes_rot(nxt)
                and not nxt._pending_rot_freqs
                and i + 2 < len(stages)
                and type(stages[i + 2]) is FSKDetector
                and _on_tpu()):
            # AFSK chain [IQBaseBand -> FMDemod -> FSKDetector]: one op
            # emits the uint8 symbol stream straight from raw IQ (on wide
            # banks via ONE Pallas pass — FIR + discriminator + dual-tone
            # correlator; neither baseband nor audio touches HBM).
            from libsdr_tpu.ops.afsk_fused import AFSKFrontendFused
            out.append(AFSKFrontendFused(st, nxt, stages[i + 2]))
            i += 3
            continue
        if (isinstance(st, IQBaseBand) and type(st) is IQBaseBand
                and _demod_takes_rot(nxt)
                and not nxt._pending_rot_freqs
                and _on_tpu()):
            # Full fusion: one op computes audio straight from raw IQ (on
            # wide banks via the pallas kernel — the complex baseband never
            # touches HBM).  Exactly equal math to the fold-rotation path.
            from libsdr_tpu.ops.demod import FMDeemph
            from libsdr_tpu.ops.fm_fused import FMBasebandFused
            fused = FMBasebandFused(st, nxt)
            i += 2
            nxt2 = stages[i] if i < len(stages) else None
            if isinstance(nxt2, FMDeemph) and nxt2.enabled:
                # The de-emphasis IIR rides along in the kernel (frame
                # matmul vs its impulse-response matrix + carried state).
                fused.absorb_deemph(nxt2)
                i += 1
            out.append(fused)
            continue
        from libsdr_tpu.ops.channelizer import Channelizer
        if (type(st) is Channelizer and _demod_takes_rot(nxt)
                and not nxt._pending_rot_freqs and _on_tpu()):
            # Channelizer -> FMDemod: one Pallas pass over the wideband
            # stream writing only audio (ops/wideband_rx.py); 'channel'
            # layout keeps the pair's exact (M, t) output contract.
            from libsdr_tpu.ops.wideband_rx import WidebandFM
            out.append(WidebandFM(st.m, st.p, gain=float(nxt.gain),
                                  prototype=st._proto, layout="channel"))
            i += 2
            continue
        from libsdr_tpu.ops.demod import USBDemod
        if (isinstance(st, IQBaseBand) and type(st) is IQBaseBand
                and isinstance(nxt, USBDemod) and _on_tpu()):
            # Full SSB fusion (exact per-output NCO phasor in-kernel).
            from libsdr_tpu.ops.agc import AGC
            from libsdr_tpu.ops.fm_fused import USBBasebandFused
            nxt2 = stages[i + 2] if i + 2 < len(stages) else None
            agc = nxt2 if isinstance(nxt2, AGC) and nxt2.enabled else None
            out.append(USBBasebandFused(st, agc))
            i += 3 if agc is not None else 2
            continue
        if (isinstance(st, IQBaseBand) and type(st) is IQBaseBand
                and isinstance(nxt, AMDemod) and _on_tpu()):
            # Full AM fusion: band-pass FIR + |y| envelope (+ AGC) in one
            # op; on wide banks the Pallas kernel writes only f32 audio.
            from libsdr_tpu.ops.agc import AGC
            from libsdr_tpu.ops.fm_fused import AMBasebandFused
            nxt2 = stages[i + 2] if i + 2 < len(stages) else None
            agc = nxt2 if isinstance(nxt2, AGC) and nxt2.enabled else None
            out.append(AMBasebandFused(st, agc))
            i += 3 if agc is not None else 2
            continue
        if (isinstance(st, IQBaseBand) and st.fc != 0.0
                and (_demod_takes_rot(nxt) or isinstance(nxt, AMDemod))):
            st.fold_nco = True
            if _demod_takes_rot(nxt):
                nxt._pending_rot_freqs.append(st.fc)
            out.append(st)
            i += 1
            continue
        out.append(st)
        i += 1
    return out
