"""Fused FM receiver front end: IQBaseBand + quadrature FMDemod as ONE op.

Installed by the graph fusion pass (core/fuse.py) on TPU backends when an
IQBaseBand feeds a quadrature FMDemod.  The payoff: on wide channel banks
the pallas kernel (ops/pallas_fir_mxu.fir_fm_mxu) computes f32 audio
straight from the raw IQ block — the complex baseband y never exists in
HBM (it was 0.5x the input written + read twice by the discriminator's
shifted product).  Narrow banks fall back to the XLA matmul FIR + fused
elementwise demod, which is exactly what the unfused graph compiles to.

Math (identical to the unfused [IQBaseBand -> FMDemod] pair with the NCO
folded, core/fuse.py): y = decimating-FIR(x, g2), audio[j] = gain *
angle(y[j] * conj(y[j-1]) * rot), rot = e^(-i 2 pi fc D / fs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from libsdr_tpu.core import cplx
from libsdr_tpu.core.block import Processor
from libsdr_tpu.core.cplx import Complex
from libsdr_tpu.core.stream import StreamSpec
from libsdr_tpu.ops import firdesign
from libsdr_tpu.ops.baseband import IQBaseBand, fused_baseband_taps
from libsdr_tpu.ops.demod import FMDemod
from libsdr_tpu.ops.fir import _conv1d, _fir_main, fir_overlap_save


class AMBasebandFused(Processor):
    """One-op AM receiver front end (built by core/fuse.py from
    [IQBaseBand -> AMDemod (-> AGC)]): decimating band-pass FIR + envelope
    + optional AGC in one pass.  |y| is rotation invariant so the NCO
    vanishes outright (reference chain: src/baseband.hh + demod.hh:73-76 +
    utils.hh:657-793).  On wide channel banks the Pallas kernel
    (ops/pallas_fir_mxu.fir_fm_mxu mode='am') computes f32 audio straight
    from raw IQ — the complex baseband never touches HBM; the AGC envelope
    IIR rides along as an impulse-response matmul with carried state."""

    def __init__(self, bb: IQBaseBand, agc=None):
        super().__init__()
        self.bb = bb
        self.agc = agc

    def _bind(self, in_spec: StreamSpec) -> StreamSpec:
        in_spec.require_complex("AMBasebandFused")
        bb = self.bb
        fs = in_spec.rate_hz
        if bb.out_rate is not None:
            bb.decim = max(1, int(fs / bb.out_rate))
        in_spec.require_block_multiple("AMBasebandFused", bb.decim)
        if bb.design == "ref":
            k = firdesign.ref_complex_bandpass(bb.order, bb.ff, bb.width, fs)
        else:
            k = firdesign.complex_bandpass(bb.order, bb.ff, bb.width, fs)
        g = fused_baseband_taps(k, bb.fc, fs, bb.decim)
        t = len(g)
        w = 2 * np.pi * bb.fc / fs
        self._offset = bb.decim - 1
        self._g2 = g * np.exp(-1j * w * (np.arange(t) - (t - 1)
                                         + self._offset))
        self._decim = bb.decim
        self._t = t
        out_rate = fs / bb.decim
        if self.agc is not None:
            import math
            lam = math.exp(-1.0 / (self.agc.tau * out_rate))
            self._ab = (lam, 1.0 - lam)
            self._gain = self.agc.target / 4.0
        else:
            self._ab = None
            self._gain = 1.0
        return in_spec.with_(
            dtype=jnp.float32, plane_dtype=None,
            sample_rate=in_spec.sample_rate / bb.decim,
            block_size=in_spec.block_size // bb.decim)

    def init_carry(self):
        ch = self.in_spec.channels
        tail = cplx.zeros(ch + (self._t - 1,), self.in_spec.real_dtype)
        if self._ab is None:
            return (tail,)
        # sd initialized to target (reference: src/utils.hh:692)
        return (tail, jnp.full(ch, self.agc.target, jnp.float32))

    def _epilogue(self, y: Complex, sd_state):
        from libsdr_tpu.ops.iir import iir_first_order

        sig = y.abs()
        if self._ab is None:
            return sig * self._gain, None
        sdv, sd_last = iir_first_order(sig, self._ab[0], self._ab[1],
                                       sd_state)
        return self._gain * sig / sdv, sd_last

    def apply(self, carry, x):
        tail = carry[0]
        sd_state = carry[1] if self._ab is not None else None
        d, t, offset = self._decim, self._t, self._offset
        b = x.re.shape[-1]
        n_lead = -(-(t - 1 - offset) // d) if t - 1 > offset else 0
        s0 = offset + n_lead * d - (t - 1)
        if b < t - 1 + max(s0, 0) or n_lead <= 0:
            xc = cplx.concatenate([tail, x], axis=-1)
            y = _conv1d(xc[..., offset:], self._g2, d)
            audio, sd_state = self._epilogue(y, sd_state)
            new_tail = xc[..., xc.shape[-1] - (t - 1):]
            return ((new_tail,) if self._ab is None
                    else (new_tail, sd_state)), audio

        from libsdr_tpu.ops import fir as fir_mod
        use_k, interp = fir_mod.kernel_dispatch()
        on_wide_tpu = (use_k and self._ab is not None
                       and x.re.ndim == 2 and x.re.shape[0] >= 64)
        # Exact-tiling kernel first: it consumes tail+block whole, so the
        # lead segment below would be traced-then-dead on this path.
        if on_wide_tpu and offset == d - 1:
            from libsdr_tpu.ops import pallas_fir_mxu as pfm
            if pfm.mxu_fir2_supported(t, d, x.re.shape[0], b,
                                      dtype=x.re.dtype):
                c = x.re.shape[0]
                audio, exports = pfm.fir_fm_exact(
                    x, self._g2, d, tail,
                    cplx.zeros((c, 1), jnp.float32), 1.0, self._gain,
                    deemph_ab=self._ab,
                    deemph_lead=sd_state[..., None], mode="am",
                    interpret=interp)
                sd_state = exports.re[..., 0]   # AGC envelope state export
                new_tail = x[..., b - (t - 1):]
                return (new_tail, sd_state), audio

        head_len = offset + (n_lead - 1) * d + 1
        xc_head = cplx.concatenate([tail, x[..., :head_len]], axis=-1)
        y_lead = _conv1d(xc_head[..., offset:], self._g2, d)
        audio_lead, sd_lead = self._epilogue(y_lead, sd_state)
        n_main = (b - s0 - t) // d + 1

        audio_main = None
        if on_wide_tpu:
            from libsdr_tpu.ops import pallas_fir_mxu as pfm
            if pfm.mxu_fir_supported(t, d, s0, x.re.shape[0], b,
                                     dtype=x.re.dtype):
                c = x.re.shape[0]
                lead0 = cplx.zeros((c, 1), jnp.float32)
                audio_full, sd_kernel, nsp = pfm.fir_fm_mxu(
                    x, self._g2, d, s0, lead0, 1.0, self._gain,
                    deemph_ab=self._ab, deemph_lead=sd_lead[..., None],
                    mode="am", interpret=interp)
                s_k = pfm._S
                f_full = b // (d * s_k)
                n_valid = min(f_full * s_k - nsp, n_main)
                audio_main = audio_full[..., :n_valid]
                # Rest outputs chain the AGC state: within the valid range
                # the kernel's exported sd equals the state after its LAST
                # emitted sample only when nothing was truncated; recompute
                # the boundary state from the last valid audio instead:
                # sd = gain * |y| / audio.
                y_rest = _conv1d(x[..., s0 + max(n_valid - 1, 0) * d:],
                                 self._g2, d)
                sig_rest = y_rest.abs()
                sd0 = jnp.where(
                    audio_main[..., -1] > 0,
                    self._gain * sig_rest[..., 0]
                    / jnp.maximum(audio_main[..., -1], 1e-30),
                    sd_lead)
                if sig_rest.shape[-1] > 1:
                    from libsdr_tpu.ops.iir import iir_first_order
                    sdv, sd_state = iir_first_order(
                        sig_rest[..., 1:], self._ab[0], self._ab[1], sd0)
                    audio_rest = self._gain * sig_rest[..., 1:] / sdv
                else:
                    sd_state = sd0
                    audio_rest = sig_rest[..., 1:]
                audio = jnp.concatenate(
                    [audio_lead, audio_main, audio_rest], axis=-1)
        if audio_main is None:
            y_main = _fir_main(x, self._g2, d, s0)
            y = cplx.concatenate([y_lead, y_main], axis=-1)
            audio, sd_state = self._epilogue(y, sd_state)
        new_tail = x[..., b - (t - 1):]
        return ((new_tail,) if self._ab is None
                else (new_tail, sd_state)), audio


class USBBasebandFused(Processor):
    """One-op SSB receiver front end (built by core/fuse.py from
    [IQBaseBand -> USBDemod (-> AGC)]): decimating band-pass FIR + exact
    NCO rotation + (re+im)/2 + optional AGC in one pass (reference chain:
    src/baseband.hh + demod.hh:156-160 + utils.hh:657-793; LSB = negative
    filter band, examples/sdr_rec.cc:53-58).

    Unlike AM/FM the SSB demod is not rotation-invariant, so the kernel
    needs a per-OUTPUT phasor: e^(-i theta (n0 + n)) factors into a
    per-frame scalar (host-exact f64 ramp x carried unit phasor, the same
    scheme as FreqShift's exact mode) times a per-lane row constant."""

    def __init__(self, bb: IQBaseBand, agc=None):
        super().__init__()
        self.bb = bb
        self.agc = agc

    def _bind(self, in_spec: StreamSpec) -> StreamSpec:
        in_spec.require_complex("USBBasebandFused")
        bb = self.bb
        fs = in_spec.rate_hz
        if bb.out_rate is not None:
            bb.decim = max(1, int(fs / bb.out_rate))
        in_spec.require_block_multiple("USBBasebandFused", bb.decim)
        if bb.design == "ref":
            k = firdesign.ref_complex_bandpass(bb.order, bb.ff, bb.width, fs)
        else:
            k = firdesign.complex_bandpass(bb.order, bb.ff, bb.width, fs)
        g = fused_baseband_taps(k, bb.fc, fs, bb.decim)
        t = len(g)
        w = 2 * np.pi * bb.fc / fs
        self._offset = bb.decim - 1
        self._g2 = g * np.exp(-1j * w * (np.arange(t) - (t - 1)
                                         + self._offset))
        self._decim = bb.decim
        self._t = t
        d = bb.decim
        n_out = in_spec.block_size // d
        theta = w * d                     # per-output phase step
        # exact-NCO constants (host f64, like ops/nco.py 'exact'):
        self._ramp = cplx.constant(
            np.exp(-1j * theta * np.arange(n_out)), jnp.float32)
        self._block_step = cplx.constant(np.exp(-1j * theta * n_out))
        f_total = n_out // 128
        if f_total * 128 == n_out:
            fr = np.exp(-1j * theta * 128.0 * np.arange(f_total))
            self._frame_ramp = cplx.constant(fr, jnp.float32)
            rrow = np.exp(-1j * theta * np.arange(128))
            rr = np.zeros((16, 128), np.float32)
            rr[0] = rrow.real
            rr[8] = rrow.imag
            self._rrow = jnp.asarray(rr)
        else:
            self._frame_ramp = None
        out_rate = fs / d
        if self.agc is not None:
            import math
            lam = math.exp(-1.0 / (self.agc.tau * out_rate))
            self._ab = (lam, 1.0 - lam)
            self._gain = self.agc.target / 4.0
        else:
            self._ab = None
            self._gain = 1.0
        return in_spec.with_(
            dtype=jnp.float32, plane_dtype=None,
            sample_rate=in_spec.sample_rate / d,
            block_size=in_spec.block_size // d)

    def init_carry(self):
        ch = self.in_spec.channels
        tail = cplx.zeros(ch + (self._t - 1,), self.in_spec.real_dtype)
        phasor = cplx.full_like_phasor(())
        if self._ab is None:
            return (tail, phasor)
        return (tail, phasor,
                jnp.full(ch, self.agc.target, jnp.float32))

    def _next_phasor(self, a0):
        nxt = a0 * self._block_step
        return nxt / nxt.abs()

    def apply(self, carry, x):
        from libsdr_tpu.ops.iir import iir_first_order

        tail, a0 = carry[0], carry[1]
        sd_state = carry[2] if self._ab is not None else None
        d, t, offset = self._decim, self._t, self._offset
        b = x.re.shape[-1]

        def pack(new_tail, sd):
            if self._ab is None:
                return (new_tail, self._next_phasor(a0))
            return (new_tail, self._next_phasor(a0), sd)

        from libsdr_tpu.ops import fir as fir_mod
        use_k, interp = fir_mod.kernel_dispatch()
        if (use_k and self._ab is not None
                and self._frame_ramp is not None
                and x.re.ndim == 2 and x.re.shape[0] >= 64
                and offset == d - 1):
            from libsdr_tpu.ops import pallas_fir_mxu as pfm
            if pfm.mxu_fir2_supported(t, d, x.re.shape[0], b,
                                      dtype=x.re.dtype):
                c = x.re.shape[0]
                af = a0 * self._frame_ramp       # (F,) complex phasors
                fph = jnp.zeros((af.re.shape[0], 8), jnp.float32)
                fph = fph.at[:, 0].set(af.re).at[:, 1].set(af.im)
                audio, exports = pfm.fir_fm_exact(
                    x, self._g2, d, tail, cplx.zeros((c, 1), jnp.float32),
                    1.0, self._gain, deemph_ab=self._ab,
                    deemph_lead=sd_state[..., None], mode="usb",
                    usb_phasors=(fph, self._rrow), interpret=interp)
                return pack(x[..., b - (t - 1):],
                            exports.re[..., 0]), audio

        # XLA path: overlap-save FIR, exact rotation, (re+im)/2, AGC.
        y, new_tail = fir_overlap_save(self._g2, x, tail, stride=d,
                                       offset=offset)
        z = y * (a0 * self._ramp)
        sig = (z.re + z.im) * 0.5
        if self._ab is None:
            return pack(new_tail, None), sig * self._gain
        sdv, sd_last = iir_first_order(jnp.abs(sig), self._ab[0],
                                       self._ab[1], sd_state)
        return pack(new_tail, sd_last), self._gain * sig / sdv


class FMBasebandFused(Processor):
    """One-op FM front end (built by core/fuse.py from IQBaseBand+FMDemod)."""

    def __init__(self, bb: IQBaseBand, demod: FMDemod):
        super().__init__()
        self.bb = bb
        self.demod = demod
        self.deemph = None  # set by core/fuse.py when an FMDeemph follows

    def absorb_deemph(self, deemph) -> None:
        self.deemph = deemph

    def _bind(self, in_spec: StreamSpec) -> StreamSpec:
        in_spec.require_complex("FMBasebandFused")
        bb = self.bb
        fs = in_spec.rate_hz
        if bb.out_rate is not None:
            bb.decim = max(1, int(fs / bb.out_rate))
        in_spec.require_block_multiple("FMBasebandFused", bb.decim)
        if bb.design == "ref":
            k = firdesign.ref_complex_bandpass(bb.order, bb.ff, bb.width, fs)
        else:
            k = firdesign.complex_bandpass(bb.order, bb.ff, bb.width, fs)
        g = fused_baseband_taps(k, bb.fc, fs, bb.decim)
        t = len(g)
        w = 2 * np.pi * bb.fc / fs
        self._offset = bb.decim - 1
        self._g2 = g * np.exp(-1j * w * (np.arange(t) - (t - 1)
                                         + self._offset))
        self._decim = bb.decim
        self._t = t
        self._rot = np.exp(-1j * w * bb.decim)
        self._gain = float(self.demod.gain)
        self._rot_c = cplx.constant(self._rot, in_spec.real_dtype
                                    if in_spec.plane_dtype is None
                                    else jnp.float32)
        if self.deemph is not None:
            import math
            out_rate = fs / bb.decim
            alpha = max(1, int(round(
                1.0 / (1.0 - math.exp(-1.0 / (out_rate * self.deemph.tau))))))
            self._dab = (1.0 - 1.0 / alpha, 1.0 / alpha)
        else:
            self._dab = None
        return in_spec.with_(
            dtype=jnp.float32, plane_dtype=None,
            sample_rate=in_spec.sample_rate / bb.decim,
            block_size=in_spec.block_size // bb.decim)

    def init_carry(self):
        ch = self.in_spec.channels
        tail = cplx.zeros(ch + (self._t - 1,), self.in_spec.real_dtype)
        # prev = rot cancels the folded rotation on the very first sample,
        # matching the unfused graph's initial transient (ops/demod.py).
        prev = cplx.full_like_phasor(ch) * cplx.constant(self._rot)
        if self._dab is None:
            return (tail, prev)
        return (tail, prev, jnp.zeros(ch, jnp.float32))

    def _demod(self, y: Complex, prev: Complex):
        shifted = cplx.concatenate([prev[..., None], y[..., :-1]], axis=-1)
        z = (y * shifted.conj()) * self._rot_c
        return z.angle() * self._gain

    def _carry_out(self, new_tail, new_prev, dstate):
        if self._dab is None:
            return (new_tail, new_prev)
        return (new_tail, new_prev, dstate)

    def apply(self, carry, x):
        from libsdr_tpu.ops.iir import iir_first_order

        if self._dab is None:
            tail, prev = carry
            dstate = None
        else:
            tail, prev, dstate = carry
        da, db = self._dab if self._dab is not None else (0.0, 0.0)
        d, t, offset = self._decim, self._t, self._offset
        b = x.re.shape[-1]
        n_lead = -(-(t - 1 - offset) // d) if t - 1 > offset else 0
        s0 = offset + n_lead * d - (t - 1)
        if b < t - 1 + max(s0, 0) or n_lead <= 0:
            # Degenerate small-block shape: dense fallback.
            xc = cplx.concatenate([tail, x], axis=-1)
            y = _conv1d(xc[..., offset:], self._g2, d)
            audio = self._demod(y, prev)
            if self._dab is not None:
                audio, dstate = iir_first_order(audio, da, db, dstate)
            new_tail = xc[..., xc.shape[-1] - (t - 1):]
            return self._carry_out(new_tail, y[..., -1], dstate), audio

        from libsdr_tpu.ops import fir as fir_mod
        # kernel_dispatch covers the kill switch + kernel_mode override
        # (the fused kernels subsume the Pallas FIR).
        use_k, interp = fir_mod.kernel_dispatch()
        on_wide_tpu = (use_k and x.re.ndim == 2 and x.re.shape[0] >= 64)
        if on_wide_tpu and offset == d - 1:
            # Exact-tiling kernel: consumes tail+block, emits EXACTLY b/d
            # outputs — no lead/rest segments and no full-rate audio
            # concat (which cost ~10 ms/iter at the bench config).  Checked
            # before the lead segment below, which this path never uses.
            from libsdr_tpu.ops import pallas_fir_mxu as pfm
            if pfm.mxu_fir2_supported(t, d, x.re.shape[0], b,
                                      dtype=x.re.dtype):
                audio, y_last = pfm.fir_fm_exact(
                    x, self._g2, d, tail, prev[..., None], self._rot,
                    self._gain, deemph_ab=self._dab,
                    deemph_lead=(dstate[..., None]
                                 if self._dab is not None else None),
                    interpret=interp)
                if self._dab is not None:
                    dstate = audio[..., -1]
                new_tail = x[..., b - (t - 1):]
                return self._carry_out(new_tail, y_last[..., 0],
                                       dstate), audio

        head_len = offset + (n_lead - 1) * d + 1
        xc_head = cplx.concatenate([tail, x[..., :head_len]], axis=-1)
        y_lead = _conv1d(xc_head[..., offset:], self._g2, d)
        audio_lead = self._demod(y_lead, prev)
        if self._dab is not None:
            audio_lead, dlead = iir_first_order(audio_lead, da, db, dstate)
        n_main = (b - s0 - t) // d + 1

        audio_main = None
        if on_wide_tpu:
            from libsdr_tpu.ops import pallas_fir_mxu as pfm
            if pfm.mxu_fir_supported(t, d, s0, x.re.shape[0], b,
                                     dtype=x.re.dtype):
                audio_full, nsp = pfm.fir_fm_mxu(
                    x, self._g2, d, s0, y_lead[..., -1:], self._rot,
                    self._gain,
                    deemph_ab=self._dab,
                    deemph_lead=(dlead[..., None]
                                 if self._dab is not None else None),
                    interpret=interp)
                s_k = pfm._S
                f_full = b // (d * s_k)
                n_valid = min(f_full * s_k - nsp, n_main)
                audio_main = audio_full[..., :n_valid]
                # Rest outputs, starting one early so the discriminator
                # chains through output n_valid-1 without kernel exports.
                rest_from = max(n_valid - 1, 0)
                y_rest = _conv1d(x[..., s0 + rest_from * d:], self._g2, d)
                z = (y_rest[..., 1:] * y_rest[..., :-1].conj()) * self._rot_c
                audio_rest = z.angle() * self._gain
                if self._dab is not None:
                    # First-order state == previous deemphasized output, so
                    # the kernel's last emitted sample seeds the rest chain.
                    if audio_rest.shape[-1] > 0:
                        audio_rest, dstate = iir_first_order(
                            audio_rest, da, db, audio_main[..., -1])
                    else:
                        dstate = audio_main[..., -1]
                audio = jnp.concatenate(
                    [audio_lead, audio_main, audio_rest], axis=-1)
                new_prev = y_rest[..., -1]
        if audio_main is None:
            y_main = _fir_main(x, self._g2, d, s0)
            y = cplx.concatenate([y_lead, y_main], axis=-1)
            audio = self._demod(y, prev)
            if self._dab is not None:
                audio, dstate = iir_first_order(audio, da, db, dstate)
            new_prev = y[..., -1]
        new_tail = x[..., b - (t - 1):]
        return self._carry_out(new_tail, new_prev, dstate), audio
