"""Fractional-delay interpolation bank.

The reference ships a static 129x8 table of 8-tap interpolation filters
indexed by fractional delay mu in [0,1] at 1/128 resolution
(reference: src/interpolate.hh:8-137), with the convention that row mu
evaluates the signal at position ``4 - mu`` within an 8-sample window
(row 0 = delta at index 4, row 128 = delta at index 3).

We *generate* an equivalent bank from first principles — Blackman-windowed
sinc fractional-delay filters with unity DC gain — rather than shipping the
table as data.  Quality is equivalent (the reference's table is the classic
MMSE interpolator; windowed sinc matches it to ~-60 dB for band-limited
signals, verified in tests/test_ops.py::test_resampler_tone_fidelity and
::test_resampler_upsample).
"""

from __future__ import annotations

import functools

import numpy as np

NSTEPS = 128   # table resolution (reference: 129 rows = NSTEPS+1)
NTAPS = 8      # taps per filter (reference: src/interpolate.hh)
CENTER = 4     # row 0 is a delta at index 4 (reference table row 0)


@functools.lru_cache(maxsize=None)
def interpolation_bank() -> np.ndarray:
    """(NSTEPS+1, NTAPS) float32 bank; row r evaluates x at window position
    ``CENTER - r/NSTEPS``."""
    bank = np.zeros((NSTEPS + 1, NTAPS), dtype=np.float64)
    i = np.arange(NTAPS)
    for r in range(NSTEPS + 1):
        mu = r / NSTEPS
        t = i - (CENTER - mu)  # distance from the evaluation point
        h = np.sinc(t)
        # Blackman window centered on the evaluation point, spanning the taps.
        w = 0.42 + 0.5 * np.cos(np.pi * t / CENTER) + 0.08 * np.cos(2 * np.pi * t / CENTER)
        h = h * np.clip(w, 0.0, None)
        bank[r] = h / h.sum()  # unity DC gain
    return bank.astype(np.float32)


def interpolate(window: np.ndarray, mu: float):
    """Evaluate an 8-sample window at position CENTER - mu (host-side helper,
    mirroring the reference's ``sdr::interpolate``, src/interpolate.hh:139-146)."""
    row = int(round(mu * NSTEPS))
    return (window * interpolation_bank()[row]).sum(axis=-1)
