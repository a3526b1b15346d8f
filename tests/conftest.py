"""Test configuration.

Default: force an 8-device virtual CPU mesh so the unit/sharding tests run
anywhere (multi-chip TPU hardware is exercised by the driver's
dryrun_multichip entry instead).

With ``LIBSDR_TPU_TESTS=1`` the real backend is kept so the on-hardware
smoke suite (tests/test_tpu_smoke.py, run via tools/tpu_check.py) executes
on the TPU.  Only that file is meant to run in this mode — the sharding
tests need the 8-device virtual mesh.
"""

import os

TPU_MODE = os.environ.get("LIBSDR_TPU_TESTS", "") == "1"

if not TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_MODE:
    # The environment's axon plugin force-sets jax_platforms at import time;
    # override it back to CPU for the unit tests.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def snr_db(ref, test):
    """Signal-to-error ratio in dB between a reference and a test signal."""
    ref = np.asarray(ref, dtype=np.complex128)
    test = np.asarray(test, dtype=np.complex128)
    err = ref - test
    p_sig = np.mean(np.abs(ref) ** 2)
    p_err = np.mean(np.abs(err) ** 2)
    if p_err == 0:
        return np.inf
    return 10 * np.log10(p_sig / p_err)
