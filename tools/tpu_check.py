"""Run the on-hardware smoke/parity suite (tests/test_tpu_smoke.py) on the
real TPU backend.

The regular test suite forces an 8-device virtual CPU mesh; this runner
sets ``LIBSDR_TPU_TESTS=1`` so conftest keeps the axon TPU backend, and
runs ONLY the smoke file (the sharding tests need the virtual mesh).

Usage: python tools/tpu_check.py [extra pytest args]
Exit code is pytest's.
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    env = dict(os.environ, LIBSDR_TPU_TESTS="1")
    cmd = [sys.executable, "-m", "pytest",
           os.path.join(ROOT, "tests", "test_tpu_smoke.py"),
           "-q", *sys.argv[1:]]
    return subprocess.call(cmd, cwd=ROOT, env=env)


if __name__ == "__main__":
    raise SystemExit(main())
