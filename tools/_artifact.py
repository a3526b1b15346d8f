"""Per-round bench artifact writer: every tools/bench_* run records its
JSON next to the driver's BENCH_r*.json so non-headline numbers are
regression-visible between rounds (VERDICT r2 weak #7)."""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_artifact(prefix: str, payload: dict) -> str:
    rnd = os.environ.get("LIBSDR_ROUND", "03")
    path = os.path.join(ROOT, f"{prefix}_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    return path
