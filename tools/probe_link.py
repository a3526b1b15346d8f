"""Host<->device link characterization for the current TPU session.

Writes TUNNELLINK_r*.json: d2h round-trip latency + bandwidth and h2d
bandwidth, measured with FRESH results per iteration (a repeated
``np.asarray`` of the same array returns the host-side cached copy and
measures nothing).  Every transfer-sensitive artifact (DECODERBANK,
MULTIMODE, LIVEINGEST) should be read against this round's link numbers:
the tunneled link degrades round to round (r2 ~0.7 GB/s h2d; r5 measured
~90 MB/s h2d / ~44 MB/s d2h with a ~25 ms per-fetch RTT).

No reference analog (the C++ reference is host-only); this is the TPU
deployment's PCIe-roofline stand-in, cf. DEPLOYMENT.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(res: dict) -> None:
    import jax
    import jax.numpy as jnp

    add = jax.jit(lambda a, i: a + i)
    res["platform"] = jax.default_backend()
    for label, n in [("8B", 2), ("32KB", 8192), ("1MB", 262144),
                     ("16MB", 4194304)]:
        base = jnp.zeros((n,), jnp.float32)
        np.asarray(add(base, 0.0))  # compile + settle
        best = float("inf")
        for i in range(1, 5):
            y = add(base, float(i))
            _ = float(jnp.sum(y[:1]))  # compute done; scalar fetch
            t0 = time.perf_counter()
            np.asarray(y)
            best = min(best, time.perf_counter() - t0)
        res[f"d2h_{label}_ms"] = round(best * 1e3, 2)
        res[f"d2h_{label}_MBps"] = round(n * 4 / 1e6 / best, 1)

    for label, n in [("1MB", 262144), ("16MB", 4194304)]:
        host = np.zeros((n,), np.float32)
        y = jax.device_put(host)
        float(jnp.sum(y[:1]))
        best = float("inf")
        for i in range(1, 4):
            host[0] = i
            t0 = time.perf_counter()
            y = jax.device_put(host)
            float(jnp.sum(y[:1]))   # includes one d2h RTT; subtracted below
            best = min(best, time.perf_counter() - t0)
        rtt = res["d2h_8B_ms"] / 1e3
        res[f"h2d_{label}_MBps"] = round(n * 4 / 1e6 / max(best - rtt,
                                                           1e-4), 1)
    res["d2h_rtt_ms"] = res["d2h_8B_ms"]
    res["metric"] = ("host<->device link probe: d2h RTT + bandwidth, h2d "
                     "bandwidth (fresh results per fetch)")


def main() -> None:
    res: dict = {}
    measure(res)
    print(json.dumps(res))
    from tools._artifact import write_artifact
    write_artifact("TUNNELLINK", res)


if __name__ == "__main__":
    main()
