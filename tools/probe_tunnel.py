"""Append one JSON line of axon-tunnel health evidence to a probe log.

The round-3 verdict hinged on whether a failed capture was an environment
outage or a regression.  This probe records both signals that distinguish
them: the relay's TCP state (instant empty recv = upstream leg dead) and
whether `jax.devices()` comes up within a short timeout — timestamped, so
the outage window is documented in-repo rather than reconstructed.

Usage: python tools/probe_tunnel.py [--log TUNNEL_PROBES_r04.jsonl]
Exit code 0 = TPU usable, 1 = not.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time


def relay_state(port: int = 2024, timeout: float = 5.0) -> str:
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=timeout)
        s.settimeout(3.0)
        try:
            data = s.recv(1)
        except socket.timeout:
            return "open-pending"
        finally:
            s.close()
        return "dead-upstream" if data == b"" else "data"
    except Exception as e:
        return f"connect-failed: {e}"


def jax_alive(timeout_s: float = 90.0) -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "print(float(jnp.arange(8.0).sum()), jax.devices()[0].platform)"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False
    # The plugin has reported its platform as both "axon" and (since
    # 2026-08-19) "tpu"; either means the real chip answered.  Parse the
    # printed platform token (last stdout token) rather than substring-
    # matching the whole stream, so incidental log noise containing
    # "tpu"/"axon" can't count as a live chip.
    toks = r.stdout.split()
    return (r.returncode == 0 and bool(toks)
            and toks[-1].lower() in {"axon", "tpu"})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"TUNNEL_PROBES_r{os.environ.get('LIBSDR_ROUND', '05')}.jsonl"))
    args = ap.parse_args()

    relay = relay_state()
    # 2026-08-19: the relay's instant-EOF signature was observed while the
    # backend WORKED (relay protocol changed), so it is recorded as evidence
    # only — the jax probe is always the ground truth.
    alive = jax_alive()
    rec = {"ts": round(time.time(), 1),
           "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "relay": relay, "tpu_usable": alive}
    with open(args.log, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    sys.exit(0 if alive else 1)


if __name__ == "__main__":
    main()
