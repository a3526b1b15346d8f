"""Worker for tests/test_distributed.py failure-detection test: runs the
sharded wideband pipeline over N blocks with per-block sharded
checkpointing; process CRASH_PID kills itself (simulated lost host) at
block CRASH_AT of incarnation 0.  On relaunch, every process resumes from
its checkpoint — completed blocks are never recomputed (asserted via a
per-process work log).

Usage: ... <coordinator> <nproc> <pid> <incarnation> <workdir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    coordinator, nproc, pid, inc, workdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
        sys.argv[5])
    from libsdr_tpu.parallel.distributed import (init_multihost,
                                                 load_sharded_checkpoint,
                                                 save_sharded_checkpoint)

    init_multihost(coordinator, num_processes=nproc, process_id=pid)
    from jax.sharding import Mesh
    from libsdr_tpu.parallel.wideband import build_wideband_step

    n = jax.device_count()
    mesh1d = Mesh(np.asarray(jax.devices()), ("d",))
    m = 8
    block = m * n * 32
    n_blocks = 4
    crash_at = int(os.environ.get("CRASH_AT", "-1"))
    crash_pid = int(os.environ.get("CRASH_PID", "0"))

    step, init_carry, place_input = build_wideband_step(mesh1d, m, block)
    carry = init_carry()
    ckpt = os.path.join(workdir, f"ckpt_p{pid}.npz")
    start = 0
    if os.path.exists(ckpt):
        carry, start = load_sharded_checkpoint(ckpt, carry)

    rng = np.random.default_rng(5)
    blocks = [(rng.normal(size=block) + 1j * rng.normal(size=block)
               ).astype(np.complex64) for _ in range(n_blocks)]
    log = open(os.path.join(workdir, f"log_p{pid}.txt"), "a")
    out = None
    for b in range(start, n_blocks):
        if inc == 0 and pid == crash_pid and b == crash_at:
            os._exit(17)     # simulated lost host, mid-stream
        carry, out = step(carry, place_input(blocks[b]))
        jax.block_until_ready(out)
        save_sharded_checkpoint(ckpt, carry, b + 1)
        log.write(f"inc{inc} block{b}\n")
        log.flush()
    # dump this process's final-output shards for the test to reassemble
    shards = {}
    for s in out.addressable_shards:
        shards[f"rows_{s.index[0].start or 0}"] = np.asarray(s.data)
    np.savez(os.path.join(workdir, f"out_p{pid}.npz"), **shards)
    print(f"worker {pid} inc {inc} done")


if __name__ == "__main__":
    main()
