"""Worker process for tests/test_distributed.py: joins a 2-process
jax.distributed CPU cluster (4 virtual devices each -> 8 global), runs one
sharded wideband step over the GLOBAL mesh with host-sharded ingest, and
dumps its addressable output shards for the test to reassemble.

Usage: python tests/_distributed_worker.py <coordinator> <nproc> <pid> <out.npz>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    coordinator, nproc, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    from libsdr_tpu.parallel.distributed import init_multihost

    init_multihost(coordinator, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    from jax.sharding import Mesh
    from libsdr_tpu.parallel.wideband import build_wideband_step

    n = jax.device_count()
    mesh1d = Mesh(np.asarray(jax.devices()), ("d",))
    m = 8
    block = m * n * 32
    step, init_carry, place_input = build_wideband_step(mesh1d, m, block)

    rng = np.random.default_rng(99)
    x = (rng.normal(size=block) + 1j * rng.normal(size=block)
         ).astype(np.complex64)

    # True host-sharded ingest: each process materializes ONLY its own
    # time-range of the capture (the fetch callback sees global indices
    # for this host's shards only — counted to prove it).
    from jax.sharding import PartitionSpec as P
    from libsdr_tpu.core import cplx
    from libsdr_tpu.core.cplx import Complex
    from libsdr_tpu.parallel.distributed import place_global_ingest

    fetched = []

    def place_input_sharded(x1d):
        xb = cplx.as_block(x1d)

        def mk(plane):
            def fetch(idx):
                fetched.append(idx)
                return np.asarray(plane)[idx]
            return place_global_ingest(plane.shape, mesh1d, P("d"), fetch)

        return Complex(mk(xb.re), mk(xb.im))

    carry = init_carry()
    out = None
    for _ in range(2):  # two steps: exercises the carry hand-off too
        carry, out = step(carry, place_input_sharded(x))
    jax.block_until_ready(out)
    # every fetched range must be one of THIS process's shards
    per = block // (4 * nproc)
    lo = pid * 4 * per
    for (sl,) in fetched:
        assert lo <= (sl.start or 0) and sl.stop <= lo + 4 * per, \
            (pid, sl)

    # Dump this process's addressable shards (audio is (m, block//m) f32
    # sharded on channels).
    shards = {}
    for i, s in enumerate(out.addressable_shards):
        row0 = s.index[0].start or 0
        shards[f"rows_{row0}"] = np.asarray(s.data)
    np.savez(out_path, **shards)
    print(f"worker {pid} OK: {sorted(shards)}")


if __name__ == "__main__":
    main()
