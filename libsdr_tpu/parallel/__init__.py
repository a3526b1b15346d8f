"""Multi-chip scale-out (no referent in the reference, which is single-process
pthreads only — SURVEY.md section 2.9).  The parallelism axes of an SDR
pipeline are channels x time-blocks x filter taps; here:

- channel parallelism: shard the leading channel dim over the mesh ('ch'
  axis) — the data-parallel analog; every op broadcasts over leading dims.
- time-block (sequence) parallelism: shard the trailing time dim over the
  mesh ('time' axis); overlap-save FIR tails become halo exchanges, which
  XLA GSPMD inserts automatically for spatially-sharded convolutions (or
  explicitly via ppermute in :mod:`libsdr_tpu.parallel.halo`).
"""

from libsdr_tpu.parallel.mesh import make_mesh, shard_pipeline_step

__all__ = ["make_mesh", "shard_pipeline_step"]
