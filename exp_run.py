import os, time
import numpy as np, jax, jax.numpy as jnp
from libsdr_tpu.core import cplx
from libsdr_tpu.core.cplx import Complex
from libsdr_tpu.ops.channelizer import fold_commutator, prototype_lowpass
import exp_pfb_mod as mod
m = int(os.environ.get('PFB_M', '1024')); p = 8
B = 1 << 26
F = B // m
taps3 = fold_commutator(prototype_lowpass(m, p), m, p)
key = jax.random.PRNGKey(0)
xf = Complex(jax.random.normal(key, (F, m), jnp.float32),
             jax.random.normal(jax.random.PRNGKey(1), (F, m), jnp.float32))
hb = cplx.as_block(np.zeros((p, m), np.complex64))
demod = os.environ.get('PFB_DEMOD', '1') == '1'
def force(r):
    if isinstance(r, Complex): r = r.re
    return float(jnp.sum(r))
def timeit(fn, n=4):
    force(fn())
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n): r = fn()
        force(r)
        best = min(best, (time.perf_counter() - t0) / n)
    return best
t = timeit(lambda: mod.pfb_mxu(xf, hb, taps3, m, demod=demod))
print(f"m={m} {os.environ.get('PFB_STAGE','full'):9s} demod={int(demod)}: {t*1e3:7.3f} ms  {B/t/1e9:6.2f} Gsps")
