import sys
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
F, m = 256, 256
x = jnp.asarray(np.random.randn(F, m), jnp.float32)
tt = F // 2
which = sys.argv[1]

def run(name, kern, scratch, grid=(2,)):
    f = pl.pallas_call(kern, grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((F // grid[0], m), lambda wi: (wi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, m), jnp.float32),
        scratch_shapes=scratch)
    r = jax.jit(f)(x)
    print(name, 'OK', float(jnp.sum(r)))

if which == 'T2':
    def k2(x_hbm, o_ref, scr, sem):
        wi = pl.program_id(0)
        pltpu.make_async_copy(x_hbm.at[pl.ds(wi*tt, tt)], scr.at[0], sem).start()
        pltpu.make_async_copy(scr.at[0], scr.at[0], sem).wait()
        o_ref[:] = pltpu.roll(scr[0], 1, axis=0)
    run('T2 roll-axis0', k2, [pltpu.VMEM((2, tt, m), jnp.float32), pltpu.SemaphoreType.DMA])
elif which == 'T3':
    def k3(x_hbm, o_ref, scr, g, sem):
        wi = pl.program_id(0)
        pltpu.make_async_copy(x_hbm.at[pl.ds(wi*tt, tt)], scr.at[0], sem).start()
        pltpu.make_async_copy(scr.at[0], scr.at[0], sem).wait()
        g[:] = scr[0, tt-8:tt, :]
        o_ref[:] = scr[0]
        o_ref[0:8, :] = g[:]
    run('T3 hist-scratch', k3, [pltpu.VMEM((2, tt, m), jnp.float32), pltpu.VMEM((8, m), jnp.float32), pltpu.SemaphoreType.DMA])
elif which == 'T4':
    # window scratch: DMA to offset-0 block scratch, VMEM copy into offset-p window
    def k4(x_hbm, o_ref, blk, win, sem):
        wi = pl.program_id(0)
        pltpu.make_async_copy(x_hbm.at[pl.ds(wi*tt, tt)], blk.at[0], sem).start()
        pltpu.make_async_copy(blk.at[0], blk.at[0], sem).wait()
        win[8:8+tt, :] = blk[0]
        win[0:8, :] = blk[0, 0:8, :]
        o_ref[:] = win[8:8+tt, :] + win[0:tt, :]
    run('T4 vmem-window', k4, [pltpu.VMEM((2, tt, m), jnp.float32), pltpu.VMEM((tt+8, m), jnp.float32), pltpu.SemaphoreType.DMA])
