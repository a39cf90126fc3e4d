import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NCARRY = int(sys.argv[1])

def make_kernel():
    def kernel(sc_ref, out_ref):
        zero = jnp.zeros((8, 128), jnp.float32)
        dyn_spp = sc_ref[1, 0].astype(jnp.int32)
        dyn_depth = sc_ref[1, 1].astype(jnp.int32)
        dyn_nsph = sc_ref[1, 2].astype(jnp.int32)

        def sphere_body(j, hs):
            # touch every carry so all stay live
            c = sc_ref[0, j]
            new = tuple(h + c * np.float32(1e-9) * (i + 1)
                        for i, h in enumerate(hs))
            t = new[0]
            win = t < new[1]
            return tuple(jnp.where(win, n, h) for n, h in zip(new, hs))

        def body(d, st):
            st = jax.lax.fori_loop(0, dyn_nsph, sphere_body, st)
            return st

        def sample(s, st):
            return jax.lax.fori_loop(0, dyn_depth, body, st)

        st0 = tuple(zero + i for i in range(NCARRY))
        st = jax.lax.fori_loop(0, dyn_spp, sample, st0)
        out_ref[:, :] = st[0]
    return kernel

sc = np.ones((2, 128), np.float32)
sc[1, 0], sc[1, 1], sc[1, 2] = 20, 12, 4
sc = jnp.asarray(sc)
f = pl.pallas_call(
    make_kernel(),
    grid=(25, 4),
    out_shape=jax.ShapeDtypeStruct((200, 512), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM),
)
out = jax.jit(f)(sc); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(5): out = jax.jit(f)(sc)
jax.block_until_ready(out)
print(f'ncarry={NCARRY}: {(time.perf_counter()-t0)/5*1e3:.2f} ms', flush=True)
