"""Isolate megakernel runtime cost: loop overhead vs math ops (TPU)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MODE = sys.argv[1]  # base | trig | div | smem

def make_kernel(spp, depth, nsph):
    def kernel(sc_ref, out_ref):
        zero = jnp.zeros((8, 128), jnp.float32)
        dyn_spp = sc_ref[1, 0].astype(jnp.int32)
        dyn_depth = sc_ref[1, 1].astype(jnp.int32)
        dyn_nsph = sc_ref[1, 2].astype(jnp.int32)

        def sphere_body(j, hs):
            tb, acc = hs
            c = sc_ref[0, j] if MODE == "smem" else 0.5
            t = (acc - c) * (acc - c) + tb * 1e-9
            if MODE == "div":
                t = t / (acc + 2.0)
            win = t < tb
            return jnp.where(win, t, tb), jnp.where(win, acc + c, acc)

        def body(d, st):
            acc, sd = st
            tb, acc = jax.lax.fori_loop(0, dyn_nsph, sphere_body,
                                        (zero + 1e30, acc))
            if MODE == "trig":
                acc = acc + jnp.sin(tb) * 1e-9 + jnp.cos(acc * 0.1) * 1e-9
                acc = acc + jnp.exp(jnp.log(jnp.abs(acc) + 1.0) / 3.0) * 1e-9
            sd = sd + jnp.uint32(1)
            return acc, sd

        def sample(s, carry):
            acc, sd = carry
            acc, sd = jax.lax.fori_loop(0, dyn_depth, body, (acc, sd))
            return acc, sd + jnp.uint32(7)

        acc, _ = jax.lax.fori_loop(
            0, dyn_spp, sample, (zero, jnp.zeros((8, 128), jnp.uint32)))
        out_ref[:, :] = acc
    return kernel

spp, depth, nsph = 20, 12, 4
grid = (25, 4)   # 100 tiles, like config2
sc = np.ones((2, 128), np.float32)
sc[1, 0], sc[1, 1], sc[1, 2] = spp, depth, nsph
sc = jnp.asarray(sc)
f = pl.pallas_call(
    make_kernel(spp, depth, nsph),
    grid=grid,
    out_shape=jax.ShapeDtypeStruct((200, 512), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM),
)
out = jax.jit(f)(sc); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(10): out = jax.jit(f)(sc)
jax.block_until_ready(out)
print(f'{MODE}: {(time.perf_counter()-t0)/10*1e3:.2f} ms', flush=True)
