"""Spike: does jax.vjp-generated code lower inside a Mosaic kernel?"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kernel(x_ref, ct_ref, out_ref, gx_ref):
    x = x_ref[:]
    ct = ct_ref[:]

    def f(x):
        y = jnp.sin(x) * jax.lax.rsqrt(jnp.maximum(x * x + 1.0, 1e-20))
        z = jnp.where(x > 0, y * y, y + 2.0)
        return z

    y, vjp = jax.vjp(f, x)
    (gx,) = vjp(ct)
    out_ref[:] = y
    gx_ref[:] = gx

x = jnp.linspace(-2, 2, 8*128, dtype=jnp.float32).reshape(8, 128)
ct = jnp.ones((8, 128), jnp.float32)
out_s = jax.ShapeDtypeStruct((8, 128), jnp.float32)
f = jax.jit(pl.pallas_call(
    kernel,
    out_shape=(out_s, out_s),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
))
y, gx = f(x, ct)
# check against plain jax
def fref(x):
    y = jnp.sin(x) * jax.lax.rsqrt(jnp.maximum(x * x + 1.0, 1e-20))
    return jnp.where(x > 0, y * y, y + 2.0)
yr, vjp = jax.vjp(fref, x)
(gr,) = vjp(ct)
print("y ok:", np.allclose(np.asarray(y), np.asarray(yr), atol=1e-6))
print("gx ok:", np.allclose(np.asarray(gx), np.asarray(gr), atol=1e-6))
