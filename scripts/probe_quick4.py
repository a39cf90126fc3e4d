"""Quick config-4 forward probe (refill megakernel, flat leaf64 tidx).

Round-2 op-trim session: before = 178-194 ms (33-36 Mrays/s).
"""
import sys, time

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp

import raytpu
from raytpu import bvh as bvh_mod
from raytpu.kernels.megakernel import render_pallas
from raytpu.config import RenderConfig

cfg = RenderConfig(width=800, height=400, spp=20, depth=12,
                   rng_mode="parallel")
scene = raytpu.final_world()
rays = cfg.width * cfg.height * cfg.spp


def cam_i(eps):
    c = raytpu.make_camera((13., 2., 3.), (0., 0., 0.), vfov=20.,
                           aspect=cfg.aspect)
    return c._replace(lower_left=c.lower_left.at[0].add(eps * 1e-6))


b = bvh_mod.build_bvh(scene, leaf_size=64)


@jax.jit
def f(s, eps):
    return jnp.sum(render_pallas(s, cam_i(eps), cfg, bvh=b))


float(f(scene, jnp.float32(997.0)))  # compile + warm
ts = []
for i in range(5):
    t0 = time.perf_counter()
    float(f(scene, jnp.float32(i)))
    ts.append(time.perf_counter() - t0)
t = min(ts)
print(f"config4 refill leaf64: {t*1e3:.1f} ms  {rays/t/1e6:.1f} Mrays/s"
      f"  (all: {[f'{x*1e3:.0f}' for x in ts]})")
