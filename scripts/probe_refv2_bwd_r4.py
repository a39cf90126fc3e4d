"""Round-4: refv2 (depth-50) fused fwd+bwd at the grouped block-64 pick.

The auto block pick change (probe_blockw_r4.py) moved refv2's layout
from 32/mt18 to 64 — forward measured +11.7%; this times the fused VJP
(windowed refill PASS 2 at depth 50) at the same new layout.
"""
import sys, time

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp

import raytpu
from raytpu import bvh as bvh_mod
from raytpu.config import REFERENCE_V2
from raytpu.render import render

scene = raytpu.random_world()
b = bvh_mod.build_bvh(scene)
cfg = REFERENCE_V2.replace(rng_mode="parallel")
rays = cfg.width * cfg.height * cfg.spp
target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)


def cam_i(eps):
    c = raytpu.make_camera((13., 2., 3.), (0., 0., 0.), vfov=20.,
                           aspect=cfg.aspect)
    return c._replace(lower_left=c.lower_left.at[0].add(eps * 1e-6))


@jax.jit
def fb(s, eps):
    def loss_fn(s, c):
        img = render(s, c, cfg, backend="pallas", bvh=b)
        return jnp.mean((img - target) ** 2)
    g = jax.grad(loss_fn, argnums=(0, 1), allow_int=True)(s, cam_i(eps))
    return (jnp.sum(g[0].center) + jnp.sum(g[0].albedo)
            + jnp.sum(g[1].origin))


float(fb(scene, jnp.float32(997.0)))
ts = []
for i in range(3):
    t0 = time.perf_counter()
    float(fb(scene, jnp.float32(i)))
    ts.append(time.perf_counter() - t0)
t = min(ts)
from raytpu.kernels import megakernel as mk
print(f"refv2 fwd+bwd (block {mk._auto_block_w(cfg, scene.count)}): "
      f"{t*1e3:7.1f} ms  {rays/t/1e6:5.1f} Mrays/s", flush=True)
