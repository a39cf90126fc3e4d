"""How big is the refill megakernel's path-length tail on config 4?

The refill kernel exits a tile when EVERY lane exhausts its spp
samples, so the tile pays for its slowest lane (sum of that lane's
sample path lengths).  The tail's relative cost shrinks ~1/sqrt(spp)
as more samples average it out — so rays/s at spp=100 vs spp=20 bounds
what a multi-tile persistent kernel (refill across M tiles per kernel
instance, amortizing the tail M-fold at constant spp) could recover.

Run on real TPU: python scripts/probe_tail.py
"""
import sys, time

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp

import raytpu
from raytpu import bvh as bvh_mod
from raytpu.config import RenderConfig
from raytpu.render import render

scene = raytpu.final_world()
b = bvh_mod.build_bvh(scene, leaf_size=64)


def cam_i(eps, aspect):
    c = raytpu.make_camera((13., 2., 3.), (0., 0., 0.), vfov=20.,
                           aspect=aspect)
    return c._replace(lower_left=c.lower_left.at[0].add(eps * 1e-6))


def timeit(fn, iters=3):
    float(fn(scene, jnp.float32(997.0)))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(scene, jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


for spp in (5, 20, 100):
    cfg = RenderConfig(width=800, height=400, spp=spp, depth=12,
                       rng_mode="parallel")

    @jax.jit
    def f(s, eps, cfg=cfg):
        return jnp.sum(render(s, cam_i(eps, cfg.aspect), cfg,
                              backend="pallas", bvh=b))

    t = timeit(f)
    rays = cfg.width * cfg.height * spp
    print(f"c4 refill-mk spp={spp:4d}: {t*1e3:7.1f} ms "
          f"{rays/t/1e6:5.1f} Mrays/s", flush=True)
