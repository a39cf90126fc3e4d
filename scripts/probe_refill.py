"""Round-2 persistent-refill megakernel sweeps on real TPU (config 4).

Measured 2026-08-17/18 (one v5e over the axon tunnel):
    sequential sample loop, leaf32 flat      430 ms   14.9 Mrays/s
    refill, leaf32 flat                      213 ms   30.0
    refill, leaf64 flat                      178-194  33-36   <- optimum
    refill, leaf96                           237      27.0
    refill, leaf128                          196      32.7
    refill + RAYTPU_STRIDE (block_w=128)     426      15.0  (negative:
        strided lanes lose primary frustum coherence)
Ablation (RAYTPU_ABLATE, refill leaf32): nohit 28.5 ms -> the sphere
/leaf sweep is ~87% of the frame.
Occupancy facts that motivated refill (CPU sim, config 4 depth 12):
ray-alive falls 100/82/32/16/8.6/5.3/3.2/... % per bounce while the
fraction of 1024-lane tiles with >= 1 live lane stays >= 90% — the
per-sample whole-tile early exit recovers almost nothing (4.4x
tile-work/ray-work).
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


def timeit(f, iters=3):
    float(f(scene, jnp.float32(997.0)))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(f(scene, jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


for ls in (32, 64, 128):
    b = bvh_mod.build_bvh(scene, leaf_size=ls)

    @jax.jit
    def f(s, eps, b=b):
        return jnp.sum(render_pallas(s, cam_i(eps), cfg, bvh=b))

    t = timeit(f)
    print(f"refill leaf={ls}: {t*1e3:.1f} ms  {rays/t/1e6:.1f} Mrays/s",
          flush=True)
