"""Round-4: block-shape re-sweep AFTER the fixed-octant default.

The auto block pick (64/mt5 at config 4) was tuned before the octant
change removed 4 cross-lane reduces per step; cheaper steps could shift
the grouping-vs-frustum tradeoff.  One pass over block_w at the 100-spp
headline workload.
"""
import sys, time

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp

import raytpu
from raytpu.bvh import build_bvh
from raytpu.config import RenderConfig
from raytpu.kernels import megakernel as mk

scene = raytpu.final_world()
b = build_bvh(scene)
cfg = RenderConfig(width=800, height=400, spp=100, depth=12,
                   rng_mode="parallel")
rays = cfg.width * cfg.height * cfg.spp


def cam_i(eps):
    c = raytpu.make_camera((13., 2., 3.), (0., 0., 0.), vfov=20.,
                           aspect=cfg.aspect)
    return c._replace(lower_left=c.lower_left.at[0].add(eps * 1e-6))


auto = mk._auto_block_w(cfg, scene.count)
for bw in (32, 64, 128):
    f = jax.jit(lambda s, eps, bw=bw: jnp.sum(mk.render_pallas(
        s, cam_i(eps), cfg, bvh=b, block_w=bw)))
    try:
        float(f(scene, jnp.float32(997.0)))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            float(f(scene, jnp.float32(i)))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        mt = mk._mt_for(cfg.height, bw, cfg, scene.count)
        tag = " <- auto" if bw == auto else ""
        print(f"block_w={bw:3d} mt={mt:2d}: {t*1e3:7.1f} ms "
              f"{rays/t/1e6:5.1f} Mrays/s{tag}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"block_w={bw}: FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)
