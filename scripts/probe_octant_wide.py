"""Round-4: fixed-octant validation at the OTHER headline workloads.

probe_fixed_octant.py measured the win at config-4 @ 100 spp (+3.3%,
culling unchanged).  The fixed pick loses per-step adaptivity on
BOUNCED steps, and depth-50 frames (REFERENCE_V2) are mostly bounced
steps — so before the default flip ships, measure:

  - REFERENCE_V2 (1024x576, 60 spp, depth 50, ~328 spheres)
  - config-5 (1920x1080, 20 spp here for time, depth 12, 500 spheres)

Run each mode in a fresh process (env read at import):
  RAYTPU_FIXED_OCTANT=0 python scripts/probe_octant_wide.py
  RAYTPU_FIXED_OCTANT=1 python scripts/probe_octant_wide.py
"""
import sys, time

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp

import raytpu
from raytpu.bvh import build_bvh
from raytpu.config import REFERENCE_V2, RenderConfig
from raytpu.render import render
from raytpu.kernels import megakernel as mk


def timed(label, scene, cfg, b):
    rays = cfg.width * cfg.height * cfg.spp

    def cam_i(eps):
        c = raytpu.make_camera((13., 2., 3.), (0., 0., 0.), vfov=20.,
                               aspect=cfg.aspect)
        return c._replace(lower_left=c.lower_left.at[0].add(eps * 1e-6))

    f = jax.jit(lambda s, eps: jnp.sum(render(s, cam_i(eps), cfg,
                                              backend="pallas", bvh=b)))
    float(f(scene, jnp.float32(997.0)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(f(scene, jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"FIXED_OCTANT={int(mk._FIXED_OCTANT)} {label}: "
          f"{t*1e3:8.1f} ms  {rays/t/1e6:5.1f} Mrays/s", flush=True)


sc2 = raytpu.random_world()
timed("refv2 1024x576@60spp d50", sc2, REFERENCE_V2, build_bvh(sc2))

sc5 = raytpu.final_world()
cfg5 = RenderConfig(width=1920, height=1080, spp=20, depth=12,
                    rng_mode="parallel")
timed("config5 1920x1080@20spp", sc5, cfg5, build_bvh(sc5))
