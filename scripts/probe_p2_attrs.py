"""Round-4 VERDICT item 7: backward residual-layout probe.

Times the config-4 fused fwd+bwd with the refill PASS 2's residual
layout selected by RAYTPU_P2_ATTRS (read at gradkernel import):

  0 (default): 14 planes/step; reverse re-gathers winner attrs via the
               one-hot MXU matmul (8 one-hot builds + matmuls / step)
  1 (probe):   23 planes/step (9 winner-attr planes stored); reverse
               reads them back; windows shrink ~0.6x

Run BOTH in fresh processes on real TPU:
  RAYTPU_P2_ATTRS=0 python scripts/probe_p2_attrs.py
  RAYTPU_P2_ATTRS=1 python scripts/probe_p2_attrs.py
"""
import sys, os, time

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp

import raytpu
from raytpu import bvh as bvh_mod
from raytpu.config import RenderConfig
from raytpu.render import render

scene = raytpu.final_world()
b = bvh_mod.build_bvh(scene)

for spp in (20, 100):
    cfg = RenderConfig(width=800, height=400, spp=spp, depth=12,
                       rng_mode="parallel")
    rays = cfg.width * cfg.height * cfg.spp
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    def cam_i(eps):
        c = raytpu.make_camera((13., 2., 3.), (0., 0., 0.), vfov=20.,
                               aspect=cfg.aspect)
        return c._replace(lower_left=c.lower_left.at[0].add(eps * 1e-6))

    @jax.jit
    def fb(s, eps, cfg=cfg, target=target):
        def loss_fn(s, c):
            img = render(s, c, cfg, backend="pallas", bvh=b)
            return jnp.mean((img - target) ** 2)
        g = jax.grad(loss_fn, argnums=(0, 1), allow_int=True)(
            s, cam_i(eps))
        return (jnp.sum(g[0].center) + jnp.sum(g[0].albedo)
                + jnp.sum(g[1].origin))

    float(fb(scene, jnp.float32(997.0)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(fb(scene, jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    from raytpu.kernels import gradkernel as gk
    print(f"P2_ATTRS={int(gk._P2_ATTRS)} planes={gk._NWREFILL} "
          f"config4@{spp}spp fwd+bwd: {t*1e3:7.1f} ms  "
          f"{rays/t/1e6:5.1f} Mrays/s", flush=True)
