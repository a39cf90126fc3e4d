"""Wavefront settle, part 2: the large spp_batch folds that divide 100
(10/20/50) at config-4 @ 100 spp — the exact hypothesis configuration
(wavefront.py:36-44: bigger folds -> bigger sort groups -> per-ray-like
culling).  Part 1 (probe_wavefront_settle.py) measured batch 4 LOSING
to batch 1 (15.6 vs 18.6 Mrays/s vs megakernel 61.4).

Run on real TPU:  python scripts/probe_wf_settle2.py
"""
import sys, time

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp

import raytpu
from raytpu import bvh as bvh_mod
from raytpu.config import RenderConfig
from raytpu.wavefront import render_wavefront

scene = raytpu.final_world()
b = bvh_mod.build_bvh(scene)
cfg = RenderConfig(width=800, height=400, spp=100, depth=12,
                   rng_mode="parallel")
rays = cfg.width * cfg.height * cfg.spp


def cam_i(eps):
    c = raytpu.make_camera((13., 2., 3.), (0., 0., 0.), vfov=20.,
                           aspect=cfg.aspect)
    return c._replace(lower_left=c.lower_left.at[0].add(eps * 1e-6))


for B in (10, 20, 50):
    @jax.jit
    def wf(s, eps, B=B):
        return jnp.sum(render_wavefront(s, cam_i(eps), cfg,
                                        bvh=b, spp_batch=B, refill=2))
    try:
        float(wf(scene, jnp.float32(997.0)))
        ts = []
        for i in range(2):
            t0 = time.perf_counter()
            float(wf(scene, jnp.float32(i)))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"config4@100spp wavefront spp_batch={B:3d}: "
              f"{t*1e3:8.1f} ms  {rays/t/1e6:6.1f} Mrays/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"spp_batch={B}: FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)
