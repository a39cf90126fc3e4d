"""Round-5: periodic BVH rebuild inside long optimizations (VERDICT
item 5).

``refit`` keeps leaf boxes CORRECT as geometry moves, but culling
quality decays as spheres stray from the build-time layout (boxes grow;
leaves overlap).  This probe drifts the 500-sphere config-4 scene's
small spheres along random directions and measures, at increasing
drift, the refit-only vs freshly-rebuilt tree:

  - leaves entered per tile step (the culling-quality census)
  - frame time (config-4 protocol: 800x400, 20 spp, depth 12, parallel)
  - host rebuild cost

The verdict picks the default rebuild cadence for optimization loops
(examples/inverse_render.py optimize(rebuild_every=...)).

VERDICT (one v5e, 2026-08-20; census = device truth, walls carry
tunnel noise): refit-only culling decays 4.62 -> 5.39 -> 7.04 -> 7.81
leaves/tile-step at drift 0/0.5/2/4; a fresh rebuild reads 4.62 ->
5.34 -> 6.77 -> 7.46 — i.e. MOST of the decay is inherent to
de-cohered geometry and a rebuild recovers only ~4.5% of tests at
large drift.  Host build costs ~26 ms (native builder).  Default:
rebuild_every=16 (amortized ~1.6 ms/step, ~1% of a config-4 step) — a
cheap floor-holder, not a cure; wired in examples/inverse_render.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp

import raytpu
from raytpu.bvh import build_bvh, refit, outlier_tail
from raytpu.config import RenderConfig
from raytpu.kernels import megakernel as mk


def main():
    cfg = RenderConfig(width=800, height=400, spp=20, depth=12,
                       rng_mode="parallel")
    scene0 = raytpu.final_world()
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                             vfov=20.0, aspect=cfg.aspect)
    bvh0 = build_bvh(scene0, leaf_size=64)
    bw = mk._auto_block_w(cfg, scene0.count)

    # small spheres wander (r <= 0.5); ground + heroes stay put — the
    # realistic inverse-rendering drift pattern
    rg = np.random.default_rng(7)
    vel = rg.normal(size=(scene0.count, 3)).astype(np.float32)
    vel /= np.linalg.norm(vel, axis=1, keepdims=True)
    vel[np.asarray(scene0.radius) > 0.5] = 0.0
    vel = jnp.asarray(vel)

    @jax.jit
    def census(scene, nodes, perm, flat):
        img, cnt = mk._render_pallas_fwd_impl(
            scene, cam, cfg, False, nodes, perm, block_w=bw,
            leaf_size=bvh0.leaf_size, flat=flat, count_leaves=True)
        return jnp.sum(img), cnt

    def measure(scene, bvh):
        t0 = time.perf_counter()
        s, cnt = census(scene, bvh.nodes, bvh.perm, bvh.flat)
        float(s)
        wall = time.perf_counter() - t0
        cnt = np.asarray(jax.device_get(cnt))[0]
        return float(cnt[0]) / float(cnt[1]), wall

    # warm up both compilations
    measure(scene0, bvh0)

    rows = []
    for drift in (0.0, 0.25, 0.5, 1.0, 2.0, 4.0):
        scene_t = scene0._replace(
            center=scene0.center + jnp.float32(drift) * vel)
        b_refit = refit(bvh0, scene_t)
        l_r, t_r = measure(scene_t, b_refit)
        t0 = time.perf_counter()
        b_new = build_bvh(scene_t, leaf_size=64)
        t_build = time.perf_counter() - t0
        l_b, t_b = measure(scene_t, b_new)
        row = {"drift": drift,
               "refit_leaves_per_step": round(l_r, 2),
               "refit_ms": round(t_r * 1e3, 1),
               "rebuild_leaves_per_step": round(l_b, 2),
               "rebuild_ms": round(t_b * 1e3, 1),
               "host_build_ms": round(t_build * 1e3, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
