"""Round-4 leaf-size re-sweep at the BASELINE 100-spp workload.

probe_scalar_bound.py measured the sweep math running at 120 Gtests/s
straight-line but only ~70 (device-corrected) in-frame: ~40% of step
time is traversal machinery (per-leaf cond + cross-lane anyhit reduce
+ bbox + loop control), not test math.  Bigger leaves trade more tests
(union overcount grows) for fewer conds and longer straight-line runs;
leaf 512 (single leaf = brute-force unrolled, no walk at all) bounds
the no-machinery limit.  The round-3 sweep (probe_leaf_r3) ran at
20 spp where 128 tied 64 — this decides at the headline workload.

Run on real TPU:  python scripts/probe_leaf_r4.py
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
cfg = RenderConfig(width=800, height=400, spp=100, depth=12,
                   rng_mode="parallel")
rays = cfg.width * cfg.height * cfg.spp


def cam_i(eps):
    c = raytpu.make_camera((13., 2., 3.), (0., 0., 0.), vfov=20.,
                           aspect=cfg.aspect)
    return c._replace(lower_left=c.lower_left.at[0].add(eps * 1e-6))


for leaf in (64, 128, 256, 512):
    try:
        b = bvh_mod.build_bvh(scene, leaf_size=leaf)

        @jax.jit
        def f(s, eps, b=b):
            return jnp.sum(render(s, cam_i(eps), cfg,
                                  backend="pallas", bvh=b))

        float(f(scene, jnp.float32(997.0)))
        ts = []
        for i in range(2):
            t0 = time.perf_counter()
            float(f(scene, jnp.float32(i)))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"leaf {leaf:3d} (L={b.n_leaves}, out={b.n_outliers}): "
              f"{t*1e3:7.1f} ms  {rays/t/1e6:5.1f} Mrays/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"leaf {leaf}: FAILED {type(e).__name__}: {str(e)[:100]}",
              flush=True)
