"""Round-2 compaction/segment sweeps on real TPU (config 4).

Measured 2026-08-17 (one v5e over the axon tunnel, TIDX flat leaf32):
    nosort (12,)            269 ms   23.8 Mrays/s
    (6,6) glue only         279 ms   (boundary glue ~1 ms; sort ~37 ms)
    (6,6) sorted            246 ms   26.0
    (3,9) sorted            219 ms   29.2   <- depth-12 optimum
    (1,2,4,5) sorted        302 ms   21.2
    every-bounce sorted     691 ms    9.3
Raw primitive costs at R=640k (probe_sortcost section):
    16-operand lax.sort     ~37 ms
    2-op sort + 14 takes    ~155 ms  (XLA gather ~11 ms/plane!)
    cumsum partition+takes  ~242 ms
Conclusion: the variadic sort IS the cheapest XLA compaction; one
boundary after bounce 3 (+12 for deep configs) is the sweet spot —
now encoded in wavefront.default_segments.
"""
import sys, time

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp

import raytpu
from raytpu import bvh as bvh_mod
from raytpu.wavefront import render_wavefront
from raytpu.config import RenderConfig

cfg = RenderConfig(width=800, height=400, spp=20, depth=12,
                   rng_mode="parallel")
scene = raytpu.final_world()
b = bvh_mod.build_bvh(scene, leaf_size=32)
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


for segs in [(cfg.depth,), (3, 9), (6, 6), (1, 2, 4, 5)]:
    @jax.jit
    def f(s, eps, segs=segs):
        return jnp.sum(render_wavefront(s, cam_i(eps), cfg, bvh=b,
                                        spp_batch=2, segments=segs))

    t = timeit(f)
    print(f"segments={segs}: {t*1e3:.1f} ms  {rays/t/1e6:.1f} Mrays/s",
          flush=True)
