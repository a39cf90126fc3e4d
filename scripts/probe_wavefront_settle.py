"""Round-4 VERDICT item 2: settle the sorted wavefront — win somewhere
or demote it.

The wavefront's stated hypothesis (wavefront.py:36-44): spp_batch
folding grows sort groups until each kernel tile is a single
position/direction cluster, so the tile-coherent BVH walk culls like a
per-ray walk.  Round 3 only ever measured spp_batch 2 at 20 spp; this
probe runs the configs the hypothesis targets:

- config-4 @ 100 spp (the BASELINE.json workload): spp_batch 1/4/8/16
- config-5 (1920x1080) @ 20 spp (memory-bounded spp_batch), vs megakernel
- megakernel reference timing on identical frames

Run on real TPU:  python scripts/probe_wavefront_settle.py
"""
import sys, time

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp

import raytpu
from raytpu import bvh as bvh_mod
from raytpu.config import RenderConfig
from raytpu.render import render
from raytpu.wavefront import render_wavefront

scene = raytpu.final_world()
b = bvh_mod.build_bvh(scene)


def cam_i(eps, aspect):
    c = raytpu.make_camera((13., 2., 3.), (0., 0., 0.), vfov=20.,
                           aspect=aspect)
    return c._replace(lower_left=c.lower_left.at[0].add(eps * 1e-6))


def timeit(label, fn, rays, aspect, iters=3):
    try:
        float(fn(scene, jnp.float32(997.0)))
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            float(fn(scene, jnp.float32(i)))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"{label:44s}: {t*1e3:8.1f} ms  {rays/t/1e6:6.1f} Mrays/s",
              flush=True)
    except Exception as e:  # noqa: BLE001 — probe must survive OOM etc.
        print(f"{label:44s}: FAILED {type(e).__name__}: {str(e)[:80]}",
              flush=True)


# -- config-4 @ 100 spp, parallel RNG (the hypothesis's home turf)
cfg4 = RenderConfig(width=800, height=400, spp=100, depth=12,
                    rng_mode="parallel")
rays4 = cfg4.width * cfg4.height * cfg4.spp

@jax.jit
def mk4(s, eps):
    return jnp.sum(render(s, cam_i(eps, cfg4.aspect), cfg4,
                          backend="pallas", bvh=b))

timeit("config4@100spp megakernel", mk4, rays4, cfg4.aspect, iters=2)

for B in (1, 4, 8, 16):
    @jax.jit
    def wf4(s, eps, B=B):
        return jnp.sum(render_wavefront(s, cam_i(eps, cfg4.aspect), cfg4,
                                        bvh=b, spp_batch=B, refill=2))
    timeit(f"config4@100spp wavefront spp_batch={B}", wf4, rays4,
           cfg4.aspect, iters=2)

# -- config-5 geometry @ 20 spp (500 spp in one dispatch would OOM the
# wavefront's R = B*W*H ray arrays; 20 spp keeps both engines honest on
# the big frame)
cfg5 = RenderConfig(width=1920, height=1080, spp=20, depth=12,
                    rng_mode="parallel")
rays5 = cfg5.width * cfg5.height * cfg5.spp

@jax.jit
def mk5(s, eps):
    return jnp.sum(render(s, cam_i(eps, cfg5.aspect), cfg5,
                          backend="pallas", bvh=b))

timeit("config5@20spp megakernel", mk5, rays5, cfg5.aspect, iters=2)

for B in (1, 4):
    @jax.jit
    def wf5(s, eps, B=B):
        return jnp.sum(render_wavefront(s, cam_i(eps, cfg5.aspect), cfg5,
                                        bvh=b, spp_batch=B, refill=2))
    timeit(f"config5@20spp wavefront spp_batch={B}", wf5, rays5,
           cfg5.aspect, iters=2)
