"""Trimmed TPU sweep of the persistent-refill wavefront (round-2 tail).

Focus: does the refill wavefront (in-kernel respawn + chunked sort
every k bounces) beat the refill MEGAKERNEL's 36 Mrays/s on config 4
and 32 Mrays/s on REFERENCE_V2?  Full combo grid lives in
probe_chunk_wavefront.py; this is the compile-budget-conscious subset.

Run on real TPU: python scripts/probe_refill_wavefront_r2.py

MEASURED (TPU v5e, this round): NO — the refill wavefront loses to the
refill megakernel at every sort cadence, and monotonically approaches
the megakernel (= no sorting) as k grows:

    c4 MEGAKERNEL leaf64:            178.8 ms  35.8 Mrays/s
    c4 REFILL k=2 chunk=64k spp_b=2: 399.9 ms  16.0 Mrays/s
    c4 REFILL k=3 chunk=64k spp_b=2: 314.1 ms  20.4 Mrays/s
    c4 REFILL k=6 chunk=64k spp_b=2: 224.5 ms  28.5 Mrays/s
    c4 REFILL k=2 chunk=64k spp_b=4: 478.0 ms  13.4 Mrays/s
    v2 REFILL k=3 chunk=64k spp_b=1: 4546  ms   7.8 Mrays/s
    v2 REFILL k=6 chunk=64k spp_b=1: 2524  ms  14.0 Mrays/s

Interpretation: once in-kernel respawn keeps occupancy at ~100%, the
leaf-coherence a sort buys is worth less than the sort + kernel
-boundary traffic costs (16 ride planes spilled to HBM per boundary).
The refill MEGAKERNEL remains the best large-scene engine.
"""
import sys, time

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp

import raytpu
from raytpu import bvh as bvh_mod
from raytpu.config import RenderConfig, REFERENCE_V2
from raytpu.wavefront import render_wavefront
from raytpu.render import render

cfg4 = RenderConfig(width=800, height=400, spp=20, depth=12,
                    rng_mode="parallel")
scene4 = raytpu.final_world()
bvh4 = bvh_mod.build_bvh(scene4, leaf_size=32)
bvh4_mk = bvh_mod.build_bvh(scene4, leaf_size=64)


def cam_i(eps, aspect):
    c = raytpu.make_camera((13., 2., 3.), (0., 0., 0.), vfov=20.,
                           aspect=aspect)
    return c._replace(lower_left=c.lower_left.at[0].add(eps * 1e-6))


def timeit(scene, fn, iters=3):
    float(fn(scene, jnp.float32(997.0)))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(scene, jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def sweep_refill(label, scene, bvh, cfg, combos):
    rays = cfg.width * cfg.height * cfg.spp
    for rf, chunk, sb in combos:
        @jax.jit
        def f(s, eps, rf=rf, chunk=chunk, sb=sb):
            return jnp.sum(render_wavefront(
                s, cam_i(eps, cfg.aspect), cfg, bvh=bvh, spp_batch=sb,
                refill=rf, sort_chunk=chunk))

        t = timeit(scene, f)
        print(f"{label} REFILL k={rf} chunk={chunk//1024}k spp_b={sb}: "
              f"{t*1e3:7.1f} ms {rays/t/1e6:5.1f} Mrays/s", flush=True)


print("== config 4 refill MEGAKERNEL (round-2 shipped ref point) ==",
      flush=True)
rays4 = cfg4.width * cfg4.height * cfg4.spp


@jax.jit
def mk4(s, eps):
    return jnp.sum(render(s, cam_i(eps, cfg4.aspect), cfg4,
                          backend="pallas", bvh=bvh4_mk))


t = timeit(scene4, mk4)
print(f"c4 MEGAKERNEL leaf64: {t*1e3:7.1f} ms {rays4/t/1e6:5.1f} Mrays/s",
      flush=True)

print("== config 4 persistent-refill wavefront ==", flush=True)
sweep_refill("c4", scene4, bvh4, cfg4, [
    (2, 65536, 2),
    (3, 65536, 2),
    (6, 65536, 2),
    (2, 65536, 4),
])

print("== REFERENCE_V2 (1024x576 60spp depth50) ==", flush=True)
cfgv2 = REFERENCE_V2.replace(rng_mode="parallel")
scene2 = raytpu.random_world()
bvh2 = bvh_mod.build_bvh(scene2, leaf_size=32)
sweep_refill("v2", scene2, bvh2, cfgv2, [
    (3, 65536, 1),
    (6, 65536, 1),
])
