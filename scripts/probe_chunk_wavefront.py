"""Wavefront sweeps with CHUNKED sort boundaries (config 4 + refv2).

The monolithic 16-operand lax.sort at R=640k costs ~37 ms (superlinear:
it outgrows VMEM and falls into a merge regime) — that cost is what
limited round 2 to ONE boundary after bounce 3.  Chunked sorts
(lax.sort batched over a leading chunk axis) should be near-linear;
if so, denser boundaries (even every-bounce sorting, which keeps tiles
leaf-coherent) become affordable.  Sweeps segments x sort_chunk x
spp_batch on config 4, then the best shapes on REFERENCE_V2.

Run on real TPU: python scripts/probe_chunk_wavefront.py
"""
import sys, time

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp

import raytpu
from raytpu import bvh as bvh_mod
from raytpu.config import RenderConfig, REFERENCE_V2
from raytpu.wavefront import render_wavefront

cfg4 = RenderConfig(width=800, height=400, spp=20, depth=12,
                    rng_mode="parallel")
scene4 = raytpu.final_world()
bvh4 = bvh_mod.build_bvh(scene4, leaf_size=32)


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


def sweep(label, scene, bvh, cfg, combos):
    rays = cfg.width * cfg.height * cfg.spp
    for segs, chunk, sb, s_every in combos:
        @jax.jit
        def f(s, eps, segs=segs, chunk=chunk, sb=sb, se=s_every):
            return jnp.sum(render_wavefront(
                s, cam_i(eps, cfg.aspect), cfg, bvh=bvh, spp_batch=sb,
                segments=segs, sort_chunk=chunk, sort_every=se))

        t = timeit(scene, f)
        print(f"{label} segs={segs} chunk={chunk//1024}k spp_b={sb} "
              f"s_every={s_every}: {t*1e3:7.1f} ms "
              f"{rays/t/1e6:5.1f} Mrays/s", flush=True)


def sweep_refill(label, scene, bvh, cfg, combos):
    """(refill_bounces, sort_chunk, spp_batch) combos of the
    persistent-refill wavefront."""
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


print("== config 4 (800x400 20spp depth12, 500 spheres) ==", flush=True)
sweep("c4", scene4, bvh4, cfg4, [
    # round-2 best (monolithic one-boundary) as the reference point
    ((3, 9), 0, 2, 1),
    # chunked one-boundary
    ((3, 9), 65536, 2, 1),
    ((3, 9), 32768, 2, 1),
    ((3, 9), 131072, 2, 1),
    # denser boundaries, chunked
    ((2, 2, 8), 65536, 2, 1),
    ((1, 1, 1, 9), 65536, 2, 1),
    ((1,) * 12, 65536, 2, 1),
    ((2, 2, 2, 2, 2, 2), 65536, 2, 1),
    # bigger spp folds (R grows; chunks keep sort linear)
    ((3, 9), 65536, 4, 1),
    ((1, 1, 1, 9), 65536, 4, 1),
])

print("== config 4 persistent-refill wavefront ==", flush=True)
sweep_refill("c4", scene4, bvh4, cfg4, [
    (1, 65536, 2),
    (2, 65536, 2),
    (3, 65536, 2),
    (6, 65536, 2),
    (2, 65536, 1),
    (2, 65536, 4),
    (2, 0, 2),       # monolithic sort reference point
])

print("== REFERENCE_V2 (1024x576 60spp depth50) ==", flush=True)
cfgv2 = REFERENCE_V2.replace(rng_mode="parallel")
scene2 = raytpu.random_world()
bvh2 = bvh_mod.build_bvh(scene2, leaf_size=32)
sweep("v2", scene2, bvh2, cfgv2, [
    ((3, 9, 38), 0, 1, 1),        # round-2 best
    ((3, 9, 38), 65536, 1, 1),
    ((1, 1, 1, 2, 2, 4, 8, 31), 65536, 1, 1),
    ((2, 2, 2, 2, 4, 4, 8, 26), 65536, 2, 1),
])
sweep_refill("v2", scene2, bvh2, cfgv2, [
    (2, 65536, 1),
    (3, 65536, 1),
    (3, 65536, 2),
    (6, 65536, 1),
])
