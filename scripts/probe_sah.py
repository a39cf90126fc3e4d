"""Sweep: BVH builder (median vs binned-SAH) x leaf size on config 4.

The native SAH builder (native/rt_native.cpp rt_build_bvh_sah, 16
bins/axis) isolates outliers like the r=1000 ground sphere into their
own subtree, tightening every other leaf's bbox — the median split
instead groups the ground with ~63 normal spheres, and that leaf's
huge bbox is entered by every ray.  Never measured on hardware (the
round-2 leaf sweeps all used the median builder).

Run on real TPU: python scripts/probe_sah.py
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

cfg = RenderConfig(width=800, height=400, spp=20, depth=12,
                   rng_mode="parallel")
scene = raytpu.final_world()
rays = cfg.width * cfg.height * cfg.spp


def cam_i(eps):
    c = raytpu.make_camera((13., 2., 3.), (0., 0., 0.), vfov=20.,
                           aspect=cfg.aspect)
    return c._replace(lower_left=c.lower_left.at[0].add(eps * 1e-6))


def timeit(label, fn, iters=3):
    float(fn(scene, jnp.float32(997.0)))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(scene, jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{label:34s}: {t*1e3:7.1f} ms  {rays/t/1e6:5.1f} Mrays/s",
          flush=True)


for split in (True, False):
    for builder in ("median", "sah"):
        for leaf in (32, 64):
            b = bvh_mod.build_bvh(scene, leaf_size=leaf, builder=builder,
                                  split_outliers=split)
            tag = (f"{builder} leaf{leaf} L={b.n_leaves} "
                   f"out={b.n_outliers}")

            @jax.jit
            def f_mk(s, eps, b=b):
                return jnp.sum(render(s, cam_i(eps), cfg,
                                      backend="pallas", bvh=b))

            timeit(f"refill-mk  {tag}", f_mk)

            @jax.jit
            def f_wf(s, eps, b=b):
                return jnp.sum(render_wavefront(s, cam_i(eps), cfg,
                                                bvh=b, spp_batch=2,
                                                refill=2))

            timeit(f"refill-wf  {tag}", f_wf)
