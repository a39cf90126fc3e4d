"""Round-5: the >4096-sphere regime (VERDICT item 4).

The flat leaf-list traversal — the production path — caps at
``_FLAT_MAX_LEAVES`` (64) leaves per octant copy, i.e. 4096 spheres at
leaf 64; past that the engine silently switches to the skip-pointer
walk (megakernel.py:531-691), which has never been hardware-benchmarked
at production size.  This probe measures a ~10k-sphere scene through:

  walk64      leaf 64 -> 157 leaves -> skip-pointer walk (today's default)
  flat256     leaf 256 -> 40 leaves -> flat path via a bigger leaf
  flat64x160  leaf 64 + _FLAT_MAX_LEAVES raised to 160 (in-process)
  flat128     leaf 128 -> 79 leaves -> flat at cap 160

plus the 4096-sphere cliff-edge reference (flat64).  Forward, 800x400,
20 spp, depth 12, parallel RNG — the config-4 protocol at 20x scene
scale.  Device-side ms via profiling.device_ms.

VERDICT (one v5e, warm tunnel, 2026-08-20, right-sized builder):

  4k  flat64 (64 leaves)      310.9 ms   20.6 Mrays/s device
  10k walk64 (157 leaves)     496.5 ms   12.9 Mrays/s   <- DEFAULT WINS
  10k flat256 (40 leaves)     526.4 ms   12.2
  10k flat128 (79, cap 160)   563.1 ms   11.4
  10k flat64 (157, cap 160)   777.4 ms    8.2

There is NO cliff past the flat cap: the skip-pointer walk BEATS every
flat variant at 10k (the O(L) flat bbox scan loses once L >> 64), and
4k -> 10k scales sub-linearly in N.  The REAL large-scene limit was the
kernels' 1 MB SMEM scene-pack window, which the old builder's power-of
-two leaf-count inflation (256 leaves x 64 = 16385 perm entries, 39%
NaN dummies) overflowed at ~10k spheres — fixed by rounding the median
split to leaf_size multiples (ceil(n/leaf) leaves; bvh.py rec() /
rt_native.cpp).  Auto-selection needs no change.
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
from raytpu import profiling
from raytpu.bvh import build_bvh
from raytpu.config import RenderConfig
from raytpu.render import render
from raytpu.scene import make_scene, DIFFUSE, METAL, DIELECTRIC as GLASS


def big_world(n: int, seed: int = 0, extent: float = 60.0):
    """Ground + 3 heroes + (n-4) random small spheres in [-extent, extent]^2
    (final_world's recipe scaled out; density ~0.7/unit^2 at n=10k)."""
    rg = np.random.default_rng(seed)
    spheres = [
        ((0.0, -1000.0, 0.0), 1000.0, DIFFUSE, (0.5, 0.5, 0.5), 0.0),
        ((0.0, 1.0, 0.0), 1.0, GLASS, (1.0, 1.0, 1.0), 1.5),
        ((-4.0, 1.0, 0.0), 1.0, DIFFUSE, (0.4, 0.2, 0.1), 0.0),
        ((4.0, 1.0, 0.0), 1.0, METAL, (0.7, 0.6, 0.5), 0.0),
    ]
    while len(spheres) < n:
        center = (rg.uniform(-extent, extent), 0.2,
                  rg.uniform(-extent, extent))
        m = rg.random()
        if m < 0.8:
            mat, alb, mp = DIFFUSE, tuple(rg.random(3) * rg.random(3)), 0.0
        elif m < 0.95:
            mat, alb, mp = METAL, tuple(0.5 + 0.5 * rg.random(3)), \
                0.5 * rg.random()
        else:
            mat, alb, mp = GLASS, (1.0, 1.0, 1.0), 1.5
        spheres.append((center, 0.2, mat, alb, mp))
    return make_scene(spheres[:n])


def cam_i(i, aspect):
    return raytpu.make_camera((13.0 + i * 1e-4, 2.0, 3.0),
                              (0.0, 0.0, 0.0), vfov=20.0, aspect=aspect)


def run_one(tag, scene, bvh, cfg, rays, flat_max=None):
    from raytpu.kernels import megakernel as mk
    old = mk._FLAT_MAX_LEAVES
    if flat_max is not None:
        mk._FLAT_MAX_LEAVES = flat_max
    try:
        f = jax.jit(lambda s, c: jnp.sum(
            render(s, c, cfg, backend="pallas", bvh=bvh)))
        t0 = time.time()
        float(f(scene, cam_i(997, cfg.aspect)))
        compile_s = time.time() - t0
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            float(f(scene, cam_i(i, cfg.aspect)))
            ts.append(time.perf_counter() - t0)
        wall = sorted(ts)[1]
        try:
            dms = profiling.device_ms(
                lambda: float(f(scene, cam_i(461, cfg.aspect))))
        except Exception:  # noqa: BLE001
            dms = None
        row = {"tag": tag, "n_leaves": int(bvh.n_leaves),
               "leaf": int(bvh.leaf_size), "compile_s": round(compile_s, 1),
               "wall_ms": round(wall * 1e3, 1),
               "rays_per_sec": round(rays / wall)}
        if dms:
            row["device_ms"] = round(dms, 1)
            row["device_rays_per_sec"] = round(rays / (dms / 1e3))
        print(json.dumps(row), flush=True)
        return row
    finally:
        mk._FLAT_MAX_LEAVES = old


def main():
    cfg = RenderConfig(width=800, height=400, spp=20, depth=12,
                       rng_mode="parallel")
    rays = cfg.width * cfg.height * cfg.spp

    s10k = big_world(10_000)
    s4k = big_world(4_096)

    rows = []
    rows.append(run_one("4k_flat64", s4k, build_bvh(s4k, leaf_size=64),
                        cfg, rays))
    b64 = build_bvh(s10k, leaf_size=64)
    rows.append(run_one("10k_walk64", s10k, b64, cfg, rays))
    rows.append(run_one("10k_flat256", s10k,
                        build_bvh(s10k, leaf_size=256), cfg, rays))
    rows.append(run_one("10k_flat64x160", s10k, b64, cfg, rays,
                        flat_max=160))
    rows.append(run_one("10k_flat128", s10k,
                        build_bvh(s10k, leaf_size=128), cfg, rays,
                        flat_max=160))
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
