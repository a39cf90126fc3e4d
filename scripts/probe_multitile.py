"""Multi-tile persistent refill on TPU: perf + cross-kernel agreement.

mt = largest divisor of the grid's row-tile count <= RAYTPU_MULTI_TILE,
so the factor depends on tiling: config 4 at the BVH-default block_w=32
has 13 row-blocks (prime -> mt=1) but 50 strips at block_w=128 (mt=5);
REFERENCE_V2 has 18 blocks (mt=6) / 72 strips (mt=8).  Measures each
against the shipped single-tile recipe and cross-checks images.

Run on real TPU: python scripts/probe_multitile.py
"""
import sys, time

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp
import numpy as np

import raytpu
from raytpu import bvh as bvh_mod
from raytpu.config import RenderConfig, REFERENCE_V2
from raytpu.kernels import megakernel as mk

scene = raytpu.final_world()
b = bvh_mod.build_bvh(scene, leaf_size=64)


def cam_i(eps, aspect):
    c = raytpu.make_camera((13., 2., 3.), (0., 0., 0.), vfov=20.,
                           aspect=aspect)
    return c._replace(lower_left=c.lower_left.at[0].add(eps * 1e-6))


def timeit(fn, scn, iters=3):
    float(fn(scn, jnp.float32(997.0)))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(scn, jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


cfg4 = RenderConfig(width=800, height=400, spp=20, depth=12,
                    rng_mode="parallel")
rays4 = cfg4.width * cfg4.height * cfg4.spp

cfgv2 = REFERENCE_V2.replace(rng_mode="parallel")
scene2 = raytpu.random_world()
b2 = bvh_mod.build_bvh(scene2, leaf_size=64)
rays2 = cfgv2.width * cfgv2.height * cfgv2.spp

# correctness: one mt-on vs mt-off compiled frame (block_w=128, mt=5)
imgs = {}
for mt_cap, tag in ((1, "off"), (8, "on")):
    mk._MULTI_TILE = mt_cap
    jax.clear_caches()
    f = jax.jit(lambda s, e: mk.render_pallas(
        s, cam_i(e, cfg4.aspect), cfg4, bvh=b, block_w=128))
    imgs[tag] = np.asarray(jax.device_get(f(scene, jnp.float32(0.))))
d = np.abs(imgs["on"] - imgs["off"])
print(f"block128 mt5 vs mt1: maxdiff {d.max():.3g} "
      f"mismatched px {(imgs['on'] != imgs['off']).any(-1).sum()}",
      flush=True)

for label, scn, bb, cfg, rays, bw in (
        ("c4 block32 ", scene, b, cfg4, rays4, None),
        ("c4 block128", scene, b, cfg4, rays4, 128),
        ("v2 block32 ", scene2, b2, cfgv2, rays2, None),
        ("v2 block128", scene2, b2, cfgv2, rays2, 128),
):
    for mt_cap in (1, 8):
        mk._MULTI_TILE = mt_cap
        jax.clear_caches()

        @jax.jit
        def f(s, e, cfg=cfg, bb=bb, bw=bw):
            return jnp.sum(mk.render_pallas(
                s, cam_i(e, cfg.aspect), cfg, bvh=bb, block_w=bw))

        t = timeit(f, scn)
        print(f"{label} mt_cap={mt_cap}: {t*1e3:7.1f} ms "
              f"{rays/t/1e6:5.1f} Mrays/s", flush=True)
