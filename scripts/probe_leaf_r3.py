"""Round-3 leaf-size re-sweep under the block64 + multi-tile-5 refill
regime (the round-2 leaf-64 optimum was swept at block32/no-grouping),
plus a census at the production layout for the BENCH roofline row.

Run: python -m scripts.probe_leaf_r3   (background it)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import raytpu
from raytpu.config import RenderConfig
from raytpu.bvh import build_bvh
from raytpu.kernels import megakernel as mk
from raytpu.render import render


def _cam(i, aspect):
    return raytpu.make_camera((13.0 + i * 1e-4, 2.0, 3.0),
                              (0.0, 0.0, 0.0), vfov=20.0, aspect=aspect)


def main():
    print("platform", jax.devices()[0].platform, flush=True)
    cfg = RenderConfig(width=800, height=400, spp=20, depth=12,
                       rng_mode="parallel")
    scene = raytpu.final_world()
    rays = cfg.width * cfg.height * cfg.spp
    best = (None, 1e9)
    for leaf in (16, 32, 48, 64, 96, 128):
        bvh = build_bvh(scene, leaf_size=leaf)
        if bvh.flat is None or bvh.n_leaves > mk._FLAT_MAX_LEAVES:
            print(f"leaf {leaf}: skipped (no flat traversal)",
                  flush=True)
            continue

        f = jax.jit(lambda s, c, b=bvh: jnp.sum(render(
            s, c, cfg, backend="pallas", bvh=b)))
        float(f(scene, _cam(997, cfg.aspect)))
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            float(f(scene, _cam(i, cfg.aspect)))
            ts.append(time.perf_counter() - t0)
        t = sorted(ts)[len(ts) // 2]
        print(f"leaf {leaf} (L={bvh.n_leaves}): {t*1e3:.1f} ms "
              f"({rays/t/1e6:.1f} Mrays/s)", flush=True)
        if t < best[1]:
            best = (leaf, t)
    print("best:", best, flush=True)

    # census at the production layout (auto block)
    leaf = best[0] or 64
    bvh = build_bvh(scene, leaf_size=leaf)
    bw = mk._auto_block_w(cfg, scene.count)
    from raytpu.bvh import outlier_tail
    outl = outlier_tail(bvh.perm, bvh.flat, bvh.leaf_size)
    n_out = 0 if outl is None else outl[1]

    @jax.jit
    def census(s, c):
        img, cnt = mk._render_pallas_fwd_impl(
            s, c, cfg, False, bvh.nodes, bvh.perm, block_w=bw,
            leaf_size=bvh.leaf_size, flat=bvh.flat, count_leaves=True)
        return jnp.sum(img), cnt

    _, cnt = census(scene, _cam(0, cfg.aspect))
    cnt = np.asarray(jax.device_get(cnt))[0]
    leaves, steps, live = float(cnt[0]), float(cnt[1]), float(cnt[2])
    t = best[1]
    tests = (leaves * leaf + steps * n_out) * 1024
    print(f"census(block{bw}, leaf{leaf}): leaves={leaves:.3e} "
          f"steps={steps:.3e} live={100*live/steps/1024:.1f}% "
          f"leaves/step={leaves/steps:.2f}/{bvh.n_leaves} "
          f"tests/s={tests/t/1e9:.1f}G "
          f"overcount_vs_1leaf={tests/(live*(leaf+n_out)):.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
