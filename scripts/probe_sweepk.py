"""Config-4 forward A/B on hardware (round-3):

  a. RAYTPU_SWEEP_K in {1, 2, 4} — K-way split of the sweep's serial
     (t, idx) select chain (bit-identical winners).
  b. tile shape x multi-tile grouping: at 800x400 with the production
     block_w=32, the row-block count is 416/32 = 13 (PRIME), so the
     multi-tile refill grouping silently never engages (mt = largest
     divisor of grid0 <= 8 = 1).  Alternatives that do engage:
     block_w=64 (grid0 25, mt 5), block_w=16 (grid0 7, mt 7),
     block_w=128 strip (grid0 50, mt 5).

Run: python -m scripts.probe_sweepk   (background it)

MEASURED (2026-08-19, v5e, all checksums bit-identical):
  block32 k=1 (round-2 default) 183.4 ms  34.9 Mrays/s
  block32 k=2                   181.7 ms  35.2
  block32 k=4                   182.9 ms  35.0
  block64 k=1 (mt5)             145.0 ms  44.1   <- shipped default
  block16 k=1 (mt7)             148.2 ms  43.2
  block128 k=1 (mt5)            159.7 ms  40.1
  block64 k=4                   145.3 ms  44.0
-> (a) K-way select-chain splitting is NEUTRAL: the sweep is not
   latency-bound on the (t, idx) chain (Mosaic already overlaps the
   per-test independent work).  Kept behind RAYTPU_SWEEP_K as a probe.
   (b) the multi-tile grouping is worth ~25% and the round-2 block-32
   default silently disabled it (prime row-block count) — fixed by
   megakernel._auto_block_w.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

import raytpu
from raytpu.config import RenderConfig
from raytpu.bvh import build_bvh
from raytpu.kernels import megakernel as mk


def _cam(i, aspect):
    return raytpu.make_camera((13.0 + i * 1e-4, 2.0, 3.0),
                              (0.0, 0.0, 0.0), vfov=20.0, aspect=aspect)


def main():
    print("platform", jax.devices()[0].platform, flush=True)
    cfg = RenderConfig(width=800, height=400, spp=20, depth=12,
                       rng_mode="parallel")
    scene = raytpu.final_world()
    bvh = build_bvh(scene, leaf_size=64)
    rays = cfg.width * cfg.height * cfg.spp
    ref = None

    def run(name, block_w, k):
        nonlocal ref
        mk._SWEEP_K = k

        @jax.jit
        def f(s, c):
            return jnp.sum(mk._render_pallas_fwd_impl(
                s, c, cfg, False, bvh.nodes, bvh.perm, block_w=block_w,
                leaf_size=bvh.leaf_size, flat=bvh.flat))

        chk = float(f(scene, _cam(997, cfg.aspect)))
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            float(f(scene, _cam(i, cfg.aspect)))
            ts.append(time.perf_counter() - t0)
        t = sorted(ts)[2]
        chk0 = float(f(scene, _cam(0, cfg.aspect)))
        if ref is None:
            ref = chk0
        print(f"{name}: {t*1e3:.1f} ms ({rays/t/1e6:.1f} Mrays/s) "
              f"chk={chk0:.6e} dref={abs(chk0-ref):.2e}", flush=True)
        mk._SWEEP_K = 1

    run("block32 k=1 (today)", 32, 1)
    run("block32 k=2", 32, 2)
    run("block32 k=4", 32, 4)
    run("block64 k=1 (mt5)", 64, 1)
    run("block16 k=1 (mt7)", 16, 1)
    run("block128 k=1 (mt5)", 128, 1)
    run("block64 k=4", 64, 4)


if __name__ == "__main__":
    main()
