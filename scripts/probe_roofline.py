"""Roofline / utilization accounting for the config-4 forward (round-3
verdict item 2): every factor MEASURED on the chip.

  1. VPU peak: a Pallas microbenchmark of straight-line independent
     f32 FMA chains on (512, 128) VMEM blocks -> achieved vector
     ops/s/chip (FMA counted as ONE op, its natural VPU issue unit).
  2. Work census: the production config-4 render re-run with the
     megakernel's count_leaves instrumentation (same engine: refill +
     flat leaf-64 sweep + outliers, block_w 32, multi-tile) ->
     (entered leaves, bounce steps, live-lane steps) summed over the
     frame.
  3. Static op counts from the kernel source (FMA-fused):
     - sphere test (megakernel._flat_sweep_ti.sphere_body_ti):
       3 sub (oc) + 3 (dot fma) + 4 (c w/ rad^2) + 2 (disc) + 1 sqrt
       + 4 (roots) + 2 cmp/sel (near) + 3 (win) + 2 sel (tb, idx)
       = 24 vops/lane.
     - leaf bbox test (leaf_iter_ti): 12 (slab sub+mul) + 12 (min/max
       tree) + ~6 (cmp/and/anyhit reduce) = 30 vops/lane, paid for
       EVERY leaf row every step (the flat sweep is O(L) in bbox
       work).
     - everything else per live step (raygen amortized, scatter,
       normalize/refract, RNG, refill respawn): ~180 vops/lane
       (secondary; the sweep dominates — 87% by ablation,
       scripts/probe_refill.py).

  utilization = modeled vops / (frame_s * measured peak vops/s).

Run (background it): python -m scripts.probe_roofline
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import raytpu
from raytpu.config import RenderConfig
from raytpu.bvh import build_bvh
from raytpu.kernels import megakernel

OPS_SPHERE = 24
OPS_BBOX = 30
OPS_OTHER = 180


def vpu_peak_ops():
    """Measured f32 VPU throughput (ops/s; FMA = 1 op): 8 independent
    FMA chains, 32x unrolled, on a (512, 128) block."""
    rows, unroll, iters = 512, 32, 4096

    def kernel(x_ref, o_ref):
        xs = [x_ref[i * 64:(i + 1) * 64, :] for i in range(8)]
        a = xs[0] * 0.0 + 1.0000001
        b = xs[0] * 0.0 + 1e-7

        def body(_, xs):
            for _ in range(unroll // 8):
                xs = [x * a + b for x in xs]
            return xs

        xs = jax.lax.fori_loop(0, iters, body, xs)
        for i in range(8):
            o_ref[i * 64:(i + 1) * 64, :] = xs[i]

    x = jnp.ones((rows, 128), jnp.float32)
    f = jax.jit(lambda x: jnp.sum(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)))
    float(f(x))
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(f(x + i * 1e-6))
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[2]
    ops = rows * 128 * unroll // 8 * 8 * iters
    return ops / t, t


def main():
    print("platform", jax.devices()[0].platform, flush=True)
    peak, t_micro = vpu_peak_ops()
    print(f"vpu_peak: {peak/1e12:.3f} Tops/s (f32 FMA=1op, "
          f"micro {t_micro*1e3:.1f} ms)", flush=True)

    cfg = RenderConfig(width=800, height=400, spp=20, depth=12,
                       rng_mode="parallel")
    scene = raytpu.final_world()
    bvh = build_bvh(scene, leaf_size=64)
    n_leaves = bvh.n_leaves
    from raytpu.bvh import outlier_tail
    outl = outlier_tail(bvh.perm, bvh.flat, bvh.leaf_size)
    n_out = 0 if outl is None else outl[1]
    print(f"bvh: leaves/octant={n_leaves} leaf={bvh.leaf_size} "
          f"outliers={n_out}", flush=True)

    def cam(i):
        return raytpu.make_camera((13.0 + i * 1e-4, 2.0, 3.0),
                                  (0, 0, 0), vfov=20.0, aspect=cfg.aspect)

    # census run (block_w 32 like render's BVH default)
    @jax.jit
    def census(s, c):
        img, cnt = megakernel._render_pallas_fwd_impl(
            s, c, cfg, False, bvh.nodes, bvh.perm, block_w=32,
            leaf_size=bvh.leaf_size, flat=bvh.flat, count_leaves=True)
        return jnp.sum(img), cnt

    chk, cnt = census(scene, cam(0))
    cnt = np.asarray(jax.device_get(cnt))[0]
    leaves, steps, live = float(cnt[0]), float(cnt[1]), float(cnt[2])
    print(f"census: entered_leaves={leaves:.3e} steps={steps:.3e} "
          f"live_lane_steps={live:.3e} chk={float(chk):.4e}", flush=True)

    # production timing (identical engine, no census)
    from raytpu.render import render
    f = jax.jit(lambda s, c: jnp.sum(render(s, c, cfg, backend="pallas",
                                            bvh=bvh)))
    float(f(scene, cam(991)))
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(f(scene, cam(i)))
        ts.append(time.perf_counter() - t0)
    t_frame = sorted(ts)[2]
    rays = cfg.width * cfg.height * cfg.spp
    print(f"frame: {t_frame*1e3:.1f} ms ({rays/t_frame/1e6:.1f} Mrays/s)",
          flush=True)

    lanes = 1024.0
    sphere_tests = (leaves * bvh.leaf_size + steps * n_out) * lanes
    bbox_tests = steps * n_leaves * lanes
    v_sphere = sphere_tests * OPS_SPHERE
    v_bbox = bbox_tests * OPS_BBOX
    v_other = steps * lanes * OPS_OTHER
    v_total = v_sphere + v_bbox + v_other
    print(f"modeled vops: sphere={v_sphere:.3e} bbox={v_bbox:.3e} "
          f"other={v_other:.3e} total={v_total:.3e}", flush=True)
    util = v_total / (t_frame * peak)
    print(f"utilization: {100*util:.1f}% of measured VPU peak", flush=True)
    # occupancy/culling diagnostics
    print(f"avg live lanes/step: {live/steps/lanes*100:.1f}%  "
          f"avg entered leaves/step: {leaves/steps:.2f} of {n_leaves}",
          flush=True)
    # ideal: every live lane needs >= (its winner leaf + outliers);
    # perfect per-lane culling would test ~1 leaf worth per live lane
    ideal_tests = live * (bvh.leaf_size + n_out)
    print(f"sphere-test overcount vs 1-leaf-per-live-lane ideal: "
          f"{sphere_tests/ideal_tests:.2f}x", flush=True)


if __name__ == "__main__":
    main()
