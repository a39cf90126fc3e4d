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

MEASURED (2026-08-19, v5e).  Both attempted VPU-peak microbenches are
UNRELIABLE (0.24-0.5 Tops/s implied, yet the real frame sustains
~1.4e12 lane-ops/s on the 24-op model — the synthetic loops bottleneck
somewhere the real kernel does not; do not trust them as denominators).
The model-free numbers that matter, at the round-2 layout (block 32,
mt 1, leaf 64):
    census: 4.12/8 leaves entered per step, 45.8% live lanes,
    53 G sphere-tests/s achieved.
At the round-3 production layout (block 64 / mt 5; leaf sweep re-done
in probe_leaf_r3.py — 64 stays optimal, 128 ties within noise):
    census: 3.2/4 leaves entered, 68.1% live lanes, 70.5 G tests/s,
    4.7x tests vs the 1-leaf-per-live-lane ideal.
    70.5 G lane-tests/s x 24 vops / 1024 lanes = 1.65e9 (8,128)-vector
    -ops/s = 1.76 vops/cycle at 940 MHz — between 44% (4-ALU VPU) and
    88% (2-ALU) issue efficiency on the sweep alone.
Lever ranking this implies: (1) dead lanes are now 32% (was 54%) —
structural per-pixel path-length imbalance, would need cross-lane work
stealing; (2) leaf-union overcount 4.7x — tile-coherent traversal's
price, finer leaves measured slower (probe_leaf_r3); (3) issue
efficiency at most ~2x and likely near-saturated.  No single remaining
lever is >2x; the big occupancy lever (multi-tile grouping) is shipped.
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
    """Measured f32 VPU throughput (ops/s; FMA = 1 op): 16 independent
    register-resident (8, 128)-vreg FMA chains, 16x unrolled.  (A first
    attempt used (64, 128) chains — 256 KB working set — and measured
    VMEM bandwidth, not the VPU: 0.244 Tops/s.)"""
    chains, unroll, iters = 16, 16, 65536

    def kernel(x_ref, o_ref):
        xs = [x_ref[:, :] + 1e-8 * i for i in range(chains)]
        a = x_ref[:, :] * 0.0 + 1.0000001
        b = x_ref[:, :] * 0.0 + 1e-7

        def body(_, xs):
            for _ in range(unroll):
                xs = [x * a + b for x in xs]
            return xs

        xs = jax.lax.fori_loop(0, iters, body, list(xs))
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[:, :] = acc

    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: jnp.sum(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
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
    ops = 8 * 128 * chains * unroll * iters
    return ops / t, t


def sweep_peak_tests(k_pairs: int, leaf: int = 64, iters: int = 2048):
    """Speed-of-light of the sweep itself: the exact sphere_body_ti
    math, straight-line leaf-unrolled, all lanes live, zero traversal
    (no bbox, no cond, no respawn) — achieved sphere tests/s, with
    ``k_pairs`` independent (t, idx) accumulator pairs (the serial
    select chain is 2 ops/test at k=1; k>1 splits it)."""
    t_min = np.float32(1e-3)

    def kernel(sc_ref, o_ref):
        shape = (8, 128)
        ox = jax.lax.broadcasted_iota(
            jnp.int32, shape, 0).astype(jnp.float32) * 0.01
        oy = jax.lax.broadcasted_iota(
            jnp.int32, shape, 1).astype(jnp.float32) * 0.01
        oz = ox * 0.0 + 1.0
        dx, dy, dz = ox * 0.0 + 0.3, oy * 0.0 + 0.2, oz * 0.0 - 1.0
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        neg_inv_a = -inv_a

        def test(j, tb, idxf):
            s_cx = sc_ref[0, j]
            s_cy = sc_ref[1, j]
            s_cz = sc_ref[2, j]
            s_rad = sc_ref[3, j]
            ocx = ox - s_cx
            ocy = oy - s_cy
            ocz = oz - s_cz
            half_b = ocx * dx + ocy * dy + ocz * dz
            c = (ocx * ocx + ocy * ocy + ocz * ocz) - s_rad * s_rad
            disc = half_b * half_b - a * c
            sqrtd = jnp.sqrt(disc)
            root1 = (half_b + sqrtd) * neg_inv_a
            root2 = (sqrtd - half_b) * inv_a
            near_ok = root1 >= t_min
            root = jnp.where(near_ok, root1, root2)
            win = (root >= t_min) & (root < tb)
            return (jnp.where(win, root, tb),
                    jnp.where(win, j.astype(jnp.float32), idxf))

        def body(it, pairs):
            out = list(pairs)
            for kk in range(leaf):
                p = kk % k_pairs
                tb, idxf = out[2 * p], out[2 * p + 1]
                # rotate the scalar row so loads don't constant-fold
                out[2 * p], out[2 * p + 1] = test(
                    (it + kk) % leaf, tb, idxf)
            return tuple(out)

        zero = ox * 0.0
        pairs = ()
        for _ in range(k_pairs):
            pairs += (zero + 3e38, zero - 1.0)
        pairs = jax.lax.fori_loop(0, iters, body, pairs)
        tb, idxf = pairs[0], pairs[1]
        for p in range(1, k_pairs):
            tb2, id2 = pairs[2 * p], pairs[2 * p + 1]
            take = (tb2 < tb) | ((tb2 == tb) & (id2 < idxf))
            tb = jnp.where(take, tb2, tb)
            idxf = jnp.where(take, id2, idxf)
        o_ref[:, :] = tb + idxf

    sc = np.random.RandomState(0).uniform(
        -5, 5, (9, leaf)).astype(np.float32)
    sc[3] = np.abs(sc[3]) * 0.1 + 0.05
    f = jax.jit(lambda sc: jnp.sum(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(sc)))
    sc = jnp.asarray(sc)
    float(f(sc))
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(f(sc + i * 1e-6))
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[2]
    return leaf * iters * 1024 / t, t


def main():
    print("platform", jax.devices()[0].platform, flush=True)
    peak, t_micro = vpu_peak_ops()
    print(f"vpu_peak: {peak/1e12:.3f} Tops/s (f32 FMA=1op, "
          f"micro {t_micro*1e3:.1f} ms)", flush=True)
    for k in (1, 2, 4):
        tests_s, t_s = sweep_peak_tests(k)
        print(f"sweep_peak k={k}: {tests_s/1e9:.2f} Gtests/s "
              f"(micro {t_s*1e3:.1f} ms)", flush=True)

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
    # the honest denominator: the sweep's own measured speed-of-light
    # (same math, no traversal) — model-free on both sides
    soL, _ = sweep_peak_tests(1)
    ach = sphere_tests / t_frame
    print(f"achieved sphere tests/s: {ach/1e9:.2f}G = "
          f"{100*ach/soL:.1f}% of the k=1 sweep speed-of-light "
          f"({soL/1e9:.2f}G)", flush=True)
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
