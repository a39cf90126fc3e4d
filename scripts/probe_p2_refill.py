"""TPU timing: windowed-refill PASS 2 vs per-sample PASS 2 (round-3
verdict item 1) + the never-measured BASELINE gradient workloads
(item 3: config-4 fwd+bwd @ 100 spp, REFERENCE_V2 depth-50 backward).

Run (background it; NEVER kill an in-flight Mosaic compile):
  python -m scripts.probe_p2_refill

MEASURED (2026-08-19, v5e; config-4 = 800x400 20spp depth12 parallel):
  step 1 — windowed refill PASS 2 (this probe, strips):
    fwd 187.4 ms | fwd+bwd per-sample 507.8 ms (12.6 Mrays/s,
    bwd/fwd 1.71) -> refill 411.5 ms (15.6, bwd/fwd 1.20);
    checksums agree at 1.7e-5; 100spp 17.6 Mrays/s; REFERENCE_V2
    depth-50 backward RUNS: 15.9 Mrays/s (2.2 s/frame).
  step 2 — + block-frustum tiling in the VJP (block 32): 339.7 ms
    (18.8 Mrays/s).
  step 3 — + multi-tile grouping (auto block 64 / mt 5):
    287.7 ms (22.2 Mrays/s); 100 spp 1301.9 ms (24.6 Mrays/s);
    REFERENCE_V2 backward 1787.8 ms (19.8 Mrays/s).
  Net round-3: config-4 fwd+bwd 12.6 -> 22.2 Mrays/s (1.77x), and the
  BASELINE 100-spp gradient workload sits at 24.6.
  step 4 — residual-window sweep (RAYTPU_P2_VMEM 6/10/12 MB ->
    285.9/282.2/280.0 ms): parking costs ~2%; default raised to 10 MB.
    refv2 backward at the 10 MB window: 1674 ms (21.1 Mrays/s).
  step 5 — multi-tile group cap 8 -> 64 (+ cond-gated flush; grid
    steps are sequential on the TensorCore so bigger groups are free):
    config-4 fwd+bwd 256.3 ms (25.0 Mrays/s at 20 spp — the verdict
    target at its own protocol).
  Depth-50 hardware ACCURACY spot-check (64x32, spp 4, depth 50,
  kernel vs golden autodiff on the same chip): albedo 4.9e-5, radius
  2.8e-4, cam origin 2.8e-5; center max-rel 4.2e-3 concentrated on the
  metal hero sphere (2 of 12 components > 1e-3, rest <= 6.8e-4) — the
  50-bounce chaotic-path / branch-flip class (TODO.md), not a
  systematic reverse-sweep error.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

import raytpu
from raytpu.config import RenderConfig, REFERENCE_V2
from raytpu.render import render
from raytpu.bvh import build_bvh
from raytpu.kernels import gradkernel


def _cam(i, aspect):
    return raytpu.make_camera((13.0 + i * 1e-4, 2.0, 3.0),
                              (0.0, 0.0, 0.0), vfov=20.0, aspect=aspect)


def time_calls(fn, scene, aspect, iters=3):
    float(fn(scene, _cam(997, aspect)))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(scene, _cam(i, aspect)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def grads_direct(cfg, bvh, p2_refill):
    """render_pallas_vjp directly (bypasses custom_vjp so p2_refill is
    selectable per call)."""
    @jax.jit
    def f(s, c):
        img = render(s, c, cfg, backend="pallas", bvh=bvh)
        ct = 2.0 * (img - 0.25) / img.size
        _, ds, dc = gradkernel.render_pallas_vjp(
            s, c, cfg, ct, interpret=False, bvh=bvh, img=img,
            p2_refill=p2_refill)
        return (jnp.sum(ds.center) + jnp.sum(ds.albedo)
                + jnp.sum(dc.origin))
    return f


def main():
    print("platform", jax.devices()[0].platform, flush=True)
    scene = raytpu.final_world()
    bvh64 = build_bvh(scene, leaf_size=64)

    cfg = RenderConfig(width=800, height=400, spp=20, depth=12,
                       rng_mode="parallel")
    rays = cfg.width * cfg.height * cfg.spp

    fwd = jax.jit(lambda s, c: jnp.sum(
        render(s, c, cfg, backend="pallas", bvh=bvh64)))
    t_fwd = time_calls(fwd, scene, cfg.aspect)
    print(f"config4 fwd: {t_fwd*1e3:.1f} ms "
          f"({rays/t_fwd/1e6:.1f} Mrays/s)", flush=True)

    for refill in (False, True):
        f = grads_direct(cfg, bvh64, refill)
        t = time_calls(f, scene, cfg.aspect)
        print(f"config4 fwd+bwd refill={refill}: {t*1e3:.1f} ms "
              f"({rays/t/1e6:.1f} Mrays/s) "
              f"bwd/fwd={(t-t_fwd)/t_fwd:.2f}", flush=True)

    # numeric sanity: the two paths must agree on the checksum
    a = float(grads_direct(cfg, bvh64, False)(scene, _cam(0, cfg.aspect)))
    b = float(grads_direct(cfg, bvh64, True)(scene, _cam(0, cfg.aspect)))
    print(f"checksum per-sample={a:.6e} refill={b:.6e} "
          f"rel={abs(a-b)/max(abs(a),1e-9):.2e}", flush=True)

    # BASELINE's config-4 text: 100 spp
    cfg100 = RenderConfig(width=800, height=400, spp=100, depth=12,
                          rng_mode="parallel")
    f100 = grads_direct(cfg100, bvh64, True)
    t100 = time_calls(f100, scene, cfg.aspect, iters=2)
    r100 = cfg100.width * cfg100.height * cfg100.spp
    print(f"config4 100spp fwd+bwd refill: {t100*1e3:.1f} ms "
          f"({r100/t100/1e6:.1f} Mrays/s)", flush=True)

    # REFERENCE_V2 depth-50 backward (never ran on hardware in r2)
    scene_r = raytpu.random_world()
    bvh_r = build_bvh(scene_r, leaf_size=64)
    cfg_r = REFERENCE_V2.replace(rng_mode="parallel")
    rays_r = cfg_r.width * cfg_r.height * cfg_r.spp
    f_r = grads_direct(cfg_r, bvh_r, True)
    t_r = time_calls(f_r, scene_r, cfg_r.aspect, iters=2)
    print(f"refv2 fwd+bwd refill: {t_r*1e3:.1f} ms "
          f"({rays_r/t_r/1e6:.1f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
