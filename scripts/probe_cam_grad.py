"""Diagnose the camera-origin gradient error (round-2 verdict item 5).

BENCH_r02 reported gradkernel_autodiff_rel_err.cam_origin_x = 1.1e-3 —
an order worse than every scene parameter.  Three-way comparison on the
bench_grad_sweep workload (128x64, spp 4, depth 6, one-hot ct on 4
interior diffuse-sphere pixels):

  A. fused-kernel d_cam              (TPU, f32)
  B. jax.grad of golden d_cam        (TPU, f32)    <- bench's reference
  C. jax.grad of golden d_cam        (CPU, f64)    <- ground truth

If A-vs-C ~ B-vs-C >> 0: the error is f32 noise present in BOTH
estimators and the bench's A-vs-B metric punishes the kernel for XLA's
noise too; fix = higher-precision accumulation in the kernel and an
f64 bench reference for the camera rows.  If A-vs-C >> B-vs-C: the
kernel's raygen transpose sums are the problem.

Run modes:
  python -m scripts.probe_cam_grad tpu   # parts A+B (background it!)
  python -m scripts.probe_cam_grad cpu   # part C (f64)

MEASURED (2026-08-19, v5e chip + CPU f64, probes (34,35)x(72,73)):

  rel err vs C (f64 truth)      A (kernel)   B (XLA f32 autodiff)
  origin x / y / z              9.0e-4 / 9.4e-5 / 3.4e-4   2.1e-4 / 1.3e-4 / 2.8e-4
  lower_left x / y / z          3.0e-5 / 2.7e-5 / 4.6e-5   1.7e-5 / 1.9e-5 / 2.9e-5
  center[1] x / y / z           2.4e-5 / 2.6e-5 / 4.8e-5   1.8e-5 / 1.8e-5 / 2.8e-5

  -> every RAW sum (lower_left, horizontal, vertical, scene params)
  sits at the f32 noise floor (2-5e-5) for BOTH estimators.  origin is
  the DIFFERENCE of two near-cancelling sums (sum|d_o|, sum|d_d| ~
  0.23 vs result 2.8e-4: condition ~800), so the same floor amplifies
  to ~1e-4..1e-3 — for XLA autodiff too.  The round-2 1.1e-3 metric
  (A vs B) measured the distance between two equally-legitimate noisy
  f32 estimators; no summation fix can beat the per-lane forward
  -replay linearization noise (1-ulp FMA-contraction class, TODO.md)
  once the cancellation multiplies it.
  Fixes shipped: (1) the kernel's camera-sum accumulation chains are
  Kahan-compensated (removes the O(tiles x spp) sequential-add noise
  at real scales; probe scale is too small to show it), (2)
  bench_grad_sweep measures camera components against CPU-f64 golden
  autodiff (subprocess) and reports BOTH estimators' true errors.
"""
from __future__ import annotations

import sys

import numpy as np


def probe_pixels(cfg, scene, cam):
    """4 probe pixels well inside sphere 1's primary silhouette,
    computed in PLATFORM-INDEPENDENT numpy f64 (center rays)."""
    c = np.asarray(scene.center, np.float64)
    rad = np.asarray(scene.radius, np.float64)
    ys, xs = np.mgrid[0:cfg.height, 0:cfg.width]
    u = (xs + 0.55) / (cfg.width - 1)
    v = (ys + 0.55) / (cfg.height - 1)
    o = np.asarray(cam.origin, np.float64)
    d = (np.asarray(cam.lower_left, np.float64)
         + u[..., None] * np.asarray(cam.horizontal, np.float64)
         + v[..., None] * np.asarray(cam.vertical, np.float64) - o)
    oc = o - c[:, None, None, :]                     # (N, H, W, 3)
    a = np.sum(d * d, axis=-1)
    hb = np.sum(oc * d, axis=-1)
    cc = np.sum(oc * oc, axis=-1) - (rad ** 2)[:, None, None]
    disc = hb * hb - a * cc
    ok = disc >= 0
    sq = np.sqrt(np.where(ok, disc, 0.0))
    r1 = (-hb - sq) / a
    r2 = (-hb + sq) / a
    root = np.where(r1 >= 1e-3, r1, r2)
    t = np.where(ok & (root >= 1e-3), root, np.inf)
    idx = np.argmin(t, axis=0)
    m = (idx == 1) & np.isfinite(t.min(axis=0))
    inner = m.copy()
    for s_ in (1, -1):
        inner &= np.roll(m, s_ * 2, 0) & np.roll(m, s_ * 2, 1)
    py, px = np.nonzero(inner)
    k = max(1, len(py) // 4)
    return py[::k][:4], px[::k][:4]


def build_problem(jnp):
    import raytpu
    from raytpu.config import RenderConfig

    cfg = RenderConfig(width=128, height=64, spp=4, depth=6)
    scene = raytpu.config2_world()
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                             vfov=20.0, aspect=cfg.aspect)
    pys, pxs = probe_pixels(cfg, scene, cam)
    print("probes", list(pys), list(pxs))
    ct = np.zeros((cfg.height, cfg.width, 3), np.float32)
    ct[pys, pxs] = 1.0
    return cfg, scene, cam, jnp.asarray(ct)


def f64_camera_reference(cfg, scene, cam, ct_np):
    """CPU-f64 golden-autodiff camera gradients -> dict of lists.

    Must run in a process where jax is on the CPU platform with x64 on
    (bench.py invokes this module as a SUBPROCESS via --json so the TPU
    process's f32/u32 world is untouched).
    """
    import jax
    import jax.numpy as jnp
    from raytpu import golden as g

    scene = scene._replace(
        center=scene.center.astype(jnp.float64),
        radius=scene.radius.astype(jnp.float64),
        albedo=scene.albedo.astype(jnp.float64),
        mat_param=scene.mat_param.astype(jnp.float64))
    cam = jax.tree.map(lambda x: x.astype(jnp.float64), cam)
    ct = jnp.asarray(ct_np, jnp.float64)

    def loss(s, c):
        return jnp.sum(g.render_golden(s, c, cfg) * ct)

    _, dc = jax.grad(loss, argnums=(0, 1), allow_int=True)(scene, cam)
    return {k: [float(v) for v in np.asarray(getattr(dc, k))]
            for k in ("origin", "lower_left", "horizontal", "vertical")}


def _json_mode(argv):
    """--json --probes "py0,py1,...;px0,px1,..." [--spec w,h,spp,depth]
    -> one JSON line of f64 camera grads (called by bench.py)."""
    import json
    import scripts._debug_cpu  # noqa: F401
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import raytpu
    from raytpu.config import RenderConfig

    probes = argv[argv.index("--probes") + 1]
    pys, pxs = (np.array([int(x) for x in part.split(",")])
                for part in probes.split(";"))
    if "--spec" in argv:
        w, h, spp, depth = (int(x) for x in
                            argv[argv.index("--spec") + 1].split(","))
    else:
        w, h, spp, depth = 128, 64, 4, 6
    cfg = RenderConfig(width=w, height=h, spp=spp, depth=depth)
    scene = raytpu.config2_world()
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                             vfov=20.0, aspect=cfg.aspect)
    ct = np.zeros((cfg.height, cfg.width, 3), np.float32)
    ct[pys, pxs] = 1.0
    print(json.dumps(f64_camera_reference(cfg, scene, cam, ct)))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    if "--json" in sys.argv:
        _json_mode(sys.argv)
        return
    if mode == "cpu":
        import scripts._debug_cpu  # noqa: F401
        import jax
        jax.config.update("jax_enable_x64", True)
    import jax
    import jax.numpy as jnp
    from raytpu import golden as g

    cfg, scene, cam, ct = build_problem(jnp)

    if mode == "cpu":
        scene = scene._replace(
            center=scene.center.astype(jnp.float64),
            radius=scene.radius.astype(jnp.float64),
            albedo=scene.albedo.astype(jnp.float64),
            mat_param=scene.mat_param.astype(jnp.float64))
        cam = jax.tree.map(lambda x: x.astype(jnp.float64), cam)
        ct = ct.astype(jnp.float64)

        def loss(s, c):
            return jnp.sum(g.render_golden(s, c, cfg) * ct)

        ds, dc = jax.grad(loss, argnums=(0, 1), allow_int=True)(scene, cam)
        for name in ("origin", "lower_left", "horizontal", "vertical"):
            print(f"C_f64_{name}",
                  [f"{v:.10e}" for v in np.asarray(getattr(dc, name))])
        print("C_f64_center1",
              [f"{v:.10e}" for v in np.asarray(ds.center[1])])
        return

    from raytpu.kernels import gradkernel

    @jax.jit
    def kernel_grads(scene, cam, ct):
        _, ds, dc = gradkernel.render_pallas_vjp(scene, cam, cfg, ct,
                                                 interpret=False)
        return ds, dc

    @jax.jit
    def autodiff_grads(scene, cam, ct):
        def loss(s, c):
            return jnp.sum(g.render_golden(s, c, cfg) * ct)
        return jax.grad(loss, argnums=(0, 1), allow_int=True)(scene, cam)

    ds_k, dc_k = kernel_grads(scene, cam, ct)
    ds_a, dc_a = autodiff_grads(scene, cam, ct)
    for name in ("origin", "lower_left", "horizontal", "vertical"):
        print(f"A_kernel_{name}",
              [f"{v:.10e}" for v in np.asarray(getattr(dc_k, name))])
        print(f"B_tpu_ad_{name}",
              [f"{v:.10e}" for v in np.asarray(getattr(dc_a, name))])
    print("A_kernel_center1",
          [f"{v:.10e}" for v in np.asarray(ds_k.center[1])])
    print("B_tpu_ad_center1",
          [f"{v:.10e}" for v in np.asarray(ds_a.center[1])])


if __name__ == "__main__":
    main()
