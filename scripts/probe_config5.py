"""BASELINE config-5 single-chip anchor (round-3 verdict item 4).

  tpu: render 1920x1080 @ 500 spp depth 12 (500-sphere final scene,
       BVH) on the one real chip — ONE megakernel dispatch (the refill
       loop carries spp in-register; no spp-sized buffers), plus a
       64-vs-128 block check of _auto_block_w's pick at this height,
       plus the fused fwd+bwd at config-5 geometry (spp 20 — the full
       500-spp gradient is just more of the same windows).
  cpu: prove the SHARDED wavefront path compiles + executes at full
       config-5 width/height with spp > 1 on the virtual 8-device mesh
       (tiny spp/depth keep the interpreter tractable).

Run:  python -m scripts.probe_config5 tpu    (background it)
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m scripts.probe_config5 cpu

MEASURED (2026-08-19, v5e):
  config5 fwd, ONE dispatch of 1.04e9 primary rays:
    block auto-of-the-time (128/mt8): 16.15 s (64.2 Mrays/s)
    block 64 (mt4):                   15.11 s (68.6 Mrays/s)
  -> _auto_block_w's mt score now caps at 4 so it picks 64 here.
  config5 fwd+bwd @ spp 20 (same geometry): 1.63 s (25.5 Mrays/s).
  cpu: sharded wavefront at the full 1920x1080 shape, spp 2, on the
  8-device virtual mesh: compiles + executes OK.
  Pod extrapolation anchor: a v5e-16 slab render at >= 90% scaling
  efficiency would put config-5 at ~1.0 s/frame (16 x 68.6 Mrays/s).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

import raytpu
from raytpu.config import RenderConfig, CONFIG5


def _cam(i, aspect):
    return raytpu.make_camera((13.0 + i * 1e-4, 2.0, 3.0),
                              (0.0, 0.0, 0.0), vfov=20.0, aspect=aspect)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    if mode == "cpu":
        import scripts._debug_cpu  # noqa: F401
        import jax as j2
        from raytpu import shard
        from raytpu.bvh import build_bvh
        mesh = shard.make_mesh(j2.devices()[:8])
        scene = raytpu.final_world()
        cfgw = RenderConfig(width=1920, height=1080, spp=2, depth=2,
                            rng_mode="parallel")
        b = build_bvh(scene)
        img = shard.render_wavefront_sharded(
            scene, _cam(0, cfgw.aspect), cfgw, mesh=mesh, bvh=b,
            spp_batch=2)
        jax.block_until_ready(img)
        assert img.shape == (cfgw.height, cfgw.width, 3)
        print("cpu sharded wavefront @ full config-5 shape, spp 2: OK",
              flush=True)
        return

    from raytpu.render import render
    from raytpu.kernels.megakernel import render_pallas
    from raytpu.bvh import build_bvh
    print("platform", jax.devices()[0].platform, flush=True)
    scene = raytpu.final_world()
    bvh = build_bvh(scene, leaf_size=64)
    cfg = CONFIG5.replace(rng_mode="parallel")
    rays = cfg.width * cfg.height * cfg.spp

    for bw in (None, 64):
        f = jax.jit(lambda s, c, bw=bw: jnp.sum(render_pallas(
            s, c, cfg, bvh=bvh, block_w=bw)))
        float(f(scene, _cam(997, cfg.aspect)))
        ts = []
        for i in range(2):
            t0 = time.perf_counter()
            float(f(scene, _cam(i, cfg.aspect)))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"config5 fwd block={bw or 'auto'}: {t:.2f} s "
              f"({rays/t/1e6:.1f} Mrays/s)", flush=True)

    # config-5 geometry gradient step (spp 20: same windows, fewer)
    from raytpu.kernels import gradkernel
    cfg_g = cfg.replace(spp=20)

    @jax.jit
    def fg(s, c):
        img = render(s, c, cfg_g, backend="pallas", bvh=bvh)
        ct = 2.0 * (img - 0.25) / img.size
        _, ds, dc = gradkernel.render_pallas_vjp(
            s, c, cfg_g, ct, interpret=False, bvh=bvh, img=img)
        return jnp.sum(ds.center) + jnp.sum(dc.origin)

    float(fg(scene, _cam(996, cfg.aspect)))
    t0 = time.perf_counter()
    float(fg(scene, _cam(5, cfg.aspect)))
    t = time.perf_counter() - t0
    r20 = cfg_g.width * cfg_g.height * cfg_g.spp
    print(f"config5 fwd+bwd spp20: {t:.2f} s ({r20/t/1e6:.1f} Mrays/s)",
          flush=True)


if __name__ == "__main__":
    main()
