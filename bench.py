"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: forward rays/sec/chip on the BASELINE 12-depth / 20-spp scene
(config 2: test_world at 400x200, 20 spp, depth 12).  "rays" counts primary
samples (width * height * spp), matching BASELINE.json's workload
definition; bounce rays are the work behind each sample, not extra credit.

Also measured (reported in the "extra" field):
- fwd+bwd rays/sec/chip (render + MSE loss + full scene/camera gradient)
- gradient max-abs-err vs central finite differences on probe pixels

The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against our own recorded round-1 number once one exists (null until
then).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import raytpu
from raytpu import golden
from raytpu.config import CONFIG2
from raytpu.render import render, _backend

# Our own recorded baseline (round 1, real TPU v5e chip). Update when the
# kernel path improves; vs_baseline = value / BASELINE_RAYS_PER_SEC.
BASELINE_RAYS_PER_SEC = None


def _time(fn, iters=3):
    fn()  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    cfg = CONFIG2
    scene = raytpu.config2_world()
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0), vfov=20.0,
                             aspect=cfg.aspect)
    backend = _backend("auto")
    rays = cfg.width * cfg.height * cfg.spp

    # -- forward throughput
    fwd = jax.jit(lambda s, c: render(s, c, cfg, backend=backend))
    t_fwd = _time(lambda: fwd(scene, cam))
    fwd_rays_s = rays / t_fwd

    # -- forward+backward throughput
    target = fwd(scene, cam)

    @jax.jit
    def fwdbwd(s, c):
        def loss_fn(s, c):
            img = render(s, c, cfg, backend=backend)
            return jnp.mean((img - target) ** 2)
        return jax.grad(loss_fn, argnums=(0, 1), allow_int=True)(s, c)

    t_fb = _time(lambda: fwdbwd(scene, cam))
    fb_rays_s = rays / t_fb

    # -- gradient max-err vs central finite differences (probe pixels well
    # inside the hero spheres; visibility terms are detached by design)
    probes_x = jnp.array([210, 200, 190, 205], jnp.int32)
    probes_y = jnp.array([100, 105, 95, 98], jnp.int32)

    @jax.jit
    def pix(s):
        r, g, b = golden.render_pixels(s, cam, cfg, probes_x, probes_y)
        return r + g + b

    def apply(v):
        return pix(scene._replace(albedo=scene.albedo.at[1, 0].set(v)))

    a0 = float(scene.albedo[1, 0])
    analytic = jax.jvp(apply, (jnp.float32(a0),), (jnp.float32(1.0),))[1]
    eps = 1e-2
    fd = (apply(jnp.float32(a0 + eps)) - apply(jnp.float32(a0 - eps))) / (2 * eps)
    grad_max_err = float(jnp.max(jnp.abs(analytic - fd)))

    result = {
        "metric": "fwd_rays_per_sec_per_chip",
        "value": round(fwd_rays_s),
        "unit": "rays/s",
        "vs_baseline": (round(fwd_rays_s / BASELINE_RAYS_PER_SEC, 3)
                        if BASELINE_RAYS_PER_SEC else None),
        "extra": {
            "backend": backend,
            "platform": jax.devices()[0].platform,
            "config": "test_world 400x200 20spp depth12",
            "fwd_ms": round(t_fwd * 1e3, 2),
            "fwdbwd_rays_per_sec": round(fb_rays_s),
            "fwdbwd_ms": round(t_fb * 1e3, 2),
            "grad_max_err_vs_fd": grad_max_err,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
