"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: forward rays/sec/chip on the BASELINE 12-depth / 20-spp scene
(config 2: test_world at 400x200, 20 spp, depth 12).  "rays" counts primary
samples (width * height * spp), matching BASELINE.json's workload
definition; bounce rays are the work behind each sample, not extra credit.

Measurement protocol (tunnel-safe): every timed call is one jitted
dispatch whose output is a SCALAR image checksum, evaluated per call with
a DISTINCT camera input — this forces real device execution (no server
-side result reuse) and synchronizes on a 4-byte transfer instead of the
full image.

Also measured (reported in the "extra" field):
- fwd+bwd rays/sec/chip (render + MSE loss + full scene/camera gradient)
- golden-backend forward rays/sec (the XLA-fusion fallback path)
- gradient max-abs-err vs central finite differences on probe pixels

The reference publishes no numbers (BASELINE.md), so vs_baseline compares
against OUR round-1 recorded number (golden backend on one v5e chip).
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

# Round-1 recorded baseline: golden (pure-XLA) forward on one real v5e
# chip, config2, including tunnel sync overhead.  vs_baseline = value /
# BASELINE_RAYS_PER_SEC.
BASELINE_RAYS_PER_SEC = 8_315_929


def _cam(i: int, aspect: float):
    # distinct camera per call defeats any transparent result caching
    return raytpu.make_camera((13.0 + i * 1e-4, 2.0, 3.0), (0.0, 0.0, 0.0),
                              vfov=20.0, aspect=aspect)


def _time_calls(fn, scene, aspect, iters=3):
    """Median wall time of scalar-synchronized jitted calls."""
    float(fn(scene, _cam(997, aspect)))  # warmup/compile
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(scene, _cam(i, aspect)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


_FRAMES = 8  # frames per dispatch for sustained-throughput timing


def _batch_frames(frame_fn, aspect):
    """Wrap a per-frame scalar fn into one dispatch over _FRAMES frames
    derived from the CALLER'S camera (sustained chip throughput; a single
    small frame is dominated by per-dispatch latency on a remote-TPU
    link).  Each frame perturbs the caller's camera by a distinct epsilon,
    so every timed dispatch sees distinct inputs AND distinct frames —
    no server-side result reuse (CLAUDE.md tunnel protocol)."""

    @jax.jit
    def run(scene, cam):
        def body(acc, k):
            c = cam._replace(
                lower_left=cam.lower_left.at[0].add(k * 1e-6))
            return acc + frame_fn(scene, c), None
        acc, _ = jax.lax.scan(
            body, jnp.float32(0.0),
            jnp.arange(_FRAMES, dtype=jnp.float32))
        return acc

    return run


def main():
    cfg = CONFIG2
    scene = raytpu.config2_world()
    backend = _backend("auto")
    rays = cfg.width * cfg.height * cfg.spp

    # -- forward throughput (headline backend), _FRAMES frames/dispatch
    def fwd_frame(s, c):
        return jnp.sum(render(s, c, cfg, backend=backend))

    fwd = _batch_frames(fwd_frame, cfg.aspect)
    t_fwd = _time_calls(fwd, scene, cfg.aspect) / _FRAMES
    fwd_rays_s = rays / t_fwd

    # -- golden (XLA fallback) forward, for the backend-vs-backend delta
    if backend != "golden":
        fwd_g = jax.jit(
            lambda s, c: jnp.sum(render(s, c, cfg, backend="golden")))
        t_fwd_g = _time_calls(fwd_g, scene, cfg.aspect)
    else:
        t_fwd_g = t_fwd

    # -- forward+backward throughput (golden-path autodiff)
    target = golden.render_golden(scene, _cam(0, cfg.aspect), cfg)

    def fwdbwd_frame(s, c):
        def loss_fn(s, c):
            img = render(s, c, cfg, backend=backend)
            return jnp.mean((img - target) ** 2)
        g = jax.grad(loss_fn, argnums=(0, 1), allow_int=True)(s, c)
        leaves = [g[0].center, g[0].radius, g[0].albedo, g[0].mat_param,
                  g[1].origin, g[1].horizontal, g[1].vertical,
                  g[1].lower_left]
        return sum(jnp.sum(l) for l in leaves)

    fwdbwd = _batch_frames(fwdbwd_frame, cfg.aspect)
    t_fb = _time_calls(fwdbwd, scene, cfg.aspect) / _FRAMES
    fb_rays_s = rays / t_fb

    # -- gradient max-err vs central finite differences (probe pixels well
    # inside the hero spheres; visibility terms are detached by design)
    cam0 = _cam(0, cfg.aspect)
    probes_x = jnp.array([210, 200, 190, 205], jnp.int32)
    probes_y = jnp.array([100, 105, 95, 98], jnp.int32)

    @jax.jit
    def pix(s):
        r, g, b = golden.render_pixels(s, cam0, cfg, probes_x, probes_y)
        return r + g + b

    def apply(v):
        return pix(scene._replace(albedo=scene.albedo.at[1, 0].set(v)))

    a0 = float(scene.albedo[1, 0])
    analytic = jax.jvp(apply, (jnp.float32(a0),), (jnp.float32(1.0),))[1]
    eps = 1e-2
    fd = (apply(jnp.float32(a0 + eps))
          - apply(jnp.float32(a0 - eps))) / (2 * eps)
    grad_max_err = float(jnp.max(jnp.abs(analytic - fd)))

    result = {
        "metric": "fwd_rays_per_sec_per_chip",
        "value": round(fwd_rays_s),
        "unit": "rays/s",
        "vs_baseline": round(fwd_rays_s / BASELINE_RAYS_PER_SEC, 3),
        "extra": {
            "backend": backend,
            "platform": jax.devices()[0].platform,
            "config": "test_world 400x200 20spp depth12",
            "frames_per_dispatch": _FRAMES,
            "fwd_ms": round(t_fwd * 1e3, 2),
            "golden_fwd_ms": round(t_fwd_g * 1e3, 2),
            "fwdbwd_rays_per_sec": round(fb_rays_s),
            "fwdbwd_ms": round(t_fb * 1e3, 2),
            "grad_max_err_vs_fd": grad_max_err,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
