"""Ablation: what does the cbrt (exp/log) in random_in_unit_sphere cost?

Monkeypatches rng.random_in_unit_sphere with a no-cbrt variant (r = c,
a DIFFERENT distribution — measurement only, renders are wrong) before
the kernels trace, then times the config-4 refill megakernel against
the stock build.  If the delta is big, a spec change to a Newton-from
-bitcast cbrt (mul-only, ~10 cheap VPU ops) is worth the 5-file
lockstep edit; if small, close the TODO line as measured-dead.

Run on real TPU: python scripts/probe_cbrt.py
"""
import sys, time

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp
import numpy as np

import raytpu
from raytpu import rng
from raytpu import bvh as bvh_mod
from raytpu.config import RenderConfig
from raytpu.render import render

cfg = RenderConfig(width=800, height=400, spp=20, depth=12)
scene = raytpu.final_world()
b = bvh_mod.build_bvh(scene, leaf_size=64)
rays = cfg.width * cfg.height * cfg.spp


def cam_i(eps):
    c = raytpu.make_camera((13., 2., 3.), (0., 0., 0.), vfov=20.,
                           aspect=cfg.aspect)
    return c._replace(lower_left=c.lower_left.at[0].add(eps * 1e-6))


def timeit(label):
    @jax.jit
    def f(s, eps):
        return jnp.sum(render(s, cam_i(eps), cfg, backend="pallas",
                              bvh=b))

    float(f(scene, jnp.float32(997.0)))
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        float(f(scene, jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{label:18s}: {t*1e3:7.1f} ms  {rays/t/1e6:5.1f} Mrays/s",
          flush=True)
    return t


t0 = timeit("stock (exp/log)")

_orig = rng.random_in_unit_sphere


def _no_cbrt(state):
    (a, bu, c), state = rng.hash3(state)
    h = a * np.float32(2.0) - np.float32(1.0)
    phi = bu * rng._TWO_PI
    r = c  # ABLATION: uniform radius (wrong distribution, same op count
    #        minus exp+log)
    s = jnp.sqrt(jnp.maximum(np.float32(1.0) - h * h, np.float32(0.0)))
    return (r * s * jnp.sin(phi), r * s * jnp.cos(phi), r * h), state


def _newton_cbrt(state):
    """Candidate spec: z ~= c^(-1/3) by bit-trick + 3 mul-only Newton
    steps, r = c * z * z.  No exp/log."""
    (a, bu, c), state = rng.hash3(state)
    h = a * np.float32(2.0) - np.float32(1.0)
    phi = bu * rng._TWO_PI
    i = jax.lax.bitcast_convert_type(
        jnp.maximum(c, np.float32(1e-30)), jnp.uint32)
    z = jax.lax.bitcast_convert_type(
        np.uint32(0x54a21d2a) - i // np.uint32(3), jnp.float32)
    third = np.float32(1.0 / 3.0)
    four = np.float32(4.0)
    for _ in range(3):
        z = z * (four - c * z * z * z) * third
    r = jnp.where(c > 0, c * z * z, np.float32(0.0))
    s = jnp.sqrt(jnp.maximum(np.float32(1.0) - h * h, np.float32(0.0)))
    return (r * s * jnp.sin(phi), r * s * jnp.cos(phi), r * h), state


def _no_transcendental(state):
    """Timing bound: drop cbrt AND sin/cos (wrong distribution)."""
    (a, bu, c), state = rng.hash3(state)
    h = a * np.float32(2.0) - np.float32(1.0)
    sn = bu * np.float32(2.0) - np.float32(1.0)
    cs = np.float32(1.0) - bu
    r = c
    s = jnp.sqrt(jnp.maximum(np.float32(1.0) - h * h, np.float32(0.0)))
    return (r * s * sn, r * s * cs, r * h), state


for label, fn in (("no-cbrt (r=c)", _no_cbrt),
                  ("newton cbrt", _newton_cbrt),
                  ("no transcend.", _no_transcendental)):
    rng.random_in_unit_sphere = fn
    # kernels resolve rng.* at trace time; clear jit caches so the
    # patched sampler is re-traced
    jax.clear_caches()
    try:
        timeit(label)
    finally:
        rng.random_in_unit_sphere = _orig
jax.clear_caches()

# accuracy of the Newton cbrt vs exp(log/3) on [1e-6, 1)
x = jnp.asarray(np.random.RandomState(0).uniform(1e-6, 1, 4096),
                jnp.float32)
ref = jnp.exp(jnp.log(x) / 3.0)
i = jax.lax.bitcast_convert_type(x, jnp.uint32)
z = jax.lax.bitcast_convert_type(
    np.uint32(0x54a21d2a) - i // np.uint32(3), jnp.float32)
for _ in range(3):
    z = z * (4.0 - x * z * z * z) * (1.0 / 3.0)
new = x * z * z
rel = jnp.max(jnp.abs(new - ref) / ref)
print("newton-vs-exp/log max rel err:", float(rel), flush=True)
