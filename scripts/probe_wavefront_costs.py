"""Probe: is sort+scatter cheap enough for a sorted-wavefront renderer?

Measures on the real TPU:
  1. current config-4 (500 spheres) megakernel+BVH forward rate
  2. lax.sort of a full wavefront ray-state (i32 key + 14 f32 planes)
  3. unique-index scatter (the end-of-wave pixel accumulation)
at R = 320k (800x400 spp-batch 1) and R = 2.56M (spp-batch 8).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import raytpu
from raytpu import bvh as bvh_mod
from raytpu.kernels import megakernel
from raytpu.config import RenderConfig


def timeit(f, *args, iters=3):
    float(f(*args, jnp.float32(997.0)))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(f(*args, jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


# -- 1. current config-4 rate
cfg = RenderConfig(width=800, height=400, spp=20, depth=12)
scene = raytpu.final_world()
b = bvh_mod.build_bvh(scene, leaf_size=16)
rays = cfg.width * cfg.height * cfg.spp

def cam_i(eps):
    c = raytpu.make_camera((13., 2., 3.), (0., 0., 0.), vfov=20.,
                           aspect=cfg.aspect)
    return c._replace(lower_left=c.lower_left.at[0].add(eps * 1e-6))

@jax.jit
def fwd(s, eps):
    return jnp.sum(megakernel.render_pallas(s, cam_i(eps), cfg, bvh=b))

dt = timeit(fwd, scene)
print(f"config4 megakernel+bvh16: {dt*1e3:.0f} ms  {rays/dt/1e6:.1f} Mrays/s",
      flush=True)

# -- 2. sort cost at wavefront sizes
for R in (320 * 1024, 2560 * 1024):
    key = jax.random.randint(jax.random.PRNGKey(0), (R,), 0, 4000, jnp.int32)
    planes = [jax.random.uniform(jax.random.PRNGKey(i), (R,), jnp.float32)
              for i in range(14)]

    @jax.jit
    def do_sort(key, planes, eps):
        out = jax.lax.sort([key + jnp.int32(0 * eps), *planes], num_keys=1)
        return sum(jnp.sum(o[:8]) for o in out[1:3]) + eps

    dt = timeit(do_sort, key, planes)
    print(f"sort R={R}: {dt*1e3:.2f} ms", flush=True)

    # argsort + gather alternative
    @jax.jit
    def do_argsort(key, planes, eps):
        idx = jnp.argsort(key)
        outs = [p[idx] for p in planes]
        return sum(jnp.sum(o[:8]) for o in outs[:2]) + eps

    dt = timeit(do_argsort, key, planes)
    print(f"argsort+gather R={R}: {dt*1e3:.2f} ms", flush=True)

    # unique-index scatter (end-of-wave accumulation)
    perm = jax.random.permutation(jax.random.PRNGKey(1), R)
    val = planes[0]

    @jax.jit
    def do_scatter(perm, val, eps):
        out = jnp.zeros((R,), jnp.float32).at[perm].set(
            val + eps, unique_indices=True)
        return jnp.sum(out[:8]) + eps

    dt = timeit(do_scatter, perm, val)
    print(f"unique scatter R={R}: {dt*1e3:.2f} ms", flush=True)
