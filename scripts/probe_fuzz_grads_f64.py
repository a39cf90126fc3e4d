"""Adjudicate the fuzz's VJP tolerance against an f64 ground truth.

tests/test_fuzz.py::test_fuzz_vjp_matches_golden[0] (48x24, spp 1,
depth 3, 20 spheres, sequential RNG) showed the fused kernel and XLA's
f32 autodiff of golden disagreeing by up to 1.1e-5 abs / 1.5% rel on
center grads, and the test budgets for it as shared f32 accumulation
noise.  This probe MEASURES that claim instead of asserting it: compute
the same draw's center/albedo grads three ways —

  A. fused Pallas VJP (interpret, f32)     <- the kernel under test
  B. jax.grad of golden (f32)              <- the fuzz's reference
  C. jax.grad of golden (CPU f64)          <- ground truth (subprocess)

If err(A vs C) ~ err(B vs C) ~ err(A vs B), both estimators sit at the
same noise floor and the tolerance is budgeting XLA's noise, not a
kernel defect.  If err(A vs C) >> err(B vs C), the kernel is actually
wrong and the tolerance is hiding it.

Run:  python scripts/probe_fuzz_grads_f64.py          (CPU, any host)
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

MODE = sys.argv[1] if len(sys.argv) > 1 else "compare"

if MODE == "f64":
    os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if MODE == "f64":
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from raytpu import golden  # noqa: E402
import test_fuzz  # noqa: E402  (the draw under adjudication)


def case0():
    rng = np.random.RandomState(2000)
    cfg, scene, cam, bvh = test_fuzz._draw(rng)
    cfg = cfg.replace(width=min(cfg.width, 48), height=min(cfg.height, 24),
                      spp=1, depth=min(cfg.depth, 3))
    return cfg, scene, cam, bvh


def grads_of(loss, scene):
    g = jax.grad(loss, allow_int=True)(scene)
    return {k: np.asarray(getattr(g, k)).tolist()
            for k in ("center", "albedo")}


cfg, scene, cam, bvh = case0()

if MODE == "f64":
    scene = scene._replace(
        center=scene.center.astype(jnp.float64),
        radius=scene.radius.astype(jnp.float64),
        albedo=scene.albedo.astype(jnp.float64),
        mat_param=scene.mat_param.astype(jnp.float64))
    cam = jax.tree.map(lambda x: x.astype(jnp.float64), cam)

    def loss_c(s):
        img = golden.render_golden(s, cam, cfg)
        return jnp.mean(img ** 2)

    print(json.dumps(grads_of(loss_c, scene)))
    sys.exit(0)

from raytpu.kernels import megakernel  # noqa: E402


def loss_p(s):
    img = megakernel.render_pallas(s, cam, cfg, bvh=bvh, interpret=True)
    return jnp.mean(img ** 2)


def loss_g(s):
    img = golden.render_golden(s, cam, cfg)
    return jnp.mean(img ** 2)


A = grads_of(loss_p, scene)
B = grads_of(loss_g, scene)
out = subprocess.run(
    [sys.executable, os.path.abspath(__file__), "f64"],
    capture_output=True, text=True, timeout=1200)
C = json.loads(out.stdout.strip().splitlines()[-1])

print(f"fuzz case 0: {cfg.width}x{cfg.height} spp{cfg.spp} d{cfg.depth} "
      f"n={scene.count} {cfg.rng_mode} "
      f"bvh={None if bvh is None else 'leaf' + str(bvh.leaf_size)}")
for k in ("center", "albedo"):
    a = np.array(A[k]); b = np.array(B[k]); c = np.array(C[k])
    scale = np.maximum(np.abs(c), 1e-7)
    print(f"{k:7s} max|A-C|={np.abs(a-c).max():.3e} "
          f"max|B-C|={np.abs(b-c).max():.3e} "
          f"max|A-B|={np.abs(a-b).max():.3e}   "
          f"rel: A {np.max(np.abs(a-c)/scale):.3e} "
          f"B {np.max(np.abs(b-c)/scale):.3e}")
