"""Round-5 smoke: taped backward vs classic refill PASS 2.

Interpret-mode (CPU) checks on a small BVH scene, parallel RNG:
  1. render_tape_fwd's image == megakernel render image (bit-equal)
  2. grads via (tape_fwd + replay) == classic refill VJP (bit-equal)
Run with 'tpu' arg for the compiled check (allclose).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
if mode == "cpu":
    import scripts._debug_cpu  # noqa: F401

import numpy as np
import jax
import jax.numpy as jnp

import raytpu
from raytpu.bvh import build_bvh
from raytpu.config import RenderConfig
from raytpu.render import render
from raytpu.kernels import gradkernel, megakernel

interpret = mode == "cpu"

cfg = RenderConfig(width=128, height=64, spp=3, depth=5,
                   rng_mode="parallel")
scene = raytpu.final_world(n=80)
bvh = build_bvh(scene, leaf_size=16)
cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                         vfov=20.0, aspect=cfg.aspect)

plan = gradkernel.tape_plan(cfg, scene.count, bvh=bvh)
print("plan:", plan)
assert plan is not None

img_ref = megakernel._render_pallas_fwd_impl(
    scene, cam, cfg, interpret, bvh.nodes, bvh.perm,
    leaf_size=bvh.leaf_size, flat=bvh.flat)
img_tape, tape = gradkernel.render_tape_fwd(
    scene, cam, cfg, plan["g_cap"], interpret=interpret, bvh=bvh)
img_ref, img_tape = np.asarray(img_ref), np.asarray(img_tape)
# the taping forward reproduces the GRADKERNEL's forward bit-for-bit
# (asserted below via bit-equal grads); vs the MEGAKERNEL image it
# carries the documented context-dependent FMA-contraction drift on the
# giant-sphere disc cancellation (CLAUDE.md; ~1e-4 post-gamma worst)
img_drift = float(np.abs(img_ref - img_tape).max())
print("img vs megakernel: maxdiff", img_drift,
      "(contraction drift; <= 3e-4 expected)")
bit_img = img_drift <= 3e-4

ct = jnp.ones((cfg.height, cfg.width, 3), jnp.float32) * 0.3
_, ds_c, dc_c = gradkernel.render_pallas_vjp(
    scene, cam, cfg, ct, interpret=interpret, bvh=bvh,
    img=jnp.asarray(img_ref))
_, ds_t, dc_t = gradkernel.render_pallas_vjp(
    scene, cam, cfg, ct, interpret=interpret, bvh=bvh,
    img=jnp.asarray(img_ref), tape=tape)


def cmp(name, a, b):
    a, b = np.asarray(a), np.asarray(b)
    bit = np.array_equal(a, b)
    md = float(np.abs(a - b).max()) if a.size else 0.0
    rel = md / max(float(np.abs(b).max()), 1e-12)
    print(f"{name:>12}: bit={bit} maxabs={md:.3e} rel={rel:.3e}")
    return bit


ok = True
for nm in ("center", "radius", "albedo", "mat_param"):
    ok &= cmp(nm, getattr(ds_t, nm), getattr(ds_c, nm))
for nm in ("origin", "lower_left", "horizontal", "vertical"):
    ok &= cmp("cam." + nm, getattr(dc_t, nm), getattr(dc_c, nm))
# grads must be bit-equal (same machine); the image only needs to sit
# inside the contraction-drift budget
print("PASS (grads bit-equal, img within drift budget)"
      if ok and bit_img else "MISMATCH")
