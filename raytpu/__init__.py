"""raytpu — a TPU-native differentiable path tracer.

A from-scratch JAX / Pallas / pjit reimplementation of the capabilities of
the reference renderer Brochu/RayTrace-WE-GPU (a DirectX 11 "Ray Tracing in
One Weekend" compute-shader path tracer).  The reference defines the forward
rendering *semantics* (see SURVEY.md); the architecture here is TPU-first:

- SoA scene PyTrees (mirroring the reference's cbuffer layout,
  ref: CSVersion/ShaderCompute.hlsl:12-19)
- counter-free, coordinate-derived hash RNG identical across golden / Pallas /
  sharded execution (ref: CSVersion/ShaderCompute.hlsl:23-66)
- a pure-jnp golden renderer as the allclose oracle
- Pallas wavefront megakernels for the hot path
- hand-structured custom_vjp adjoints (gradients of pixels w.r.t. sphere
  centers/radii, material albedo/fuzz/IOR, and camera pose)
- pixel-tile sharding over a jax.sharding.Mesh with psum'd scene gradients
"""

import os as _os

# Persistent XLA compilation cache (round 5): a fresh process's first
# render of an already-seen kernel shape pays seconds, not a full
# compile.  Measured over the remote-TPU tunnel
# (scripts/probe_compile_cache_r5.py): first-call latency config-4
# fwd 3.7 -> 2.4 s, fwd+bwd 6.4 -> 4.3 s cross-process (a never-seen
# shape costs ~20-40 s wherever it compiles).  RAYTPU_CACHE=0 disables;
# RAYTPU_CACHE_DIR overrides the location.
if _os.environ.get("RAYTPU_CACHE", "1") != "0":
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get(
                "RAYTPU_CACHE_DIR",
                _os.path.join(_os.path.expanduser("~"), ".cache",
                              "raytpu-xla")))
        _jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass

from raytpu.config import RenderConfig
from raytpu.camera import (
    Camera,
    make_camera,
    reference_camera_v1,
    reference_camera_v2,
)
from raytpu.scene import (
    Scene,
    make_scene,
    test_world,
    random_world,
    config1_world,
    config2_world,
    final_world,
    v1_world,
)
from raytpu.render import render, render_grad
from raytpu.bvh import BVH, build_bvh

__version__ = "0.1.0"

__all__ = [
    "RenderConfig",
    "Camera",
    "make_camera",
    "reference_camera_v1",
    "reference_camera_v2",
    "Scene",
    "make_scene",
    "test_world",
    "random_world",
    "config1_world",
    "config2_world",
    "final_world",
    "v1_world",
    "render",
    "render_grad",
    "BVH",
    "build_bvh",
]
