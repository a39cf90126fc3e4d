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
