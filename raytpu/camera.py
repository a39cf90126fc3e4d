"""Thin-lens look-at camera.

Union of the reference's two cameras:
- v2 pinhole basis math (ref: CSVersion/DxCSApp.cpp:39-61, consumed at
  CSVersion/ShaderCompute.hlsl:118-127) — origin / horizontal / vertical /
  lower_left packed layout; v2 *ignores* its aperture parameter.
- v1 defocus blur (ref: Shader_RT.fx:288-298, DXRayTrace.cpp:23-72) — lens
  offset ``rd = lens_radius * random_in_unit_disk``; origin shifted by
  ``u*rd.x + v*rd.y`` and the direction re-aimed at the focal point.

The camera is a PyTree of f32 arrays so it is differentiable: gradients of
pixels w.r.t. camera pose flow through ``make_camera`` into ``look_from`` /
``look_at`` etc.  ``lens_radius == 0`` gives the exact v2 pinhole semantics
(and consumes no RNG, matching ShaderCompute.hlsl:118-127 where the seed
parameter is unused).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from raytpu import rng


class Camera(NamedTuple):
    """Packed camera basis — rows of the reference's ``viewVals`` matrix."""

    origin: jnp.ndarray       # (3,) look_from
    horizontal: jnp.ndarray   # (3,) focus_dist * viewport_w * u
    vertical: jnp.ndarray     # (3,) focus_dist * viewport_h * v
    lower_left: jnp.ndarray   # (3,) origin - horizontal/2 - vertical/2 - focus_dist*w
    u: jnp.ndarray            # (3,) right basis (for lens offset)
    v: jnp.ndarray            # (3,) up basis (for lens offset)
    lens_radius: jnp.ndarray  # ()   aperture / 2


def make_camera(
    look_from,
    look_at,
    vup=(0.0, 1.0, 0.0),
    vfov: float = 20.0,
    aspect: float = 16.0 / 9.0,
    aperture: float = 0.0,
    focus_dist=None,
) -> Camera:
    """Build a camera (ref basis math: CSVersion/DxCSApp.cpp:39-61).

    ``focus_dist=None`` uses |look_from - look_at| — the v2 default
    (ref: CSVersion/DxCSApp.cpp:488-489).
    """
    look_from = jnp.asarray(look_from, jnp.float32)
    look_at = jnp.asarray(look_at, jnp.float32)
    vup = jnp.asarray(vup, jnp.float32)

    theta = vfov * math.pi / 180.0
    h = math.tan(theta / 2.0)
    view_h = 2.0 * h
    view_w = aspect * view_h

    if focus_dist is None:
        focus_dist = jnp.linalg.norm(look_from - look_at)
    focus_dist = jnp.asarray(focus_dist, jnp.float32)

    w = look_from - look_at
    w = w / jnp.linalg.norm(w)
    u = jnp.cross(vup, w)
    u = u / jnp.linalg.norm(u)
    v = jnp.cross(w, u)

    horizontal = focus_dist * view_w * u
    vertical = focus_dist * view_h * v
    lower_left = look_from - horizontal / 2.0 - vertical / 2.0 - focus_dist * w

    return Camera(
        origin=look_from,
        horizontal=horizontal,
        vertical=vertical,
        lower_left=lower_left,
        u=u,
        v=v,
        lens_radius=jnp.asarray(aperture / 2.0, jnp.float32),
    )


def reference_camera_v2(aspect: float = 16.0 / 9.0) -> Camera:
    """The v2 compute-shader camera: lookFrom (13,2,3) -> origin, vfov 20,
    pinhole (the reference passes aperture=2.0 but its kernel ignores it —
    ref: CSVersion/DxCSApp.cpp:176-179,488-489; ShaderCompute.hlsl:118-127).
    """
    return make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0), vfov=20.0,
                       aspect=aspect, aperture=0.0)


def reference_camera_v1() -> Camera:
    """The v1 pixel-shader thin-lens camera: vfov 20, 4:3, aperture 0.1,
    focus dist 10 (ref: DXRayTrace.cpp:196-223)."""
    return make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0), vfov=20.0,
                       aspect=4.0 / 3.0, aperture=0.1, focus_dist=10.0)


def get_ray(cam: Camera, s, t, seed):
    """Generate one ray per (s, t); returns ((ox,oy,oz), (dx,dy,dz), seed).

    SoA form: s / t / seed are arrays of any common shape.  With
    ``lens_radius == 0`` this is the v2 pinhole ray
    (ref: CSVersion/ShaderCompute.hlsl:118-127) and the seed is untouched;
    otherwise the v1 thin-lens offset (ref: Shader_RT.fx:288-298) draws one
    disk sample (advancing the seed by one hash2 step).

    Directions are NOT normalized — the reference traces unnormalized rays
    (intersection divides by |d|^2, ref: ShaderCompute.hlsl:160-170).
    """
    defocus = cam.lens_radius > 0
    (dx_disk, dy_disk), seed_lens = rng.random_in_unit_disk(seed)
    seed = jnp.where(defocus, seed_lens, seed)
    rdx = cam.lens_radius * dx_disk
    rdy = cam.lens_radius * dy_disk
    # offset = u * rd.x + v * rd.y, zero when pinhole
    offx = jnp.where(defocus, cam.u[0] * rdx + cam.v[0] * rdy, 0.0)
    offy = jnp.where(defocus, cam.u[1] * rdx + cam.v[1] * rdy, 0.0)
    offz = jnp.where(defocus, cam.u[2] * rdx + cam.v[2] * rdy, 0.0)

    ox = cam.origin[0] + offx
    oy = cam.origin[1] + offy
    oz = cam.origin[2] + offz
    dx = cam.lower_left[0] + s * cam.horizontal[0] + t * cam.vertical[0] - ox
    dy = cam.lower_left[1] + s * cam.horizontal[1] + t * cam.vertical[1] - oy
    dz = cam.lower_left[2] + s * cam.horizontal[2] + t * cam.vertical[2] - oz
    return (ox, oy, oz), (dx, dy, dz), seed
