"""Hand-structured adjoint (raytpu/adjoint.py) vs generic autodiff."""

import numpy as np
import jax
import jax.numpy as jnp

import raytpu
from raytpu import golden, adjoint
from raytpu.config import RenderConfig


CFG = RenderConfig(width=32, height=16, spp=2, depth=4)


def _setup(aperture=0.0):
    scene = raytpu.test_world()
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0), vfov=20.0,
                             aspect=CFG.aspect, aperture=aperture)
    return scene, cam


def test_forward_bit_identical():
    scene, cam = _setup()
    a = np.asarray(adjoint.render_golden_adjoint(scene, cam, CFG))
    b = np.asarray(golden.render_golden(scene, cam, CFG))
    np.testing.assert_array_equal(a, b)


def _grads(render_fn, scene, cam, cfg):
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    def loss(s, c):
        return jnp.mean((render_fn(s, c, cfg) - target) ** 2)

    return jax.grad(loss, argnums=(0, 1), allow_int=True)(scene, cam)


def test_gradients_match_autodiff():
    scene, cam = _setup()
    ga = _grads(adjoint.render_golden_adjoint, scene, cam, CFG)
    gg = _grads(golden.render_golden, scene, cam, CFG)
    for k in ("center", "radius", "albedo", "mat_param"):
        np.testing.assert_allclose(np.asarray(getattr(ga[0], k)),
                                   np.asarray(getattr(gg[0], k)),
                                   rtol=1e-4, atol=1e-8)
    for k in ("origin", "horizontal", "vertical", "lower_left",
              "lens_radius"):
        np.testing.assert_allclose(np.asarray(getattr(ga[1], k)),
                                   np.asarray(getattr(gg[1], k)),
                                   rtol=1e-4, atol=1e-8)


def test_gradients_match_autodiff_defocus_many_spheres():
    cfg = RenderConfig(width=24, height=12, spp=1, depth=3)
    scene = raytpu.random_world(seed=7, half_extent=3)
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0), vfov=20.0,
                             aspect=cfg.aspect, aperture=0.3, focus_dist=12.0)
    ga = _grads(adjoint.render_golden_adjoint, scene, cam, cfg)
    gg = _grads(golden.render_golden, scene, cam, cfg)
    for k in ("center", "radius", "albedo", "mat_param"):
        np.testing.assert_allclose(np.asarray(getattr(ga[0], k)),
                                   np.asarray(getattr(gg[0], k)),
                                   rtol=1e-4, atol=1e-8)
