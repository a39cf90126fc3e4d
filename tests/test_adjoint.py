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


def test_silhouette_gradients_match_fd_direction():
    """vis_w > 0: the loss gradient gains the visibility term — its
    directional derivative along a silhouette-crossing direction agrees
    with finite differences (which interior-only gradients miss by ~400x).
    """
    cfg = RenderConfig(width=96, height=48, spp=4, depth=4)
    scene_true = raytpu.make_scene([
        ((0.0, -100.5, -1.0), 100.0, 0, (0.5, 0.5, 0.5), 0.0),
        ((0.0, 0.0, -1.0), 0.5, 0, (0.7, 0.3, 0.3), 0.0),
    ])
    cam = raytpu.make_camera((0.0, 0.3, 1.5), (0.0, 0.0, -1.0), vfov=45.0,
                             aspect=cfg.aspect, aperture=0.25,
                             focus_dist=2.5)
    target = adjoint.render_golden_adjoint(scene_true, cam, cfg)
    scene0 = scene_true._replace(
        center=scene_true.center.at[1].add(
            jnp.asarray([0.12, 0.0, 0.08])))

    def loss_w(center, w):
        img = adjoint.render_golden_adjoint(
            scene0._replace(center=center), cam, cfg, w)
        return jnp.mean((img - target) ** 2)

    d = scene_true.center[1] - scene0.center[1]
    d = d / jnp.linalg.norm(d)

    # FD of the (hard) loss along the recovery direction
    eps = 1e-2
    fd = (float(loss_w(scene0.center.at[1].add(eps * d), 0.0))
          - float(loss_w(scene0.center.at[1].add(-eps * d), 0.0))) / (
              2 * eps)

    g_soft = jax.grad(lambda c: loss_w(c, 0.005))(scene0.center)
    dd_soft = float(jnp.dot(g_soft[1], d))
    g_hard = jax.grad(lambda c: loss_w(c, 0.0))(scene0.center)
    dd_hard = float(jnp.dot(g_hard[1], d))

    assert fd < -1e-3  # moving toward truth decreases the loss
    # interior-only gradient misses the visibility term entirely
    assert abs(dd_hard) < 0.1 * abs(fd)
    # boundary-augmented gradient recovers it (sign + order of magnitude)
    assert dd_soft < 0
    assert 0.3 * abs(fd) < abs(dd_soft) < 3.0 * abs(fd)


def test_position_recovery_with_silhouette_gradients():
    """BASELINE config 3 (scaled down): defocus camera + gradient descent
    on sphere positions recovers a perturbed center."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "inverse_render",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "examples", "inverse_render.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    cfg, scene_true, scene0, cam, target = m.make_problem()
    err0 = float(jnp.linalg.norm(scene0.center[1] - scene_true.center[1]))
    scene, losses = m.optimize(cfg, scene0, cam, target, steps=60)
    err1 = float(jnp.linalg.norm(scene.center[1] - scene_true.center[1]))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    assert err1 < 0.6 * err0, (err0, err1)
