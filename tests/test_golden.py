"""Golden renderer vs the independent scalar HLSL transcription, plus
basic image sanity (determinism, range, sky)."""

import numpy as np
import jax.numpy as jnp

import raytpu
from raytpu import golden
from raytpu.config import RenderConfig
import hlsl_ref


def _cam_dict(cam):
    return {
        "origin": np.asarray(cam.origin, np.float64),
        "horizontal": np.asarray(cam.horizontal, np.float64),
        "vertical": np.asarray(cam.vertical, np.float64),
        "lower_left": np.asarray(cam.lower_left, np.float64),
        "u": np.asarray(cam.u, np.float64),
        "v": np.asarray(cam.v, np.float64),
        "lens_radius": float(cam.lens_radius),
    }


def _scene_dict(scene):
    return {
        "center": np.asarray(scene.center, np.float64),
        "radius": np.asarray(scene.radius, np.float64),
        "mat_type": np.asarray(scene.mat_type),
        "albedo": np.asarray(scene.albedo, np.float64),
        "mat_param": np.asarray(scene.mat_param, np.float64),
    }


def _compare_pixels(scene, cam, cfg, n_pix=24, seed=0, atol=5e-3,
                    allow_outliers=0):
    img = np.asarray(golden.render_golden(scene, cam, cfg))
    rs = np.random.default_rng(seed)
    xs = rs.integers(0, cfg.width, n_pix)
    ys = rs.integers(0, cfg.height, n_pix)
    sd, cd = _scene_dict(scene), _cam_dict(cam)
    bad = 0
    for x, y in zip(xs, ys):
        want = hlsl_ref.render_pixel(sd, cd, int(x), int(y), cfg.width,
                                     cfg.height, cfg.spp, cfg.depth)
        got = img[int(y), int(x)]
        if not np.allclose(got, want, atol=atol):
            bad += 1
    assert bad <= allow_outliers, (
        f"{bad}/{n_pix} pixels deviate from scalar HLSL reference")
    return img


def test_config1_matches_scalar_reference():
    cfg = RenderConfig(width=80, height=40, spp=4, depth=4)
    scene = raytpu.config1_world()
    cam = raytpu.make_camera((0.0, 0.2, 1.0), (0.0, 0.0, -1.0), vfov=60.0,
                             aspect=cfg.aspect)
    img = _compare_pixels(scene, cam, cfg)
    assert img.shape == (40, 80, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all() and (img <= 1).all()


def test_test_world_matches_scalar_reference():
    """Includes metal + dielectric; f32-vs-f64 chaos means a rare pixel may
    take a different Schlick branch — allow one outlier."""
    cfg = RenderConfig(width=64, height=36, spp=4, depth=8)
    scene = raytpu.test_world()
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0), vfov=20.0,
                             aspect=cfg.aspect)
    _compare_pixels(scene, cam, cfg, n_pix=24, atol=1e-2, allow_outliers=1)


def test_defocus_camera_matches_scalar_reference():
    """v1 thin-lens defocus semantics (ref: Shader_RT.fx:288-298)."""
    cfg = RenderConfig(width=64, height=36, spp=4, depth=4)
    scene = raytpu.config1_world()
    cam = raytpu.make_camera((0.0, 0.5, 2.0), (0.0, 0.0, -1.0), vfov=40.0,
                             aspect=cfg.aspect, aperture=0.4, focus_dist=3.0)
    _compare_pixels(scene, cam, cfg, n_pix=16, atol=1e-2, allow_outliers=1)


def test_deterministic():
    cfg = RenderConfig(width=32, height=16, spp=2, depth=3)
    scene = raytpu.test_world()
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                             aspect=cfg.aspect)
    a = np.asarray(golden.render_golden(scene, cam, cfg))
    b = np.asarray(golden.render_golden(scene, cam, cfg))
    np.testing.assert_array_equal(a, b)


def test_chunking_invariance():
    """Image is identical regardless of the lax.map chunk size."""
    scene = raytpu.test_world()
    cfg_a = RenderConfig(width=40, height=24, spp=2, depth=4, chunk_pixels=64)
    cfg_b = RenderConfig(width=40, height=24, spp=2, depth=4, chunk_pixels=960)
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                             aspect=cfg_a.aspect)
    a = np.asarray(golden.render_golden(scene, cam, cfg_a))
    b = np.asarray(golden.render_golden(scene, cam, cfg_b))
    np.testing.assert_array_equal(a, b)


def test_sky_only():
    """Camera aimed at empty sky: every pixel is the gamma'd gradient."""
    cfg = RenderConfig(width=16, height=8, spp=1, depth=3)
    scene = raytpu.make_scene(
        [((0.0, -10000.0, 0.0), 1.0, 0, (0.5, 0.5, 0.5), 0.0)])
    cam = raytpu.make_camera((0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                             vup=(0.0, 0.0, -1.0), aspect=cfg.aspect)
    img = np.asarray(golden.render_golden(scene, cam, cfg))
    # straight up: t = 0.5*(1+1) = 1 -> sky = (0.5, 0.7, 1.0)
    want = np.array([0.5, 0.7, 1.0]) ** (1 / 2.2)
    mid = img[4, 8]
    np.testing.assert_allclose(mid, want, atol=2e-2)
