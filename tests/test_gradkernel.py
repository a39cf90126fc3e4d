"""Fused Pallas VJP kernel (interpret mode) vs generic autodiff."""

import numpy as np
import jax
import jax.numpy as jnp

import raytpu
from raytpu import golden
from raytpu.kernels import gradkernel
from raytpu.config import RenderConfig


def _check(cfg, cam_kw, worst_allowed=1e-4):
    scene = raytpu.test_world()
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0), vfov=20.0,
                             aspect=cfg.aspect, **cam_kw)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    img_ref = golden.render_golden(scene, cam, cfg)
    ct = 2.0 * (img_ref - target) / img_ref.size
    img, ds, dc = gradkernel.render_pallas_vjp(scene, cam, cfg, ct)

    def loss(s, c):
        return jnp.mean((golden.render_golden(s, c, cfg) - target) ** 2)

    gs, gc = jax.grad(loss, argnums=(0, 1), allow_int=True)(scene, cam)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                               atol=1e-5)
    for k in ("center", "radius", "albedo", "mat_param"):
        a, b = np.array(getattr(ds, k)), np.array(getattr(gs, k))
        scale = max(np.abs(b).max(), 1e-8)
        assert np.abs(a - b).max() / scale < worst_allowed, k
    for k in ("origin", "horizontal", "vertical", "lower_left",
              "u", "v", "lens_radius"):
        a, b = np.array(getattr(dc, k)), np.array(getattr(gc, k))
        scale = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / scale < worst_allowed, k


def test_pinhole_sequential():
    _check(RenderConfig(width=32, height=16, spp=2, depth=3), {})


def test_defocus_sequential():
    _check(RenderConfig(width=32, height=16, spp=2, depth=3),
           dict(aperture=0.3, focus_dist=12.0))


def test_pinhole_parallel():
    _check(RenderConfig(width=32, height=16, spp=2, depth=3,
                        rng_mode="parallel"), {})


def test_defocus_parallel():
    _check(RenderConfig(width=32, height=16, spp=3, depth=4,
                        rng_mode="parallel"),
           dict(aperture=0.2, focus_dist=10.0), worst_allowed=5e-4)


def test_pass1_elision_bit_matches():
    """img= supplied + parallel RNG elides the kernel's PASS-1 forward;
    the gradients must be BIT-identical to the two-pass kernel (same
    seeds by fold_in, same PASS-2 math; only the redundant forward and
    the idx-replay scheme drop out)."""
    cfg = RenderConfig(width=64, height=16, spp=2, depth=3,
                       rng_mode="parallel")
    scene = raytpu.test_world()
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0), vfov=20.0,
                             aspect=cfg.aspect)
    img_fwd = raytpu.render(scene, cam, cfg, backend="pallas")
    ct = 2.0 * (img_fwd - 0.25) / img_fwd.size
    img0, ds0, dc0 = gradkernel.render_pallas_vjp(scene, cam, cfg, ct)
    # p2_refill=False isolates the elision mechanics this test pins:
    # with the refill PASS 2 (the production default) accumulation
    # order differs, which is covered by the p2_refill tests below
    img1, ds1, dc1 = gradkernel.render_pallas_vjp(scene, cam, cfg, ct,
                                                  img=img_fwd,
                                                  p2_refill=False)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    for k in ("center", "radius", "albedo", "mat_param"):
        np.testing.assert_array_equal(np.array(getattr(ds0, k)),
                                      np.array(getattr(ds1, k)), err_msg=k)
    for k in ("origin", "horizontal", "vertical", "lower_left",
              "u", "v", "lens_radius"):
        np.testing.assert_array_equal(np.array(getattr(dc0, k)),
                                      np.array(getattr(dc1, k)), err_msg=k)


def test_multi_tile_accumulation():
    """Grid > 1 tile in both dims: the scratch accumulator must span
    every grid step."""
    _check(RenderConfig(width=200, height=24, spp=1, depth=2), {})


def test_bvh_path_matches_autodiff():
    """BVH traversal in the fused VJP kernel: gradients return in the
    ORIGINAL sphere order and match autodiff."""
    from raytpu import bvh as bvh_mod
    cfg = RenderConfig(width=64, height=16, spp=1, depth=3)
    scene = raytpu.random_world(seed=3, half_extent=3)
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0), vfov=20.0,
                             aspect=cfg.aspect)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    img_ref = golden.render_golden(scene, cam, cfg)
    ct = 2.0 * (img_ref - target) / img_ref.size
    b = bvh_mod.build_bvh(scene, leaf_size=4)
    img, ds, dc = gradkernel.render_pallas_vjp(scene, cam, cfg, ct, bvh=b)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                               atol=1e-5)

    def loss(s, c):
        return jnp.mean((golden.render_golden(s, c, cfg) - target) ** 2)

    gs, _ = jax.grad(loss, argnums=(0, 1), allow_int=True)(scene, cam)
    for k in ("center", "radius", "albedo", "mat_param"):
        a, bb = np.array(getattr(ds, k)), np.array(getattr(gs, k))
        scale = max(np.abs(bb).max(), 1e-8)
        assert np.abs(a - bb).max() / scale < 1e-4, k


def test_silhouette_vis_w_matches_adjoint():
    """vis_w > 0 in the fused kernel reproduces the XLA adjoint's
    silhouette (boundary) gradients — hit-side and near-miss terms."""
    from raytpu import adjoint
    cfg = RenderConfig(width=64, height=32, spp=2, depth=3)
    scene = raytpu.make_scene([
        ((0.0, -100.5, -1.0), 100.0, 0, (0.5, 0.5, 0.5), 0.0),
        ((0.0, 0.0, -1.0), 0.5, 0, (0.7, 0.3, 0.3), 0.0),
        ((0.7, 0.1, -1.2), 0.4, 1, (0.8, 0.6, 0.2), 0.1),
    ])
    cam = raytpu.make_camera((0.0, 0.3, 1.5), (0.0, 0.0, -1.0), vfov=45.0,
                             aspect=cfg.aspect, aperture=0.25,
                             focus_dist=2.5)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    vis_w = 0.005

    img_ref = golden.render_golden(scene, cam, cfg)
    ct = 2.0 * (img_ref - target) / img_ref.size
    _, ds, _ = gradkernel.render_pallas_vjp(scene, cam, cfg, ct,
                                            vis_w=vis_w)

    def loss(s):
        img = adjoint.render_golden_adjoint(s, cam, cfg, vis_w)
        return jnp.mean((img - target) ** 2)

    gs = jax.grad(loss, allow_int=True)(scene)
    for k in ("center", "radius"):
        a, b = np.array(getattr(ds, k)), np.array(getattr(gs, k))
        scale = max(np.abs(b).max(), 1e-8)
        assert np.abs(a - b).max() / scale < 2e-3, (
            k, np.abs(a - b).max() / scale)
    # the boundary terms must actually be present (differ from vis_w=0)
    _, ds0, _ = gradkernel.render_pallas_vjp(scene, cam, cfg, ct)
    assert np.abs(np.array(ds.center) - np.array(ds0.center)).max() > 1e-6


def _compare_p2_modes(cfg, cam_kw={}, vis_w=0.0, scene=None,
                      use_bvh=False, tol=3e-5):
    """Refill PASS 2 (windowed persistent refill) vs per-sample PASS 2:
    same skip_p1 kernel, same seeds — gradients agree to reordering
    noise (the (sample, bounce) terms add in global-step order)."""
    from raytpu.bvh import build_bvh
    scene = scene if scene is not None else raytpu.test_world()
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                             vfov=20.0, aspect=cfg.aspect, **cam_kw)
    bvh = build_bvh(scene) if use_bvh else None
    img = golden.render_golden(scene, cam, cfg)
    ct = 2.0 * (img - 0.25) / img.size
    img0, ds0, dc0 = gradkernel.render_pallas_vjp(
        scene, cam, cfg, ct, img=img, p2_refill=False, vis_w=vis_w,
        bvh=bvh)
    img1, ds1, dc1 = gradkernel.render_pallas_vjp(
        scene, cam, cfg, ct, img=img, p2_refill=True, vis_w=vis_w,
        bvh=bvh)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    for o1, o0, keys in (
            (ds1, ds0, ("center", "radius", "albedo", "mat_param")),
            (dc1, dc0, ("origin", "horizontal", "vertical",
                        "lower_left", "u", "v", "lens_radius"))):
        for k in keys:
            a, b = np.asarray(getattr(o1, k)), np.asarray(getattr(o0, k))
            scale = max(np.abs(b).max(), 1e-8)
            assert np.abs(a - b).max() / scale < tol, (
                k, np.abs(a - b).max() / scale)


def test_p2_refill_matches_per_sample():
    _compare_p2_modes(RenderConfig(width=64, height=16, spp=3, depth=4,
                                   rng_mode="parallel"))


def test_p2_refill_windows_park_and_resume(monkeypatch):
    """A residual buffer that fits ~1 sample forces lanes to park at
    sample boundaries and the outer window loop to resume them."""
    monkeypatch.setattr(gradkernel, "_P2_VMEM_BUDGET", 5 * 13 * 4096)
    _compare_p2_modes(RenderConfig(width=64, height=16, spp=6, depth=4,
                                   rng_mode="parallel"))


def test_p2_refill_defocus_vis_w_bvh():
    """Lens draws through respawn/camera sums, silhouette terms, and
    the BVH (outlier-split) closest-hit stage under the refill loop."""
    _compare_p2_modes(RenderConfig(width=64, height=16, spp=2, depth=3,
                                   rng_mode="parallel"),
                      dict(aperture=0.3, focus_dist=12.0),
                      vis_w=1e-3)
    _compare_p2_modes(RenderConfig(width=64, height=16, spp=2, depth=3,
                                   rng_mode="parallel"),
                      scene=raytpu.config2_world(), use_bvh=True)


def test_p2_refill_multi_tile(monkeypatch):
    """Multi-tile grouping in the refill PASS 2: lanes hop group tiles
    (per-tile pixel seeds + dacc selection + hopped raygen rows)."""
    from raytpu.kernels import megakernel
    monkeypatch.setattr(megakernel, "_REFILL_MIN", 0)
    _compare_p2_modes(RenderConfig(width=128, height=64, spp=3, depth=4,
                                   rng_mode="parallel"),
                      scene=raytpu.config2_world(), use_bvh=True)
    _compare_p2_modes(RenderConfig(width=128, height=64, spp=2, depth=3,
                                   rng_mode="parallel"),
                      dict(aperture=0.3, focus_dist=12.0),
                      scene=raytpu.config2_world(), use_bvh=True,
                      vis_w=1e-3)
