"""Dense hit-stage (megakernel.make_bounce_body `dense` branch) vs the
golden oracle.

The dense stage computes every sphere's quadratic as (n_pad, W) planes
and extracts the winner via sublane argmin + a one-hot MXU matmul.  It
is op-for-op golden.hit_world on identical fl(o - c) values, so the
megakernel is BIT-equal to golden in interpret mode; the wavefront
wrapper keeps its usual <= 1 ulp post-gamma bound (FMA-contraction
class, see tests/test_wavefront.py).
"""

import numpy as np
import pytest

import raytpu
from raytpu import golden
from raytpu.config import RenderConfig
from raytpu.kernels import megakernel
from raytpu.wavefront import render_wavefront

from test_wavefront import assert_ulp_equal


@pytest.fixture
def force_dense(monkeypatch):
    monkeypatch.setattr(megakernel, "_DENSE_MODE", "1")


def _cam(aspect):
    return raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                              vfov=20.0, aspect=aspect)


def test_dense_megakernel_bit_equal_golden(force_dense):
    cfg = RenderConfig(width=96, height=48, spp=2, depth=5)
    scene = raytpu.final_world()          # 500 spheres (n_pad = 504)
    cam = _cam(cfg.aspect)
    ref = np.asarray(golden.render_golden(scene, cam, cfg))
    img = np.asarray(megakernel.render_pallas(scene, cam, cfg,
                                              interpret=True))
    np.testing.assert_array_equal(img, ref)


def test_dense_wavefront_matches_golden(force_dense):
    cfg = RenderConfig(width=96, height=48, spp=2, depth=5)
    scene = raytpu.final_world()
    cam = _cam(cfg.aspect)
    ref = np.asarray(golden.render_golden(scene, cam, cfg))
    img = np.asarray(render_wavefront(scene, cam, cfg, interpret=True))
    assert_ulp_equal(img, ref)


def test_dense_small_scene_padding(force_dense):
    # n=4 spheres -> n_pad=8: half the rows are -3e38 pads that must
    # never win
    cfg = RenderConfig(width=64, height=40, spp=2, depth=6)
    scene = raytpu.test_world()
    cam = _cam(cfg.aspect)
    ref = np.asarray(golden.render_golden(scene, cam, cfg))
    img = np.asarray(megakernel.render_pallas(scene, cam, cfg,
                                              interpret=True))
    np.testing.assert_array_equal(img, ref)


def test_refill_bit_equal_sequential(monkeypatch):
    # the persistent-refill sample loop and the sequential per-sample
    # loop must produce BIT-identical images (same per-lane seed
    # chains and accumulation order) — the kernel picks by scene size
    cfg = RenderConfig(width=64, height=40, spp=3, depth=6)
    scene = raytpu.test_world()
    cam = _cam(cfg.aspect)
    monkeypatch.setattr(megakernel, "_REFILL_MIN", 10 ** 9)
    seq = np.asarray(megakernel.render_pallas(scene, cam, cfg,
                                              interpret=True))
    monkeypatch.setattr(megakernel, "_REFILL_MIN", 0)
    ref = np.asarray(megakernel.render_pallas(scene, cam, cfg,
                                              interpret=True))
    np.testing.assert_array_equal(seq, ref)
    # parallel RNG mode re-folds per sample; check that path too
    cfgp = RenderConfig(width=64, height=40, spp=3, depth=6,
                        rng_mode="parallel")
    monkeypatch.setattr(megakernel, "_REFILL_MIN", 10 ** 9)
    seqp = np.asarray(megakernel.render_pallas(scene, cam, cfgp,
                                               interpret=True))
    monkeypatch.setattr(megakernel, "_REFILL_MIN", 0)
    refp = np.asarray(megakernel.render_pallas(scene, cam, cfgp,
                                               interpret=True))
    np.testing.assert_array_equal(seqp, refp)


def test_multi_tile_refill_bit_equal(monkeypatch):
    # the MULTI-TILE persistent refill (one kernel instance owns mt
    # stacked row-tiles; lanes hop 8 rows down as their per-tile spp
    # budgets exhaust, flushing accumulators into the output block by
    # predicated RMW) must be bit-identical to the single-tile refill
    # loop and to golden — seeds re-derive from absolute pixel coords
    cfgp = RenderConfig(width=64, height=40, spp=3, depth=6,
                        rng_mode="parallel")
    scene = raytpu.test_world()
    cam = _cam(cfgp.aspect)
    monkeypatch.setattr(megakernel, "_REFILL_MIN", 0)
    monkeypatch.setattr(megakernel, "_MULTI_TILE", 8)  # 40/8=5 -> mt=5
    mt = np.asarray(megakernel.render_pallas(scene, cam, cfgp,
                                             interpret=True))
    monkeypatch.setattr(megakernel, "_MULTI_TILE", 1)
    single = np.asarray(megakernel.render_pallas(scene, cam, cfgp,
                                                 interpret=True))
    np.testing.assert_array_equal(mt, single)
    np.testing.assert_array_equal(
        mt, np.asarray(golden.render_golden(scene, cam, cfgp)))

    # defocus camera: the respawn's jitter/lens RNG order and the fy
    # row-hop must survive the thin-lens raygen path
    cam_dof = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                                 vfov=20.0, aspect=cfgp.aspect,
                                 aperture=0.4, focus_dist=10.0)
    monkeypatch.setattr(megakernel, "_MULTI_TILE", 8)
    mt_d = np.asarray(megakernel.render_pallas(scene, cam_dof, cfgp,
                                               interpret=True))
    np.testing.assert_array_equal(
        mt_d, np.asarray(golden.render_golden(scene, cam_dof, cfgp)))

    # BVH flat (t, idx) path with an outlier-split ground sphere, via
    # the default square-block tiling (block_w=32: hop = block_h = 32
    # pixel rows, outputs unscrambled from block layout)
    from raytpu.bvh import build_bvh
    big = raytpu.random_world(half_extent=2)
    b = build_bvh(big, leaf_size=8)
    mt_b = np.asarray(megakernel.render_pallas(
        big, cam, cfgp, interpret=True, bvh=b))
    np.testing.assert_array_equal(
        mt_b, np.asarray(golden.render_golden(big, cam, cfgp)))


def test_fuzz_scenes_all_hit_modes_match_golden(monkeypatch):
    # randomized scenes with hollow-glass negative radii, tiny and
    # huge spheres: every hit mode (brute loop, flat tidx, flat
    # non-tidx, dense) must stay bit-equal to golden in interpret mode
    from raytpu.bvh import build_bvh
    from raytpu.scene import Scene
    rng = np.random.default_rng(7)
    cfg = RenderConfig(width=48, height=32, spp=2, depth=4)
    cam = _cam(cfg.aspect)
    for trial in range(2):
        n = 60
        center = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
        center[:, 1] = rng.uniform(0.2, 2.0, n)
        radius = rng.uniform(0.1, 1.0, n).astype(np.float32)
        radius[: n // 6] *= -1.0                 # hollow glass shells
        radius[n // 6] = 50.0                    # a huge one
        radius[n // 6 + 1] = 1e-3                # a tiny one
        mat = rng.integers(0, 3, n).astype(np.int32)
        mat[: n // 6] = 2                        # negatives are glass
        scene = Scene(
            center=np.asarray(center),
            radius=np.asarray(radius),
            mat_type=np.asarray(mat),
            albedo=rng.uniform(0, 1, (n, 3)).astype(np.float32),
            mat_param=rng.uniform(0, 1.6, n).astype(np.float32),
        )
        ref = np.asarray(golden.render_golden(scene, cam, cfg))
        b = build_bvh(scene)
        flat = np.asarray(megakernel.render_pallas(
            scene, cam, cfg, bvh=b, interpret=True))
        np.testing.assert_array_equal(flat, ref, err_msg=f"flat {trial}")
        brute = np.asarray(megakernel.render_pallas(
            scene, cam, cfg, interpret=True))
        np.testing.assert_array_equal(brute, ref,
                                      err_msg=f"brute {trial}")
        monkeypatch.setattr(megakernel, "_DENSE_MODE", "1")
        dense = np.asarray(megakernel.render_pallas(
            scene, cam, cfg, interpret=True))
        monkeypatch.setattr(megakernel, "_DENSE_MODE", "0")
        np.testing.assert_array_equal(dense, ref,
                                      err_msg=f"dense {trial}")


def test_flat_without_tidx_bit_equal(monkeypatch):
    # RAYTPU_TIDX=0 selects the 10-attribute predicated flat sweep —
    # keep the fallback path pinned to golden
    from raytpu.bvh import build_bvh
    cfg = RenderConfig(width=96, height=48, spp=2, depth=4)
    scene = raytpu.final_world()
    cam = _cam(cfg.aspect)
    b = build_bvh(scene)
    monkeypatch.setattr(megakernel, "_TIDX", False)
    img = np.asarray(megakernel.render_pallas(scene, cam, cfg, bvh=b,
                                              interpret=True))
    ref = np.asarray(golden.render_golden(scene, cam, cfg))
    np.testing.assert_array_equal(img, ref)


def test_refill_bit_equal_defocus(monkeypatch):
    # thin-lens raygen consumes extra RNG draws conditionally — the
    # refill respawn path must reproduce the sequential loop exactly
    cfg = RenderConfig(width=64, height=40, spp=3, depth=5)
    scene = raytpu.test_world()
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                             vfov=20.0, aspect=cfg.aspect,
                             aperture=0.6, focus_dist=10.0)
    monkeypatch.setattr(megakernel, "_REFILL_MIN", 10 ** 9)
    seq = np.asarray(megakernel.render_pallas(scene, cam, cfg,
                                              interpret=True))
    monkeypatch.setattr(megakernel, "_REFILL_MIN", 0)
    ref = np.asarray(megakernel.render_pallas(scene, cam, cfg,
                                              interpret=True))
    np.testing.assert_array_equal(seq, ref)


@pytest.mark.parametrize("rng_mode", ["sequential", "parallel"])
def test_refill_bit_equal_progressive_carry(monkeypatch, rng_mode):
    # the refill loop's carried-state contract (seed chains, carried
    # accumulators, dyn_s0 batch offsets) must match the sequential
    # loop's across progressive batches
    from raytpu import progressive
    cfg = RenderConfig(width=48, height=32, spp=4, depth=4,
                       rng_mode=rng_mode)
    scene = raytpu.test_world()
    cam = _cam(cfg.aspect)

    def run():
        imgs = [img for _, img in progressive.render_progressive(
            scene, cam, cfg, batch=2, backend="pallas")]
        return np.asarray(imgs[-1])

    monkeypatch.setattr(megakernel, "_REFILL_MIN", 10 ** 9)
    seq = run()
    monkeypatch.setattr(megakernel, "_REFILL_MIN", 0)
    ref = run()
    np.testing.assert_array_equal(seq, ref)


def test_dense_ignores_bvh(force_dense):
    # a provided BVH is bypassed (dense tests every sphere); image
    # must be identical either way
    from raytpu.bvh import build_bvh
    cfg = RenderConfig(width=64, height=32, spp=2, depth=4)
    scene = raytpu.random_world(half_extent=3)
    cam = _cam(cfg.aspect)
    b = build_bvh(scene)
    with_bvh = np.asarray(megakernel.render_pallas(
        scene, cam, cfg, bvh=b, interpret=True))
    without = np.asarray(megakernel.render_pallas(
        scene, cam, cfg, interpret=True))
    np.testing.assert_array_equal(with_bvh, without)


def test_skip_pointer_with_outlier_split_bit_equal(monkeypatch):
    # _FLAT_MAX_LEAVES = 0 forces the skip-pointer octant walk; the
    # split-out ground sphere must still be tested (outlier prologue on
    # the while-loop path), pinned to golden
    from raytpu.bvh import build_bvh
    cfg = RenderConfig(width=96, height=48, spp=2, depth=4)
    scene = raytpu.final_world()
    cam = _cam(cfg.aspect)
    b = build_bvh(scene)
    assert b.n_outliers == 1
    monkeypatch.setattr(megakernel, "_FLAT_MAX_LEAVES", 0)
    img = np.asarray(megakernel.render_pallas(scene, cam, cfg, bvh=b,
                                              interpret=True))
    ref = np.asarray(golden.render_golden(scene, cam, cfg))
    np.testing.assert_array_equal(img, ref)


def test_gradkernel_skip_pointer_outlier_split(monkeypatch):
    # same forcing for the VJP kernel's closest_hit while-loop path
    from raytpu import bvh as bvh_mod
    from raytpu.kernels import gradkernel
    import jax
    import jax.numpy as jnp
    cfg = RenderConfig(width=64, height=16, spp=1, depth=3)
    scene = raytpu.random_world(seed=3, half_extent=3)
    cam = _cam(cfg.aspect)
    ref = golden.render_golden(scene, cam, cfg)
    ct = 2.0 * np.asarray(ref) / ref.size
    b = bvh_mod.build_bvh(scene, leaf_size=4)
    assert b.n_outliers == 1
    monkeypatch.setattr(gradkernel, "_FLAT_MAX_LEAVES", 0)
    img, ds, dc = gradkernel.render_pallas_vjp(scene, cam, cfg, ct,
                                               bvh=b)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=1e-5)

    def loss(s, c):
        return jnp.mean((golden.render_golden(s, c, cfg)) ** 2)

    gs, _ = jax.grad(loss, argnums=(0, 1), allow_int=True)(scene, cam)
    for k in ("center", "radius", "albedo", "mat_param"):
        a, bb = np.asarray(getattr(ds, k)), np.asarray(getattr(gs, k))
        scale = max(np.abs(bb).max(), 1e-8)
        assert np.abs(a - bb).max() / scale < 1e-4, k


def test_sequential_multi_tile_bit_equal(monkeypatch):
    """Multi-tile refill grouping under SEQUENTIAL RNG (round 3): a
    tile hop starts the new pixel's chain at its base seed, an in-tile
    respawn continues the lane's chain — images must stay bit-identical
    to the single-tile layout."""
    from raytpu.kernels import megakernel as mk
    from raytpu.bvh import build_bvh
    monkeypatch.setattr(mk, "_REFILL_MIN", 0)
    scene = raytpu.config2_world()
    bvh = build_bvh(scene)
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                             vfov=20.0, aspect=2.0)
    cfg = RenderConfig(width=128, height=64, spp=3, depth=4)
    assert mk._mt_for(64, 32, cfg, scene.count) > 1
    img_mt = np.asarray(mk._render_pallas_fwd_impl(
        scene, cam, cfg, True, bvh.nodes, bvh.perm, block_w=32,
        leaf_size=bvh.leaf_size, flat=bvh.flat))
    monkeypatch.setattr(mk, "_MULTI_TILE", 1)
    img_1 = np.asarray(mk._render_pallas_fwd_impl(
        scene, cam, cfg, True, bvh.nodes, bvh.perm, block_w=32,
        leaf_size=bvh.leaf_size, flat=bvh.flat))
    np.testing.assert_array_equal(img_mt, img_1)
