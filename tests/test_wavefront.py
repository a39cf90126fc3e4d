"""Sorted-wavefront renderer vs the golden oracle.

The wavefront path reorders rays arbitrarily between bounce segments;
these tests prove the reordering is value-neutral: per-ray math, RNG
streams and per-pixel accumulation order are identical to golden's.
Pre-gamma linear sums are bit-identical; the gamma'd output may differ
by 1 ulp on a small fraction of pixels because XLA contracts `a - b*c`
into FMA differently across fusion contexts (--xla_allow_excess
-precision; same class as TODO.md's adjoint note), so the assertion is
"<= 1 ulp and almost all pixels bit-equal".
"""

import numpy as np
import pytest


def assert_ulp_equal(img, ref, frac_exact=0.9):
    assert img.shape == ref.shape
    np.testing.assert_allclose(img, ref, rtol=0, atol=2.5e-7)
    assert (img == ref).mean() >= frac_exact

import raytpu
from raytpu import golden
from raytpu.bvh import build_bvh
from raytpu.config import RenderConfig
from raytpu.wavefront import render_wavefront


def _cam(aspect):
    return raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                              vfov=20.0, aspect=aspect)


@pytest.mark.parametrize("segments", [None, (1, 1, 3), (5,)])
def test_matches_golden_small(segments):
    cfg = RenderConfig(width=96, height=64, spp=3, depth=5)
    scene = raytpu.test_world()
    cam = _cam(cfg.aspect)
    ref = np.asarray(golden.render_golden(scene, cam, cfg))
    img = np.asarray(render_wavefront(scene, cam, cfg, segments=segments))
    assert_ulp_equal(img, ref)


def test_matches_golden_bvh():
    cfg = RenderConfig(width=96, height=64, spp=2, depth=6)
    scene = raytpu.random_world(half_extent=3)
    cam = _cam(cfg.aspect)
    b = build_bvh(scene)
    ref = np.asarray(golden.render_golden(scene, cam, cfg))
    img = np.asarray(render_wavefront(scene, cam, cfg, bvh=b))
    assert_ulp_equal(img, ref)


def test_matches_golden_parallel_rng():
    cfg = RenderConfig(width=64, height=40, spp=3, depth=4,
                       rng_mode="parallel")
    scene = raytpu.test_world()
    cam = _cam(cfg.aspect)
    ref = np.asarray(golden.render_golden(scene, cam, cfg))
    img = np.asarray(render_wavefront(scene, cam, cfg))
    assert_ulp_equal(img, ref)


def test_matches_golden_defocus():
    cfg = RenderConfig(width=64, height=48, spp=2, depth=4)
    scene = raytpu.test_world()
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                             vfov=20.0, aspect=cfg.aspect,
                             aperture=0.6, focus_dist=10.0)
    ref = np.asarray(golden.render_golden(scene, cam, cfg))
    img = np.asarray(render_wavefront(scene, cam, cfg))
    assert_ulp_equal(img, ref)


def test_chunked_sort_matches_golden():
    """sort_chunk partitions the sort into independent tile-aligned
    chunks; the image is permutation-invariant so chunking must be
    value-neutral (and the reconstructed alive plane exact)."""
    cfg = RenderConfig(width=96, height=64, spp=2, depth=6,
                       rng_mode="parallel")
    scene = raytpu.random_world(half_extent=3)
    cam = _cam(cfg.aspect)
    b = build_bvh(scene)
    ref = np.asarray(golden.render_golden(scene, cam, cfg))
    # R = 96x64 = 6144 rays -> sort_chunk=1024 gives 6 real chunks
    img = np.asarray(render_wavefront(scene, cam, cfg, bvh=b,
                                      sort_chunk=1024, spp_batch=2))
    assert_ulp_equal(img, ref)
    mono = np.asarray(render_wavefront(scene, cam, cfg, bvh=b,
                                       sort_chunk=0, spp_batch=2))
    np.testing.assert_array_equal(img, mono)


def test_nonaligned_size_and_depth1():
    cfg = RenderConfig(width=70, height=45, spp=2, depth=1)
    scene = raytpu.test_world()
    cam = _cam(cfg.aspect)
    ref = np.asarray(golden.render_golden(scene, cam, cfg))
    img = np.asarray(render_wavefront(scene, cam, cfg))
    assert_ulp_equal(img, ref)
