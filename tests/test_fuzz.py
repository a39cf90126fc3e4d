"""Randomized cross-backend consistency fuzz (SURVEY.md §4: interpret
-mode bit-equality is the miscompile/race detector).

A seeded sweep over the config space — sizes (odd/prime dims hit the
tile-padding edges), spp/depth (degenerate loop bounds), both scatter
generations, both RNG modes, pinhole/thin-lens, gamma, brute force vs
BVH traversal at several leaf sizes — asserting the Pallas kernel is
BIT-identical to golden on every draw.  A final pair of draws pulls
gradients through the fused VJP and checks them against golden's.

Complements the targeted tests: those pin known-tricky layouts; this
guards the combinations nobody thought to pin.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import raytpu
from raytpu import golden
from raytpu import bvh as bvh_mod
from raytpu.config import RenderConfig
from raytpu.kernels import megakernel


def _draw(rng):
    width = int(rng.randint(8, 168))
    height = int(rng.randint(8, 88))
    cfg = RenderConfig(
        width=width,
        height=height,
        spp=int(rng.randint(1, 4)),
        depth=int(rng.randint(1, 6)),
        gamma=float(rng.choice([2.2, 2.0])),
        scatter_mode=str(rng.choice(["v2", "v1"])),
        rng_mode=str(rng.choice(["sequential", "parallel"])),
    )
    if rng.rand() < 0.5:
        scene = raytpu.test_world()
    else:
        scene = raytpu.random_world(seed=int(rng.randint(0, 1000)),
                                    half_extent=int(rng.randint(2, 5)))
    aperture = float(rng.choice([0.0, 0.0, 0.3]))
    cam = raytpu.make_camera(
        (13.0, 2.0, 3.0), (0.0, 0.0, 0.0), vfov=20.0, aspect=cfg.aspect,
        aperture=aperture, focus_dist=10.0 if aperture else None)
    bvh = None
    if scene.count > 8 and rng.rand() < 0.6:
        bvh = bvh_mod.build_bvh(
            scene, leaf_size=int(rng.choice([4, 8, 16])))
    return cfg, scene, cam, bvh


@pytest.mark.parametrize("case", range(12))
def test_fuzz_interpret_bit_identical(case):
    rng = np.random.RandomState(1000 + case)
    cfg, scene, cam, bvh = _draw(rng)
    want = np.asarray(golden.render_golden(scene, cam, cfg))
    got = np.asarray(megakernel.render_pallas(scene, cam, cfg, bvh=bvh,
                                              interpret=True))
    assert np.isfinite(want).all()
    np.testing.assert_array_equal(
        got, want,
        err_msg=f"cfg={cfg} n={scene.count} "
                f"bvh={None if bvh is None else bvh.leaf_size}")


@pytest.mark.parametrize("case", range(2))
def test_fuzz_vjp_matches_golden(case):
    rng = np.random.RandomState(2000 + case)
    cfg, scene, cam, bvh = _draw(rng)
    # keep the VJP draws tiny: the reverse sweep in interpret mode is
    # the slow path and exactness is what's under test, not scale
    cfg = cfg.replace(width=min(cfg.width, 48), height=min(cfg.height, 24),
                      spp=1, depth=min(cfg.depth, 3))
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    def loss_p(s):
        img = megakernel.render_pallas(s, cam, cfg, bvh=bvh)
        return jnp.mean((img - target) ** 2)

    def loss_g(s):
        img = golden.render_golden(s, cam, cfg)
        return jnp.mean((img - target) ** 2)

    gp = jax.grad(loss_p, allow_int=True)(scene)
    gg = jax.grad(loss_g, allow_int=True)(scene)
    # Tolerance budget, ADJUDICATED vs f64 ground truth
    # (scripts/probe_fuzz_grads_f64.py on case 0): both f32 estimators
    # sit 1.8-1.9e-4 abs from the f64 center grads while disagreeing
    # only 1.1e-5 with each other — the kernel is exactly as accurate
    # as XLA's own autodiff, and this comparison measures their SHARED
    # accumulation noise, not a kernel defect.  The fuzz guards against
    # MISCOMPILES (wrong indexing is O(1) error), not the noise floor.
    for k in ("center", "radius", "albedo", "mat_param"):
        np.testing.assert_allclose(
            np.asarray(getattr(gp, k)), np.asarray(getattr(gg, k)),
            rtol=2e-2, atol=5e-5,
            err_msg=f"{k}: cfg={cfg} n={scene.count}")


@pytest.mark.parametrize("case", range(4))
def test_fuzz_sharded_bit_identical(case):
    """Random configs through the row-slab shard_map: any mesh size must
    reproduce golden BITWISE (absolute-coordinate RNG seeds + the row0
    camera scalar make sharding invisible to pixel values)."""
    from raytpu import shard

    rng = np.random.RandomState(3000 + case)
    cfg, scene, cam, bvh = _draw(rng)
    cfg = cfg.replace(width=min(cfg.width, 96), height=min(cfg.height, 64),
                      spp=min(cfg.spp, 2), depth=min(cfg.depth, 4))
    want = np.asarray(golden.render_golden(scene, cam, cfg))
    n = int(rng.choice([2, 4, 8]))
    mesh = shard.make_mesh(jax.devices()[:n])
    got = np.asarray(shard.render_sharded_pallas(
        scene, cam, cfg, mesh=mesh, bvh=bvh))
    np.testing.assert_array_equal(
        got, want,
        err_msg=f"cfg={cfg} n={scene.count} mesh={n} "
                f"bvh={None if bvh is None else bvh.leaf_size}")
