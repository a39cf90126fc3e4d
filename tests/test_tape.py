"""Winner-index tape (round 5): the taped backward must reproduce the
classic windowed-refill PASS 2 exactly.

The taping forward (gradkernel tape_mode="write") runs the same
windowed/parked refill schedule as the replay VJP (tape_mode="read");
gradients must be BIT-EQUAL to the classic self-sweeping kernel, and
the image must match the megakernel within the documented context
-dependent FMA-contraction drift (CLAUDE.md)."""

import numpy as np
import jax.numpy as jnp
import pytest

import raytpu
from raytpu.bvh import build_bvh
from raytpu.config import RenderConfig
from raytpu.kernels import gradkernel, megakernel


CFG = RenderConfig(width=64, height=32, spp=2, depth=4,
                   rng_mode="parallel")


@pytest.fixture(scope="module")
def world():
    scene = raytpu.final_world(n=48)
    bvh = build_bvh(scene, leaf_size=16)
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                             vfov=20.0, aspect=CFG.aspect)
    return scene, bvh, cam


def _grads(scene, cam, bvh, tape=None, img=None):
    ct = jnp.full((CFG.height, CFG.width, 3), 0.25, jnp.float32)
    return gradkernel.render_pallas_vjp(
        scene, cam, CFG, ct, interpret=True, bvh=bvh, img=img,
        tape=tape)


def _assert_bit_equal(a, b):
    for name in ("center", "radius", "albedo", "mat_param"):
        x, y = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        assert np.array_equal(x, y), name


def test_plan_gating(world):
    scene, bvh, _ = world
    assert gradkernel.tape_plan(CFG, scene.count, bvh=bvh) is not None
    # silhouette terms keep the classic kernel (near-miss sweep)
    assert gradkernel.tape_plan(CFG, scene.count, bvh=bvh,
                                vis_w=0.01) is None
    # sequential RNG has no fold_in streams
    seq = CFG.replace(rng_mode="sequential")
    assert gradkernel.tape_plan(seq, scene.count, bvh=bvh) is None
    # over budget -> classic
    old = gradkernel._TAPE_BUDGET
    try:
        gradkernel._TAPE_BUDGET = 1
        assert gradkernel.tape_plan(CFG, scene.count, bvh=bvh) is None
    finally:
        gradkernel._TAPE_BUDGET = old


def test_taped_grads_bit_equal_bvh(world):
    scene, bvh, cam = world
    plan = gradkernel.tape_plan(CFG, scene.count, bvh=bvh)
    img, tape = gradkernel.render_tape_fwd(
        scene, cam, CFG, plan["g_cap"], interpret=True, bvh=bvh)
    _, ds_t, dc_t = _grads(scene, cam, bvh, tape=tape, img=img)
    _, ds_c, dc_c = _grads(scene, cam, bvh, img=img)
    _assert_bit_equal(ds_t, ds_c)
    for name in ("origin", "lower_left", "horizontal", "vertical"):
        assert np.array_equal(np.asarray(getattr(dc_t, name)),
                              np.asarray(getattr(dc_c, name))), name


def test_taped_grads_bit_equal_nobvh(world):
    scene, _, cam = world
    plan = gradkernel.tape_plan(CFG, scene.count)
    img, tape = gradkernel.render_tape_fwd(
        scene, cam, CFG, plan["g_cap"], interpret=True)
    _, ds_t, _ = _grads(scene, cam, None, tape=tape, img=img)
    _, ds_c, _ = _grads(scene, cam, None, img=img)
    _assert_bit_equal(ds_t, ds_c)


def test_taped_image_matches_megakernel(world):
    scene, bvh, cam = world
    plan = gradkernel.tape_plan(CFG, scene.count, bvh=bvh)
    img_t, _ = gradkernel.render_tape_fwd(
        scene, cam, CFG, plan["g_cap"], interpret=True, bvh=bvh)
    img_m = megakernel._render_pallas_fwd_impl(
        scene, cam, CFG, True, bvh.nodes, bvh.perm,
        leaf_size=bvh.leaf_size, flat=bvh.flat)
    # context-dependent FMA contraction on the giant-sphere disc
    # cancellation bounds the drift (CLAUDE.md); bit-equality holds
    # against the GRADKERNEL's own forward (the grads tests above)
    assert float(jnp.max(jnp.abs(img_t - img_m))) <= 3e-4


def test_partial_tape_cutover(world):
    """A tape far smaller than the schedule must still give bit-equal
    gradients: steps past the cap re-run the sweep in-kernel (the
    partial-tape fallback), and the sweep computes exactly what the
    tape would have carried."""
    scene, bvh, cam = world
    tiny = CFG.depth + 3  # forces most steps through the fallback
    img, tape = gradkernel.render_tape_fwd(
        scene, cam, CFG, tiny, interpret=True, bvh=bvh)
    _, ds_t, _ = gradkernel.render_pallas_vjp(
        scene, cam, CFG,
        jnp.full((CFG.height, CFG.width, 3), 0.25, jnp.float32),
        interpret=True, bvh=bvh, img=img, tape=tape, tape_partial=True)
    _, ds_c, _ = _grads(scene, cam, bvh, img=img)
    _assert_bit_equal(ds_t, ds_c)


def test_taped_grads_14plane(world, monkeypatch):
    """The narrow-window mode (no stored attr planes — the depth>32
    default) must also replay bit-equal: the reverse re-gathers attrs
    by stored index instead of reading residual planes."""
    monkeypatch.setenv("RAYTPU_P2_ATTRS", "0")
    scene, bvh, cam = world
    plan = gradkernel.tape_plan(CFG, scene.count, bvh=bvh)
    img, tape = gradkernel.render_tape_fwd(
        scene, cam, CFG, plan["g_cap"], interpret=True, bvh=bvh)
    _, ds_t, _ = _grads(scene, cam, bvh, tape=tape, img=img)
    _, ds_c, _ = _grads(scene, cam, bvh, img=img)
    _assert_bit_equal(ds_t, ds_c)


def test_taped_grads_fuzz_shapes():
    """Random frame/scene geometries (odd widths, varying depth/spp)
    exercise the layout machinery — block shapes, multi-tile grouping,
    window counts, parking — the fixed-size tests cannot.  Taped grads
    must stay bit-equal to classic at every draw."""
    rng = np.random.default_rng(11)
    for _ in range(3):
        w = int(rng.integers(40, 160))
        h = int(rng.integers(24, 72))
        spp = int(rng.integers(1, 4))
        depth = int(rng.integers(2, 7))
        n = int(rng.integers(12, 90))
        cfg = RenderConfig(width=w, height=h, spp=spp, depth=depth,
                           rng_mode="parallel")
        scene = raytpu.final_world(n=n)
        bvh = build_bvh(scene, leaf_size=16)
        cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                                 vfov=20.0, aspect=cfg.aspect)
        plan = gradkernel.tape_plan(cfg, scene.count, bvh=bvh)
        assert plan is not None, (w, h, spp, depth, n)
        img, tape = gradkernel.render_tape_fwd(
            scene, cam, cfg, plan["g_cap"], interpret=True, bvh=bvh)
        ct = jnp.full((h, w, 3), 0.5, jnp.float32)
        _, ds_t, _ = gradkernel.render_pallas_vjp(
            scene, cam, cfg, ct, interpret=True, bvh=bvh, img=img,
            tape=tape, tape_partial=plan["partial"])
        _, ds_c, _ = gradkernel.render_pallas_vjp(
            scene, cam, cfg, ct, interpret=True, bvh=bvh, img=img)
        for name in ("center", "radius", "albedo", "mat_param"):
            assert np.array_equal(
                np.asarray(getattr(ds_t, name)),
                np.asarray(getattr(ds_c, name))), (name, w, h, spp,
                                                   depth, n)


def test_sharded_train_step_taped(world):
    """The pod train step's taped mode (per-slab tapes under shard_map)
    must agree with the classic sharded step — tolerance-compared
    because the taping forward's image carries the documented
    contraction drift vs the megakernel slab render."""
    import jax
    from raytpu import shard

    scene, bvh, cam = world
    mesh = shard.make_mesh(jax.devices()[:4])
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)
    step_c = shard.make_train_step_pallas(CFG, mesh, lr=1.0, bvh=bvh,
                                          use_tape=False)
    step_t = shard.make_train_step_pallas(CFG, mesh, lr=1.0, bvh=bvh,
                                          use_tape=True)
    s_c, c_c, l_c = step_c(scene, cam, target)
    s_t, c_t, l_t = step_t(scene, cam, target)
    assert np.isfinite(float(l_t))
    assert abs(float(l_t) - float(l_c)) <= 1e-3 * max(
        1.0, abs(float(l_c)))
    for name in ("center", "radius", "albedo", "mat_param"):
        a = np.asarray(getattr(s_t, name))
        b = np.asarray(getattr(s_c, name))
        scale = max(float(np.abs(b - np.asarray(getattr(scene, name))
                           ).max()), 1e-6)
        assert float(np.abs(a - b).max()) / scale < 5e-3, name


def test_taped_grads_multi_window(world):
    """Parking across several windows must not change gradients."""
    scene, bvh, cam = world
    old = gradkernel._P2_VMEM_BUDGET
    try:
        # shrink the residual window so the schedule parks repeatedly
        gradkernel._P2_VMEM_BUDGET = (
            gradkernel._NWREFILL * 8 * 128 * 4 * (CFG.depth + 2))
        plan = gradkernel.tape_plan(CFG, scene.count, bvh=bvh)
        assert plan is not None
        img, tape = gradkernel.render_tape_fwd(
            scene, cam, CFG, plan["g_cap"], interpret=True, bvh=bvh)
        _, ds_t, _ = _grads(scene, cam, bvh, tape=tape, img=img)
        # classic at the SAME shrunken window (the accumulator order
        # follows the window layout, so only like-for-like layouts are
        # bit-comparable)
        _, ds_c, _ = _grads(scene, cam, bvh, img=img)
    finally:
        gradkernel._P2_VMEM_BUDGET = old
    _assert_bit_equal(ds_t, ds_c)
