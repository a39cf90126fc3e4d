"""Optimizer-state checkpoint/resume (SURVEY.md §5): a resumed run must
bit-match an uninterrupted one — params AND Adam moments."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

import raytpu
from raytpu import adjoint
from raytpu.config import RenderConfig
from raytpu.optim import (optimize, save_opt_checkpoint,
                          load_opt_checkpoint)


def _problem():
    cfg = RenderConfig(width=48, height=24, spp=2, depth=3)
    scene_true = raytpu.make_scene([
        ((0.0, -100.5, -1.0), 100.0, 0, (0.5, 0.5, 0.5), 0.0),
        ((0.0, 0.0, -1.0), 0.5, 0, (0.7, 0.3, 0.3), 0.0),
    ])
    cam = raytpu.make_camera((0.0, 0.3, 1.5), (0.0, 0.0, -1.0),
                             vfov=45.0, aspect=cfg.aspect)
    target = adjoint.render_golden_adjoint(scene_true, cam, cfg)
    scene0 = scene_true._replace(
        center=scene_true.center.at[1].add(jnp.asarray([0.1, 0.0, 0.06])))

    def loss_fn(center):
        img = adjoint.render_golden_adjoint(
            scene0._replace(center=center), cam, cfg, 0.005)
        return jnp.mean((img - target) ** 2)

    return loss_fn, scene0.center


def test_resume_bit_matches_uninterrupted(tmp_path):
    loss_fn, p0 = _problem()
    ckpt = str(tmp_path / "opt.npz")

    full, losses_full = optimize(loss_fn, p0, steps=6, lr=0.02)

    # interrupted: 6 steps with a checkpoint at 3, then resume
    optimize(loss_fn, p0, steps=3, lr=0.02,
             checkpoint_path=ckpt, checkpoint_every=3)
    resumed, losses_tail = optimize(loss_fn, p0, steps=6, lr=0.02,
                                    checkpoint_path=ckpt, resume=True)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(resumed))
    np.testing.assert_array_equal(losses_full[3:], losses_tail)


def test_checkpoint_round_trip_exact(tmp_path):
    opt = optax.adam(0.01)
    params = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "b": jnp.float32(2.5)}
    state = opt.init(params)
    # advance one step so the moments are nontrivial
    g = jax.tree.map(jnp.ones_like, params)
    up, state = opt.update(g, state, params)
    params = optax.apply_updates(params, up)
    p = str(tmp_path / "c.npz")
    save_opt_checkpoint(p, params, state, 7)
    p2, s2, step = load_opt_checkpoint(p, params, opt)
    assert step == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_rejects_mismatched_template(tmp_path):
    """A wrong params template or optimizer must fail loudly — the
    positional unflatten would otherwise silently mis-assign leaves and
    Adam moments (round-3 VERDICT weak item 7)."""
    import pytest
    opt = optax.adam(0.01)
    params = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "b": jnp.float32(2.5)}
    state = opt.init(params)
    p = str(tmp_path / "c.npz")
    save_opt_checkpoint(p, params, state, 3)

    # wrong leaf count
    with pytest.raises(ValueError, match="leaves"):
        load_opt_checkpoint(p, {"a": params["a"]}, opt)
    # right count, wrong shape (leaves swapped by a reordered template)
    with pytest.raises(ValueError, match="mis-assign"):
        load_opt_checkpoint(
            p, {"a": jnp.float32(0.0),
                "b": jnp.zeros((2, 3), jnp.float32)}, opt)
    # wrong dtype
    with pytest.raises(ValueError, match="mis-assign"):
        load_opt_checkpoint(
            p, {"a": jnp.zeros((2, 3), jnp.int32), "b": jnp.float32(0.0)},
            opt)
    # wrong optimizer (extra state leaves vs adam's)
    with pytest.raises(ValueError):
        load_opt_checkpoint(p, params, optax.sgd(0.01))
    # the correct template still loads
    p2, _, step = load_opt_checkpoint(p, params, opt)
    assert step == 3
    np.testing.assert_array_equal(np.asarray(p2["a"]),
                                  np.asarray(params["a"]))


def test_optimization_recovers_geometry(tmp_path):
    """End-to-end: the checkpointed Adam loop actually reduces the loss
    (geometry moves toward the target across a silhouette)."""
    loss_fn, p0 = _problem()
    _, losses = optimize(loss_fn, p0, steps=8, lr=0.008,
                         checkpoint_path=str(tmp_path / "o.npz"),
                         checkpoint_every=4)
    assert min(losses[1:]) < losses[0] * 0.85, losses
