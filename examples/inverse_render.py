"""BASELINE config 3: defocus-blur camera + gradient descent on sphere
positions to match a target image.

Perturbs the hero sphere's position, then recovers it by minimizing MSE
against the target render — gradients flow through the hand-structured
adjoint (raytpu/adjoint.py).  Run:

    python examples/inverse_render.py [--steps 60] [--out-dir /tmp]

Writes target.png / initial.png / recovered.png and prints the loss
trajectory.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp

import raytpu
from raytpu import adjoint, io
from raytpu.config import RenderConfig


def make_problem(shift=(0.12, 0.0, 0.08)):
    cfg = RenderConfig(width=96, height=48, spp=4, depth=4)
    scene_true = raytpu.make_scene([
        ((0.0, -100.5, -1.0), 100.0, 0, (0.5, 0.5, 0.5), 0.0),
        ((0.0, 0.0, -1.0), 0.5, 0, (0.7, 0.3, 0.3), 0.0),
    ])
    # defocus camera (BASELINE config 3's distinguishing feature)
    cam = raytpu.make_camera((0.0, 0.3, 1.5), (0.0, 0.0, -1.0), vfov=45.0,
                             aspect=cfg.aspect, aperture=0.25,
                             focus_dist=2.5)
    target = adjoint.render_golden_adjoint(scene_true, cam, cfg)
    scene0 = scene_true._replace(
        center=scene_true.center.at[1].add(jnp.asarray(shift)))
    return cfg, scene_true, scene0, cam, target


def optimize(cfg, scene, cam, target, steps=120, lr=0.05, vis_w=0.005):
    """Normalized gradient descent on sphere centers; silhouette
    gradients (vis_w) supply the visibility term that pure interior
    gradients lack."""
    @jax.jit
    def step(scene, lr):
        def loss_fn(center):
            img = adjoint.render_golden_adjoint(
                scene._replace(center=center), cam, cfg, vis_w)
            return jnp.mean((img - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(scene.center)
        gn = g / (jnp.linalg.norm(g) + 1e-12)
        return scene._replace(center=scene.center - lr * gn), loss

    losses = []
    for i in range(steps):
        scene, loss = step(scene, lr)
        losses.append(float(loss))
        lr *= 0.96
    return scene, losses


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--out-dir", default=".")
    args = p.parse_args(argv)

    cfg, scene_true, scene0, cam, target = make_problem()
    io.save_png(os.path.join(args.out_dir, "target.png"), target)
    io.save_png(os.path.join(args.out_dir, "initial.png"),
                adjoint.render_golden_adjoint(scene0, cam, cfg))

    err0 = float(jnp.linalg.norm(scene0.center[1] - scene_true.center[1]))
    scene, losses = optimize(cfg, scene0, cam, target, steps=args.steps)
    err1 = float(jnp.linalg.norm(scene.center[1] - scene_true.center[1]))

    io.save_png(os.path.join(args.out_dir, "recovered.png"),
                adjoint.render_golden_adjoint(scene, cam, cfg))
    print(f"loss {losses[0]:.3e} -> {losses[-1]:.3e}   "
          f"position error {err0:.4f} -> {err1:.4f}")
    return 0 if (losses[-1] < 0.3 * losses[0] and err1 < 0.5 * err0) else 1


if __name__ == "__main__":
    sys.exit(main())
