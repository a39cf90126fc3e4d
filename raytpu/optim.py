"""Inverse-rendering optimization with checkpoint/resume (SURVEY.md §5).

Round 1 checkpointed the progressive RENDER state (raytpu/progressive.py);
this adds the OPTIMIZER side: scene parameters + Adam moments + step
counter serialize to one npz, and a resumed run continues bit-identically
to an uninterrupted one (asserted in tests/test_optim.py).

The reference has no optimization loop at all — differentiable inverse
rendering is this framework's new capability (BASELINE config 3).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax


def save_opt_checkpoint(path: str, params, opt_state, step: int) -> None:
    """Serialize (params pytree, optax state, step) to one npz file.

    Leaves are saved positionally; loading requires the same optimizer
    and a params template with the same structure (the normal resume
    situation).  Atomic-ish: written to a temp file then renamed.
    """
    p_leaves = jax.tree.leaves(params)
    s_leaves = jax.tree.leaves(opt_state)
    payload = {"step": np.asarray(step, np.int64),
               "n_params": np.asarray(len(p_leaves), np.int64)}
    for i, leaf in enumerate(p_leaves):
        payload[f"p{i}"] = np.asarray(leaf)
    for i, leaf in enumerate(s_leaves):
        payload[f"s{i}"] = np.asarray(leaf)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    import os
    os.replace(tmp, path)


def load_opt_checkpoint(path: str, params_template, optimizer):
    """-> (params, opt_state, step), bit-exact as saved.

    ``params_template`` supplies the pytree structure (values ignored);
    ``optimizer`` must be the same optax transform used when saving (its
    ``init`` provides the state treedef to unflatten into).
    """
    with np.load(path) as z:
        n_p = int(z["n_params"])
        step = int(z["step"])
        t_leaves = jax.tree.leaves(params_template)
        if n_p != len(t_leaves):
            raise ValueError(
                f"checkpoint {path!r} holds {n_p} param leaves but the "
                f"template has {len(t_leaves)} — wrong template pytree")
        p_leaves = []
        for i, t in enumerate(t_leaves):
            leaf = z[f"p{i}"]
            t = np.asarray(t)
            if leaf.shape != t.shape or leaf.dtype != t.dtype:
                raise ValueError(
                    f"checkpoint {path!r} param leaf {i}: saved "
                    f"{leaf.dtype}{leaf.shape} vs template "
                    f"{t.dtype}{t.shape} — positional unflatten would "
                    f"mis-assign; pass the template this run was saved "
                    f"with")
            p_leaves.append(jnp.asarray(leaf))
        treedef = jax.tree.structure(params_template)
        params = jax.tree.unflatten(treedef, p_leaves)
        s_template = optimizer.init(params)
        s_treedef = jax.tree.structure(s_template)
        st_leaves = jax.tree.leaves(s_template)
        n_s = len(st_leaves)
        import re
        n_saved = sum(1 for k in z.files if re.fullmatch(r"s\d+", k))
        if n_saved != n_s:
            raise ValueError(
                f"checkpoint {path!r} holds {n_saved} optimizer-state "
                f"leaves but this optimizer expects {n_s} — wrong "
                f"optimizer")
        s_leaves = []
        for i, t in enumerate(st_leaves):
            leaf = z[f"s{i}"]
            t = np.asarray(t)
            if leaf.shape != t.shape or leaf.dtype != t.dtype:
                raise ValueError(
                    f"checkpoint {path!r} opt-state leaf {i}: saved "
                    f"{leaf.dtype}{leaf.shape} vs expected "
                    f"{t.dtype}{t.shape} — optimizer mismatch (moments "
                    f"would be silently mis-assigned)")
            s_leaves.append(jnp.asarray(leaf))
        opt_state = jax.tree.unflatten(s_treedef, s_leaves)
    return params, opt_state, step


def optimize(loss_fn, params, steps: int, lr: float = 0.05,
             optimizer=None, checkpoint_path: str | None = None,
             checkpoint_every: int = 0, resume: bool = False,
             callback=None):
    """Adam-optimize ``params`` against scalar ``loss_fn(params)``.

    Returns (params, losses).  With ``checkpoint_path`` +
    ``checkpoint_every``, periodically saves params + moments + step;
    ``resume=True`` continues from the file (the remaining steps run,
    and the trajectory bit-matches an uninterrupted run because the
    update is deterministic and the moments are restored exactly).
    ``callback(step, loss)`` is invoked per step if given.
    """
    if optimizer is None:
        optimizer = optax.adam(lr)
    start = 0
    opt_state = optimizer.init(params)
    if resume and checkpoint_path:
        params, opt_state, start = load_opt_checkpoint(
            checkpoint_path, params, optimizer)

    @jax.jit
    def step_fn(params, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(start, steps):
        params, opt_state, loss = step_fn(params, opt_state)
        losses.append(float(loss))
        if callback is not None:
            callback(i, float(loss))
        if (checkpoint_path and checkpoint_every
                and (i + 1) % checkpoint_every == 0):
            save_opt_checkpoint(checkpoint_path, params, opt_state, i + 1)
    return params, losses
