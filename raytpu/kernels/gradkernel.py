"""Fused Pallas VJP kernel — the hand-derived backward at kernel speed.

The XLA adjoint (raytpu/adjoint.py) is correct but HBM-bound: residuals
and carries round-trip main memory every scan step (~330 ms fwd+bwd on
config 2).  This kernel keeps the ENTIRE reverse sweep in VMEM, per
(8, 128) pixel tile:

  PASS 1  forward all spp samples (no stores) -> per-pixel linear sums
          -> in-kernel cotangent of the gamma'd mean:
          d_acc = ct * (1/gamma) * img^(1-gamma) / spp
  PASS 2  per sample: re-run the forward storing per-bounce residuals in
          VMEM scratch (ray state, throughput, winner index, masks,
          seed), then walk the bounces in REVERSE, differentiating the
          per-bounce continuous math via jax.vjp *inside the kernel*
          (elementwise ops — Mosaic lowers the transposed graph), and
          accumulating:
          - sphere-parameter cotangents into a (16, N) VMEM accumulator
            via a predicated per-sphere reduction;
          - camera cotangent SUMS (18 scalars) from the bounce-0 ray
            cotangents.

Counter-based RNG makes replay free: PASS 2 recomputes every random draw
from the stored pre-bounce states — nothing random is stored.

Grid accumulation: all tiles add into the same (16, N) / (1, 24) output
blocks (grid steps are sequential on a TensorCore; the first tile
initializes).  The host assembles the Camera-pytree cotangent from the
18 sums (raygen transpose, including the thin-lens offset terms).

Discrete-event policy identical to adjoint.py: closest-hit selection,
branch bits and RNG draws are detached.  ``vis_w > 0`` adds the same
silhouette (boundary) gradient terms as the XLA adjoint — soft-coverage
straight-through d(alpha) on both the hit side and the nearest
near-miss sphere — so geometry optimization runs at kernel speed.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytpu import rng
from raytpu.camera import Camera
from raytpu.config import RenderConfig
from raytpu.scene import Scene
from raytpu.kernels.megakernel import (
    _TILE_H, _TILE_W, _INF, _dot3, _normalize3, _reflect, _refract,
    _schlick, _sky, _pack_camera, _pack_scene, _pack_flat_at,
    _onehot_attrs, _split_bf16x3, _flat_sweep_ti, _FLAT_MAX_LEAVES,
    _TIDX, _FIXED_OCTANT,
)


def _bounce_f(ro, rd, thr, attrs, masks, sd, t_min,
              scatter_mode: str = "v2"):
    """Per-bounce continuous math vs the pre-selected sphere (the Pallas
    twin of adjoint._bounce_math, SoA scalars).  Differentiable in
    (ro, rd, thr, attrs); masks/draws are detached."""
    ox, oy, oz = ro
    dx, dy, dz = rd
    cr, cg, cb = thr
    (s_cx, s_cy, s_cz, s_rad, s_mt, s_ar, s_ag, s_ab, s_mp) = attrs
    scat, missed = masks

    ocx = ox - s_cx
    ocy = oy - s_cy
    ocz = oz - s_cz
    a = _dot3(dx, dy, dz, dx, dy, dz)
    half_b = ocx * dx + ocy * dy + ocz * dz
    c = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - s_rad * s_rad
    disc = half_b * half_b - a * c
    # value: EXACTLY hit_world's select (bit-parity with the oracle);
    # gradient: from the np.float32(1e-20)-clamped branch (d sqrt blows up at 0)
    sqrt_safe = jnp.sqrt(jnp.maximum(disc, np.float32(1e-20)))
    sqrt_exact = jnp.sqrt(jnp.where(disc >= 0, disc, 1.0))
    sqrtd = sqrt_safe + jax.lax.stop_gradient(sqrt_exact - sqrt_safe)
    inv_a = 1.0 / a
    root1 = (-half_b - sqrtd) * inv_a
    root2 = (-half_b + sqrtd) * inv_a
    near_ok = jax.lax.stop_gradient(root1 >= t_min)
    t = jnp.where(near_ok, root1, root2)
    t = jnp.where(jax.lax.stop_gradient(scat), t, 1.0)

    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    inv_r = 1.0 / jnp.where(s_rad == 0, 1.0, s_rad)
    nx = (px - s_cx) * inv_r
    ny = (py - s_cy) * inv_r
    nz = (pz - s_cz) * inv_r
    front = jax.lax.stop_gradient(_dot3(dx, dy, dz, nx, ny, nz) < 0)
    sgn = jnp.where(front, 1.0, -1.0)
    nx, ny, nz = nx * sgn, ny * sgn, nz * sgn

    (sx, sy, sz), _ = rng.random_in_unit_sphere(sd)
    h1, _ = rng.hash1(sd)
    sx = jax.lax.stop_gradient(sx)
    sy = jax.lax.stop_gradient(sy)
    sz = jax.lax.stop_gradient(sz)
    h1 = jax.lax.stop_gradient(h1)

    if scatter_mode == "v1":
        # v1 materials (Shader_RT.fx:217-243); discrete flip/near-zero
        # detached, saturation continuous (adjoint._bounce_math twin)
        flip = jax.lax.stop_gradient(_dot3(sx, sy, sz, nx, ny, nz) > 0)
        hxx = jnp.where(flip, sx, -sx)
        hyy = jnp.where(flip, sy, -sy)
        hzz = jnp.where(flip, sz, -sz)
        ldx = nx + hxx
        ldy = ny + hyy
        ldz = nz + hzz
        s_eps = 1e-8
        near0 = jax.lax.stop_gradient(
            (jnp.abs(ldx) < s_eps) & (jnp.abs(ldy) < s_eps)
            & (jnp.abs(ldz) < s_eps))
        ddx = jnp.where(near0, nx, ldx)
        ddy = jnp.where(near0, ny, ldy)
        ddz = jnp.where(near0, nz, ldz)
        u1x, u1y, u1z = _normalize3(dx, dy, dz)
        rx, ry, rz = _reflect(u1x, u1y, u1z, nx, ny, nz)
        fz = jnp.clip(s_mp, 0.0, 1.0)
        mdx = rx + fz * hxx
        mdy = ry + fz * hyy
        mdz = rz + fz * hzz
    else:
        ddx, ddy, ddz = _normalize3(nx + sx, ny + sy, nz + sz)
        rx, ry, rz = _reflect(dx, dy, dz, nx, ny, nz)
        mdx, mdy, mdz = _normalize3(rx + s_mp * sx, ry + s_mp * sy,
                                    rz + s_mp * sz)

    is_glass = s_mt == 2.0
    ior = jnp.where(is_glass, jnp.maximum(s_mp, 1e-3), 1.5)
    ux, uy, uz = _normalize3(dx, dy, dz)
    ratio = jnp.where(front, 1.0 / ior, ior)
    cosine = jnp.minimum(_dot3(-ux, -uy, -uz, nx, ny, nz), 1.0)
    sine = jnp.sqrt(jnp.maximum(1.0 - cosine * cosine, 0.0))
    cannot = ratio * sine > 1.0
    use_reflect = jax.lax.stop_gradient(
        cannot | (_schlick(cosine, ratio) > h1))
    rfx, rfy, rfz = _reflect(ux, uy, uz, nx, ny, nz)
    tx, ty, tz = _refract(ux, uy, uz, nx, ny, nz, ratio)
    gdx = jnp.where(use_reflect, rfx, tx)
    gdy = jnp.where(use_reflect, rfy, ty)
    gdz = jnp.where(use_reflect, rfz, tz)

    is_d = s_mt == 0.0
    is_m = s_mt == 1.0
    atr = jnp.where(is_glass, 1.0, s_ar)
    atg = jnp.where(is_glass, 1.0, s_ag)
    atb = jnp.where(is_glass, 1.0, s_ab)
    odx = jnp.where(is_d, ddx, jnp.where(is_m, mdx, gdx))
    ody = jnp.where(is_d, ddy, jnp.where(is_m, mdy, gdy))
    odz = jnp.where(is_d, ddz, jnp.where(is_m, mdz, gdz))

    skr, skg, skb = _sky(dx, dy, dz)
    out_r = jnp.where(missed, cr * skr, 0.0)
    out_g = jnp.where(missed, cg * skg, 0.0)
    out_b = jnp.where(missed, cb * skb, 0.0)

    n_cr = jnp.where(scat, cr * atr, cr)
    n_cg = jnp.where(scat, cg * atg, cg)
    n_cb = jnp.where(scat, cb * atb, cb)
    n_ox = jnp.where(scat, px, ox)
    n_oy = jnp.where(scat, py, oy)
    n_oz = jnp.where(scat, pz, oz)
    n_dx = jnp.where(scat, odx, dx)
    n_dy = jnp.where(scat, ody, dy)
    n_dz = jnp.where(scat, odz, dz)

    return ((n_ox, n_oy, n_oz), (n_dx, n_dy, n_dz),
            (n_cr, n_cg, n_cb), (out_r, out_g, out_b))


# residual plane layout in the per-sample scratch (depth, NRES, 8, 128)
_R_OX, _R_OY, _R_OZ, _R_DX, _R_DY, _R_DZ = 0, 1, 2, 3, 4, 5
_R_CR, _R_CG, _R_CB, _R_IDX, _R_SCAT, _R_MISS, _R_SEED = 6, 7, 8, 9, 10, 11, 12
_R_ATTR0 = 13          # 9 winner-attribute planes (cx cy cz rad mt ar ag ab mp)
_NRES = 22
_NCAM_SUMS = 18

# refill-PASS-2 residual layout: planes per GLOBAL STEP, not per
# (sample, bounce) — see the p2_refill branch of _make_grad_kernel.
# u/v/lens draws are NOT stored: the reverse sweep re-derives them from
# the stored (sample, group-tile) indices by fold_in (parallel RNG
# only).
(_WR_OX, _WR_OY, _WR_OZ, _WR_DX, _WR_DY, _WR_DZ,
 _WR_CR, _WR_CG, _WR_CB, _WR_IDX, _WR_FLG, _WR_SEED, _WR_SPL,
 _WR_MPL) = range(14)
# Store the 9 winner-attribute planes per global step (planes 14..22)
# so the reverse sweep reads them back instead of re-gathering via the
# one-hot MXU matmul — trades residual-window size (14 -> 23 planes ->
# ~0.6x steps per window) for the reverse's per-step one-hot build + 8
# matmuls.  Round 4 measured stored attrs +2.5% at config-4; round 5's
# taped backward flipped the deep-bounce case (depth-50 refv2 prefers
# the 14-plane window's halved parking drain, 743.8 vs 787.2 ms), so
# the DEFAULT is now DEPTH-AWARE — see _p2_attrs_for().  This module
# constant is only the depth<=32 value kept for external readers
# (tests size budgets from _NWREFILL); kernels thread the per-call
# choice.  RAYTPU_P2_ATTRS forces either way.
_P2_ATTRS = bool(int(__import__("os").environ.get("RAYTPU_P2_ATTRS",
                                                  "1")))
# TIMING-ONLY ablations for the backward roofline
# (scripts/probe_bwd_roofline_r5.py): comma-separated component kills
# that keep the refill state machine's schedule (trip counts, window
# layout) bit-identical while skipping one cost center each — GRADIENTS
# ARE WRONG with any flag set.  "norev" skips the reverse sweep;
# "nostore" skips the residual-plane stores; "noscatter" skips the
# per-step one-hot scatter matmuls; "novjp" replaces the in-kernel
# jax.vjp transpose with cheap masked algebra of the same operands.
_ABL = frozenset(
    f for f in __import__("os").environ.get(
        "RAYTPU_BWD_ABL", "").split(",") if f)
_WR_ATTR0 = 14
_NWREFILL = 23 if _P2_ATTRS else 14


def _p2_attrs_for(depth: int) -> bool:
    """Store the 9 winner-attr planes in the refill residuals?

    DEPTH-AWARE default (round 5, taped backward, one v5e):
    config-4 depth 12 prefers stored attrs (fwd+bwd 622.2 vs 654.9 ms
    — the reverse's re-gather costs more than the narrower window),
    refv2 depth 50 prefers the 14-plane window (743.8 vs 787.2 ms —
    at depth 50 the window fits barely 2 samples and the parking drain
    dominates; 14 planes -> 187-step windows halve it).  The crossover
    is bracketed in (12, 50); 32 splits it.  RAYTPU_P2_ATTRS forces.
    """
    import os as _os
    env = _os.environ.get("RAYTPU_P2_ATTRS")
    if env is not None:
        return bool(int(env))
    return depth <= 32


def _nwrefill(p2_attrs: bool) -> int:
    return 23 if p2_attrs else 14
# flag bits in the _WR_FLG plane (i32 bitcast)
_F_SCAT, _F_MISS, _F_FRESH, _F_FIN = 1, 2, 4, 8
# residual-step VMEM budget for the refill PASS 2 (per-window step cap;
# lanes park at a sample boundary when the buffer can't fit another
# full-depth sample, and the outer window loop resumes them).  Swept on
# hardware (config 4, mt5): 6/10/12 MB -> 285.9/282.2/280.0 ms — the
# parking tail costs ~2%, i.e. the VJP is compute-bound, not
# window-bound; 10 MB keeps headroom for the depth-50 shapes.
_P2_VMEM_BUDGET = int(__import__("os").environ.get(
    "RAYTPU_P2_VMEM", 10 * 2**20))
# PASS-1 winner-index planes (spp x depth x tile) are stored only when
# they fit this VMEM budget; beyond it PASS 2 falls back to re-running
# the closest-hit sweep (REFERENCE_V2's 60 spp x depth 50 would need
# 12 MB).
_IDX_VMEM_BUDGET = 6 * 2**20


def _make_grad_kernel(cfg: RenderConfig, n_spheres: int,
                      n_nodes: int = 0, store_idx: bool = True,
                      vis_w: float = 0.0,
                      static_leaf: int | None = None,
                      flat_leaves: bool = False,
                      fat_pad: int | None = None,
                      skip_p1: bool = False,
                      outliers: tuple | None = None,
                      p2_refill: bool = False,
                      p2_steps: int = 0,
                      block_w: int = _TILE_W,
                      multi_tile: int = 1,
                      tape_mode: str = "",
                      tape_gcap: int = 0,
                      tape_partial: bool = False,
                      p2_attrs: bool = True):
    depth = cfg.depth
    spp = cfg.spp
    parallel = cfg.rng_mode == "parallel"
    assert not (skip_p1 and not parallel), \
        "PASS-1 elision needs order-free per-sample seeds (parallel RNG)"
    assert not (p2_refill and not skip_p1) or tape_mode == "write", \
        "refill PASS 2 needs fold_in sample streams + the image operand"
    assert not p2_refill or p2_steps >= depth, \
        "the step window must fit at least one full-depth sample"
    assert multi_tile == 1 or p2_refill, \
        "multi-tile grouping needs the refill PASS 2"
    # winner-index tape (round 5): "write" = the taping FORWARD (renders
    # the image, runs the SAME windowed/parked refill schedule as the
    # replay, and streams each step's winner index to an HBM tape);
    # "read" = the replay VJP (PASS-2 forward reads the tape back
    # instead of re-running the closest-hit sweep — the sweep was 87%
    # of the VJP kernel, scripts/probe_bwd_roofline_r5.py).  Schedule
    # identity between the two is BY CONSTRUCTION: one win_body, one
    # parking rule, one respawn rule.
    assert tape_mode in ("", "write", "read")
    if tape_mode:
        assert p2_refill and parallel and tape_gcap > 0 and fat_pad, \
            "the tape rides the windowed refill PASS 2 (parallel RNG)"
        assert vis_w == 0.0 or tape_mode == "write", \
            "silhouette terms keep the classic PASS 2 (near-miss sweep)"
    t_min = np.float32(cfg.t_min)
    inv_w = np.float32(1.0 / (cfg.width - 1))
    inv_h = np.float32(1.0 / (cfg.height - 1))
    inv_spp = np.float32(1.0 / spp)
    gamma = np.float32(cfg.gamma)

    def kernel(cam_ref, sc_ref, *rest):
        idx_ref = None
        fat_ref = None
        seeds_ref = None
        tape_ref = t_stage = t_sem = None
        imgr_ref = imgg_ref = imgb_ref = None
        if n_nodes:
            nd_ref, *rest = rest
        if fat_pad:
            fat_ref, *rest = rest
        if tape_mode == "write":
            # taping forward: no cotangent/grad plumbing at all —
            # renders the image and streams the winner-index tape
            (r_ref, g_ref, b_ref, tape_ref, t_stage, t_sem) = rest
        elif tape_mode == "read":
            (tape_ref, ctr_ref, ctg_ref, ctb_ref,
             imgr_ref, imgg_ref, imgb_ref,
             r_ref, g_ref, b_ref, gsc_ref, gcam_ref,
             res_ref, gsc_acc, gcam_acc, t_stage, t_sem) = rest
        elif skip_p1:
            # PASS 1 elided: the forward image rides in as an operand
            # (parallel RNG re-derives each sample's seed by fold_in, so
            # neither per-sample seeds nor winner indices need storing)
            (ctr_ref, ctg_ref, ctb_ref, imgr_ref, imgg_ref, imgb_ref,
             r_ref, g_ref, b_ref, gsc_ref, gcam_ref,
             res_ref, gsc_acc, gcam_acc) = rest
        elif store_idx:
            (ctr_ref, ctg_ref, ctb_ref,
             r_ref, g_ref, b_ref, gsc_ref, gcam_ref,
             res_ref, seeds_ref, idx_ref, gsc_acc, gcam_acc) = rest
        else:
            (ctr_ref, ctg_ref, ctb_ref,
             r_ref, g_ref, b_ref, gsc_ref, gcam_ref,
             res_ref, seeds_ref, gsc_acc, gcam_acc) = rest
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        first = (ti == 0) & (tj == 0)
        last = (ti == pl.num_programs(0) - 1) & (tj == pl.num_programs(1) - 1)
        shape = (_TILE_H, _TILE_W)
        block_h = (_TILE_H * _TILE_W) // block_w
        row0 = cam_ref[23].astype(jnp.int32)
        # multi_tile > 1: this instance owns multi_tile stacked blocks;
        # py covers the FIRST (lanes hop block_h pixel rows per
        # exhausted block — see the refill PASS 2)
        if block_w == _TILE_W:
            py = (row0 + ti * (_TILE_H * multi_tile)
                  + jax.lax.broadcasted_iota(jnp.int32, shape, 0))
            px = (tj * _TILE_W
                  + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
        else:
            # square-ish block tiling (megakernel._make_kernel twin):
            # the tile's 1024 lanes cover a (block_h x block_w) pixel
            # block — ct/img operands arrive pre-scrambled and outputs
            # leave in block layout (host unscrambles)
            m = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * _TILE_W
                 + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
            py = row0 + ti * (block_h * multi_tile) + m // block_w
            px = tj * block_w + m % block_w
        seed0 = rng.pixel_seed(px.astype(jnp.uint32), py.astype(jnp.uint32))
        fx = px.astype(jnp.float32)
        fy = py.astype(jnp.float32)
        zero = jnp.zeros(shape, jnp.float32)
        one = zero + 1.0

        def cam3(i):
            return cam_ref[i], cam_ref[i + 1], cam_ref[i + 2]

        c_ox, c_oy, c_oz = cam3(0)
        c_hx, c_hy, c_hz = cam3(3)
        c_vx, c_vy, c_vz = cam3(6)
        c_lx, c_ly, c_lz = cam3(9)
        c_ux, c_uy, c_uz = cam3(12)
        c_wx, c_wy, c_wz = cam3(15)
        lens_r = cam_ref[18]
        defocus = lens_r > 0
        dyn_depth = cam_ref[19].astype(jnp.int32)
        dyn_spp = cam_ref[20].astype(jnp.int32)
        dyn_nsph = cam_ref[21].astype(jnp.int32)
        dyn_nodes = cam_ref[22].astype(jnp.int32)
        fixed_nbase = None
        if _FIXED_OCTANT and n_nodes and static_leaf:
            # fixed per-instance traversal octant from the instance
            # -center PRIMARY direction — scalar prologue math, zero
            # per-step cross-lane reduces (megakernel._FIXED_OCTANT;
            # same machinery cost in the VJP's PASS 1/2 sweeps)
            span_h = ((_TILE_H if block_w == _TILE_W else block_h)
                      * multi_tile)
            span_w = _TILE_W if block_w == _TILE_W else block_w
            cyc = (row0 + ti * span_h + span_h // 2).astype(jnp.float32)
            cxc = (tj * span_w + span_w // 2).astype(jnp.float32)
            u_c = cxc * inv_w
            v_c = cyc * inv_h
            dxc = c_lx + u_c * c_hx + v_c * c_vx - c_ox
            dyc = c_ly + u_c * c_hy + v_c * c_vy - c_oy
            dzc = c_lz + u_c * c_hz + v_c * c_vz - c_oz
            octc = (jnp.where(dxc < 0, 4, 0) + jnp.where(dyc < 0, 2, 0)
                    + jnp.where(dzc < 0, 1, 0))
            fixed_nbase = octc.astype(jnp.int32) * dyn_nodes

        # accumulate in SCRATCH (persists across sequential grid
        # steps); the output blocks are written once, at the last tile.
        # Scene grads live in a VMEM (16, n_pad) accumulator (vector
        # adds; scalar stores to VMEM are forbidden but vector ones are
        # fine); camera sums stay SMEM scalars.
        if tape_mode != "write":
            @pl.when(first)
            def _():
                gsc_acc[:, :] = jnp.zeros(
                    (16, gsc_acc.shape[1]), jnp.float32)
                for i in range(gcam_acc.shape[1]):
                    gcam_acc[0, i] = 0.0

        def scatter_attr_grads(idxm_f, g9):
            if "noscatter" in _ABL:  # timing-only ablation
                return
            """gsc_acc[:, j] += per-winner sums of the attribute
            cotangents: one-hot MXU matmul per tile row (lanes with
            idx = -1 contribute nothing), replacing a serial distinct
            -winner while-loop whose trip count (~#distinct winners)
            dominated large-scene PASS 2.  The g planes are bf16x3
            -split at runtime so the matmul's bf16 input cast is
            lossless (see megakernel._split_bf16x3).  (Row-batching
            the contraction to K = 1024 measured SLOWER — see
            megakernel._onehot_attrs.)"""
            npd = gsc_acc.shape[1]
            iota = jax.lax.broadcasted_iota(jnp.int32, (npd, _TILE_W), 0)
            zrow = jnp.zeros((1, _TILE_W), jnp.float32)
            total = None
            for r in range(_TILE_H):
                gs = jnp.concatenate(
                    [g9[k][r:r + 1] for k in range(9)] + [zrow] * 7,
                    axis=0)                               # (16, W)
                gs = _split_bf16x3(gs)                    # (48, W)
                onehot = jnp.where(
                    iota == idxm_f[r:r + 1].astype(jnp.int32), 1.0, 0.0)
                out = jax.lax.dot_general(
                    gs, onehot, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (48, npd)
                c = out[0:16] + out[16:32] + out[32:48]
                total = c if total is None else total + c
            gsc_acc[:, :] += total

        def gen_ray(sd, fy_cur=None):
            """Jitter + raygen; returns (ray, u, v, lens draws, seed')."""
            (j1a, _), sd = rng.hash2(sd)
            (_, j2b), sd = rng.hash2(sd)
            u = (fx + j1a * 1.1) * inv_w
            v = ((fy if fy_cur is None else fy_cur) + j2b * 1.1) * inv_h
            (ldx, ldy), sd_lens = rng.random_in_unit_disk(sd)
            sd = jnp.where(defocus, sd_lens, sd)
            rlx = lens_r * ldx
            rly = lens_r * ldy
            offx = jnp.where(defocus, c_ux * rlx + c_wx * rly, 0.0)
            offy = jnp.where(defocus, c_uy * rlx + c_wy * rly, 0.0)
            offz = jnp.where(defocus, c_uz * rlx + c_wz * rly, 0.0)
            ox = c_ox + offx
            oy = c_oy + offy
            oz = c_oz + offz
            dx = c_lx + u * c_hx + v * c_vx - ox
            dy = c_ly + u * c_hy + v * c_vy - oy
            dz = c_lz + u * c_hz + v * c_vz - oz
            return (ox, oy, oz, dx, dy, dz), u, v, (ldx, ldy), sd

        def closest_hit(ox, oy, oz, dx, dy, dz, alive):
            """Closest-hit sweep -> (idx f32, hit_any, attrs9); the
            winner's 9 attributes are tracked by predicated updates (no
            O(N) gather); dead lanes are culled from the traversal's
            any-hit reduce."""
            a = _dot3(dx, dy, dz, dx, dy, dz)
            inv_a = 1.0 / a
            neg_inv_a = -inv_a

            def body(j, hs):
                tb, bi = hs[0], hs[1]
                at = hs[2:]
                s_at = tuple(sc_ref[k, j] for k in range(9))
                s_cx, s_cy, s_cz, s_rad = s_at[0], s_at[1], s_at[2], s_at[3]
                ocx = ox - s_cx
                ocy = oy - s_cy
                ocz = oz - s_cz
                half_b = ocx * dx + ocy * dy + ocz * dz
                c = (_dot3(ocx, ocy, ocz, ocx, ocy, ocz)
                     - s_rad * s_rad)
                disc = half_b * half_b - a * c
                # NaN-propagation root test (bit-identical, 4 ops
                # cheaper — see megakernel._flat_sweep_ti)
                sqrtd = jnp.sqrt(disc)
                root1 = (half_b + sqrtd) * neg_inv_a
                root2 = (sqrtd - half_b) * inv_a
                near_ok = root1 >= t_min
                root = jnp.where(near_ok, root1, root2)
                win = (root >= t_min) & (root < tb)
                return (jnp.where(win, root, tb),
                        jnp.where(win, j.astype(jnp.float32), bi),
                        *(jnp.where(win, s, h) for s, h in zip(s_at, at)))

            hs0 = (zero + _INF, zero,
                   zero, zero, zero, one, zero, zero, zero, zero, zero)
            if not n_nodes:
                out = jax.lax.fori_loop(0, dyn_nsph, body, hs0)
                return out[1], out[0] < _INF, out[2:]

            # tile-coherent skip-pointer traversal (see megakernel)
            inv_dx = 1.0 / dx
            inv_dy = 1.0 / dy
            inv_dz = 1.0 / dz

            if static_leaf and fixed_nbase is not None:
                nbase = fixed_nbase
            elif static_leaf:
                # octant-ordered node copies — front-to-back walk (see
                # megakernel.make_bounce_body / bvh._octant_orders)
                live = jnp.where(alive, 1.0, 0.0)
                half = 0.5 * jnp.sum(live)
                octi = (
                    jnp.where(jnp.sum(jnp.where(alive & (dx < 0),
                                                1.0, 0.0)) > half, 4, 0)
                    + jnp.where(jnp.sum(jnp.where(alive & (dy < 0),
                                                  1.0, 0.0)) > half, 2, 0)
                    + jnp.where(jnp.sum(jnp.where(alive & (dz < 0),
                                                  1.0, 0.0)) > half, 1, 0))
                nbase = octi.astype(jnp.int32) * dyn_nodes
            else:
                nbase = jnp.int32(0)

            if flat_leaves:
                # flat leaf-list (t, idx) sweep + one-hot extraction —
                # the SAME megakernel._flat_sweep_ti the forward bounce
                # body runs (op-for-op lockstep by construction)
                assert static_leaf and fat_pad
                tb, idxf = _flat_sweep_ti(
                    sc_ref, nd_ref, dyn_nodes, nbase, static_leaf,
                    t_min, (ox, oy, oz, dx, dy, dz),
                    (inv_dx, inv_dy, inv_dz), a, inv_a, alive,
                    outliers=outliers)
                attrs = _onehot_attrs(fat_ref[:, :], fat_pad, idxf)
                return idxf, tb < _INF, attrs

            from raytpu.kernels.megakernel import _seed_outlier_tests
            hs0 = _seed_outlier_tests(body, hs0, outliers)

            def t_cond(ts):
                return ts[0] < dyn_nodes

            def t_body(ts):
                rel = ts[0]
                node = nbase + rel
                hs = ts[1:]
                tb = hs[0]
                t1 = (nd_ref[0, node] - ox) * inv_dx
                t2 = (nd_ref[3, node] - ox) * inv_dx
                t3 = (nd_ref[1, node] - oy) * inv_dy
                t4 = (nd_ref[4, node] - oy) * inv_dy
                t5 = (nd_ref[2, node] - oz) * inv_dz
                t6 = (nd_ref[5, node] - oz) * inv_dz
                tnear = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1, t2),
                                jnp.minimum(t3, t4)),
                    jnp.maximum(jnp.minimum(t5, t6), t_min))
                tfar = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1, t2),
                                jnp.maximum(t3, t4)),
                    jnp.minimum(jnp.maximum(t5, t6), tb))
                boxhit = ~(tnear > tfar) & alive
                anyhit = jnp.max(jnp.where(boxhit, 1.0, 0.0)) > 0
                start = nd_ref[6, node].astype(jnp.int32)
                count = nd_ref[7, node].astype(jnp.int32)
                skip = nd_ref[8, node].astype(jnp.int32)
                if static_leaf:
                    # padded leaves -> straight-line unrolled leaf body
                    # (see megakernel.make_bounce_body)
                    def do_leaf(hs):
                        for k in range(static_leaf):
                            hs = body(start + k, hs)
                        return hs

                    hs = jax.lax.cond(anyhit & (count > 0), do_leaf,
                                      lambda hs: hs, hs)
                else:
                    count_eff = jnp.where(anyhit, count, 0)
                    hs = jax.lax.fori_loop(
                        start, start + count_eff, body, hs)
                # skip pointers are relative within one octant copy
                node_next = jnp.where(anyhit & (count == 0),
                                      rel + 1, skip)
                return (node_next, *hs)

            out = jax.lax.while_loop(t_cond, t_body, (jnp.int32(0), *hs0))
            return out[2], out[1] < _INF, out[3:]

        def gather_attrs(idx_f):
            """Attrs for every lane by index — exact one-hot MXU
            extraction (megakernel._onehot_attrs; replaces a serial
            distinct-winner loop whose trip count, ~#distinct winners
            per tile, dominated large-scene PASS 2)."""
            return _onehot_attrs(fat_ref[:, :], fat_pad, idx_f)


        def silhouette_terms(ro3, rd3, thr3, attrs, scat, missed, v3,
                             dacc3, g_attrs):
            """Silhouette (boundary) gradients — the Pallas twin of
            adjoint._trace_bwd's soft-coverage straight-through terms
            (adjoint.py boundary()): only d(alpha) enters, scaled by
            the radiance jump the coverage flip would cause.  ONE
            definition shared by both PASS-2 variants (per-sample and
            windowed refill): hit-side terms are folded into
            ``g_attrs`` (returned) and the near-miss side is scattered
            directly.  ``v3`` is the sample's total radiance, ``dacc3``
            the lane's cotangent scale."""
            ox, oy, oz = ro3
            dx, dy, dz = rd3
            cr, cg, cb = thr3
            v_r, v_g, v_b = v3
            da_r, da_g, da_b = dacc3
            vw = np.float32(vis_w)
            skr, skg, skb = _sky(dx, dy, dz)
            a_d = _dot3(dx, dy, dz, dx, dy, dz)

            def boundary(C_x, C_y, C_z, R_, jr, jg, jb, mask):
                ocx = ox - C_x
                ocy = oy - C_y
                ocz = oz - C_z
                hb = ocx * dx + ocy * dy + ocz * dz
                c_ = (_dot3(ocx, ocy, ocz, ocx, ocy, ocz)
                      - R_ * R_)
                disc = hb * hb - a_d * c_
                sref = a_d * vw
                sig = 1.0 / (1.0 + jnp.exp(-disc / sref))
                dsig = sig * (1.0 - sig) / sref
                w_ct = da_r * jr + da_g * jg + da_b * jb
                f = jnp.where(mask, dsig * w_ct, 0.0)
                # d disc/d center = 2a*oc - 2hb*d; /d radius = 2aR
                return (f * (2 * a_d * ocx - 2 * hb * dx),
                        f * (2 * a_d * ocy - 2 * hb * dy),
                        f * (2 * a_d * ocz - 2 * hb * dz),
                        f * (2 * a_d * R_))

            # hit side: losing coverage switches this sample's
            # radiance from its traced value to throughput * sky;
            # rides the existing per-winner scatter via g_attrs
            bcx, bcy, bcz, brad = boundary(
                attrs[0], attrs[1], attrs[2], attrs[3],
                v_r - cr * skr, v_g - cg * skg, v_b - cb * skb,
                scat)
            g_attrs = (g_attrs[0] + bcx, g_attrs[1] + bcy,
                       g_attrs[2] + bcz, g_attrs[3] + brad,
                       *g_attrs[4:])

            # miss side: nearest forward near-miss sphere gaining
            # coverage (argmax of negative discriminant,
            # adjoint._near_miss_sweep), with the crude one
            # -diffuse-bounce radiance estimate
            def nm_body(j, st):
                (best, bi_m, m_cx, m_cy, m_cz, m_rad,
                 m_mt, m_ar, m_ag, m_ab) = st
                s_cx = sc_ref[0, j]
                s_cy = sc_ref[1, j]
                s_cz = sc_ref[2, j]
                s_rad = sc_ref[3, j]
                s_mt = sc_ref[4, j]
                s_ar = sc_ref[5, j]
                s_ag = sc_ref[6, j]
                s_ab = sc_ref[7, j]
                ocx = ox - s_cx
                ocy = oy - s_cy
                ocz = oz - s_cz
                hb = ocx * dx + ocy * dy + ocz * dz
                c_ = (_dot3(ocx, ocy, ocz, ocx, ocy, ocz)
                      - s_rad * s_rad)
                disc = hb * hb - a_d * c_
                sc = jnp.where((hb < 0) & (disc < 0), disc, -_INF)
                win = sc > best
                return (jnp.where(win, sc, best),
                        jnp.where(win, j.astype(jnp.float32),
                                  bi_m),
                        jnp.where(win, s_cx, m_cx),
                        jnp.where(win, s_cy, m_cy),
                        jnp.where(win, s_cz, m_cz),
                        jnp.where(win, s_rad, m_rad),
                        jnp.where(win, s_mt, m_mt),
                        jnp.where(win, s_ar, m_ar),
                        jnp.where(win, s_ag, m_ag),
                        jnp.where(win, s_ab, m_ab))

            nm0 = (zero - _INF, zero, zero, zero, zero, one,
                   zero, zero, zero, zero)
            (best, bi_m, m_cx, m_cy, m_cz, m_rad,
             m_mt, m_ar, m_ag, m_ab) = jax.lax.fori_loop(
                0, dyn_nsph, nm_body, nm0)
            nm_mask = missed & (best > -_INF)
            # covered-radiance estimate by material at the
            # grazing boundary (adjoint._trace_bwd's twin):
            # diffuse -> alb * sky(boundary normal); metal ->
            # alb * sky(reflect); glass -> sky(reflect), unit
            # attenuation (grazing Schlick -> 1)
            mocx = ox - m_cx
            mocy = oy - m_cy
            mocz = oz - m_cz
            hb_m = mocx * dx + mocy * dy + mocz * dz
            t_ca = -hb_m / a_d
            nbx, nby, nbz = _normalize3(mocx + t_ca * dx,
                                        mocy + t_ca * dy,
                                        mocz + t_ca * dz)
            udx, udy, udz = _normalize3(dx, dy, dz)
            rfx, rfy, rfz = _reflect(udx, udy, udz,
                                     nbx, nby, nbz)
            n_r, n_g, n_b = _sky(nbx, nby, nbz)
            f_r, f_g, f_b = _sky(rfx, rfy, rfz)
            is_dm = m_mt == 0.0
            is_gm = m_mt == 2.0

            def est(alb_c, sky_n, sky_f):
                return jnp.where(
                    is_dm, alb_c * sky_n,
                    jnp.where(is_gm, sky_f, alb_c * sky_f))

            mcx, mcy, mcz, mrad = boundary(
                m_cx, m_cy, m_cz, m_rad,
                cr * est(m_ar, n_r, f_r) - v_r,
                cg * est(m_ag, n_g, f_g) - v_g,
                cb * est(m_ab, n_b, f_b) - v_b,
                nm_mask)

            zz = zero
            scatter_attr_grads(
                jnp.where(nm_mask, bi_m, -1.0),
                (mcx, mcy, mcz, mrad, zz, zz, zz, zz, zz))
            return g_attrs

        def fwd_sample(sd, store, s):
            """One sample's forward; optionally stores residuals.

            With ``store_idx``, PASS 1 (store=False) records the winner
            index per bounce into idx_ref and PASS 2 (store=True)
            replays from it — a distinct-winner attribute gather instead
            of re-running the whole closest-hit sweep.
            """
            ray, u, v, lens, sd = gen_ray(sd)
            ox, oy, oz, dx, dy, dz = ray

            def cond(st):
                return (st[0] < dyn_depth) & (jnp.max(st[13]) > 0)

            def body(st):
                (d, ox, oy, oz, dx, dy, dz, cr, cg, cb, rr, rg, rb,
                 alive_f, sd_t) = st
                alive = alive_f > 0
                if store and store_idx:
                    raw = idx_ref[s, d]
                    hit_any = raw >= 0
                    idx_f = jnp.maximum(raw, 0.0)
                    attrs = gather_attrs(idx_f)
                else:
                    idx_f, hit_any, attrs = closest_hit(
                        ox, oy, oz, dx, dy, dz, alive)
                if (not store) and store_idx:
                    idx_ref[s, d] = jnp.where(hit_any, idx_f, -1.0)
                mt = attrs[4]
                ok = (mt == 0.0) | (mt == 1.0) | (mt == 2.0)
                scat = alive & hit_any & ok
                missed = alive & ~hit_any
                if store:
                    res_ref[d, _R_OX] = ox
                    res_ref[d, _R_OY] = oy
                    res_ref[d, _R_OZ] = oz
                    res_ref[d, _R_DX] = dx
                    res_ref[d, _R_DY] = dy
                    res_ref[d, _R_DZ] = dz
                    res_ref[d, _R_CR] = cr
                    res_ref[d, _R_CG] = cg
                    res_ref[d, _R_CB] = cb
                    res_ref[d, _R_IDX] = idx_f
                    res_ref[d, _R_SCAT] = jnp.where(scat, 1.0, 0.0)
                    res_ref[d, _R_MISS] = jnp.where(missed, 1.0, 0.0)
                    res_ref[d, _R_SEED] = pltpu.bitcast(sd_t, jnp.float32)
                    for k in range(9):
                        res_ref[d, _R_ATTR0 + k] = attrs[k]
                n_ro, n_rd, n_thr, out = _bounce_f(
                    (ox, oy, oz), (dx, dy, dz), (cr, cg, cb), attrs,
                    (scat, missed), sd_t, t_min, cfg.scatter_mode)
                _, sd_new = rng.random_in_unit_sphere(sd_t)
                rr = rr + out[0]
                rg = rg + out[1]
                rb = rb + out[2]
                sd_t = jnp.where(scat, sd_new, sd_t)
                # survivors are exactly the scattering lanes (missed ->
                # sky, hit-with-unknown-material -> absorbed)
                alive_f = jnp.where(scat, 1.0, 0.0)
                return (d + 1, *n_ro, *n_rd, *n_thr, rr, rg, rb,
                        alive_f, sd_t)

            st = (jnp.int32(0), ox, oy, oz, dx, dy, dz,
                  one, one, one, zero, zero, zero, one, sd)
            # no mask/idx clearing for early-exit-skipped depths: the
            # reverse sweep reads residuals only in [0, st[0]) — rows
            # this while loop overwrites — and PASS 2's replay reaches
            # exactly PASS 1's exit depth (identical state evolution),
            # so stale rows beyond it are never read.  Boot garbage is
            # covered by the tile-start full_clr.
            st = jax.lax.while_loop(cond, body, st)
            # st[0] = bounces processed before the whole-tile exit: the
            # reverse sweep only needs [0, st[0]) — deeper residual rows
            # were neither written by this sample nor contribute (dead
            # lanes store scat = miss = 0)
            return (st[10], st[11], st[12]), st[14], (u, v, lens), st[0]

        # scratch boots as GARBAGE on hardware: inf/NaN at skipped depths
        # would poison the reverse sweep through 0 * inf in the where
        # transposes.  Benign defaults: unit direction, everything else 0.
        # (The refill PASS 2 needs no clearing: its reverse reads exactly
        # the rows [0, g_hi) that the SAME window's forward just wrote.)
        if not p2_refill:
            def full_clr(d, _):
                for k in range(_NRES):
                    res_ref[d, k] = one if k == _R_DZ else zero
                return 0

            jax.lax.fori_loop(0, dyn_depth, full_clr, 0)

        if tape_mode == "write":
            # image accumulation planes (megakernel flush pattern): the
            # output blocks hold the running per-pixel linear sums until
            # the final gamma conversion after the window loop
            zero_blk = jnp.zeros((multi_tile * _TILE_H, _TILE_W),
                                 jnp.float32)
            r_ref[:, :] = zero_blk
            g_ref[:, :] = zero_blk
            b_ref[:, :] = zero_blk

        # ---- PASS 1: forward all samples -> linear sums.  Elided when
        # the caller supplies the forward image (skip_p1): the cotangent
        # scale below needs only the gamma'd image, and parallel RNG
        # re-derives per-sample seeds — so the whole extra forward (the
        # dominant closest-hit sweep included) vanishes from the VJP.
        if tape_mode == "write":
            pass
        elif skip_p1:
            img_r = imgr_ref[:, :]
            img_g = imgg_ref[:, :]
            img_b = imgb_ref[:, :]
        else:
            def p1_body(s, carry):
                acc_r, acc_g, acc_b, sd = carry
                if parallel:
                    sd_s = rng.fold_in(sd, s)
                    seeds_ref[s] = pltpu.bitcast(sd_s, jnp.float32)
                    (r, g, b), _, _, _ = fwd_sample(sd_s, False, s)
                    sd_out = sd
                else:
                    seeds_ref[s] = pltpu.bitcast(sd, jnp.float32)
                    (r, g, b), sd_out, _, _ = fwd_sample(sd, False, s)
                return acc_r + r, acc_g + g, acc_b + b, sd_out

            acc_r, acc_g, acc_b, _ = jax.lax.fori_loop(
                0, dyn_spp, p1_body, (zero, zero, zero, seed0))

            def to_gamma(x):
                safe = jnp.where(x > 0, x, 1.0)
                return jnp.where(x > 0, jnp.exp(jnp.log(safe) / gamma),
                                 0.0)

            img_r = to_gamma(acc_r * inv_spp)
            img_g = to_gamma(acc_g * inv_spp)
            img_b = to_gamma(acc_b * inv_spp)

        if tape_mode != "write":
            r_ref[:, :] = img_r
            g_ref[:, :] = img_g
            b_ref[:, :] = img_b

            # cotangent of the linear per-sample radiance:
            # d img/d acc = (1/gamma)*img^(1-gamma)/spp (0 where acc<=0)
            def dacc(img, ct):
                d = jnp.where(
                    img > 0,
                    jnp.exp(jnp.log(jnp.where(img > 0, img, 1.0))
                            * (1.0 - gamma)) / gamma,
                    0.0)
                return ct * d * inv_spp

            dacc_r = dacc(img_r, ctr_ref[:, :])
            dacc_g = dacc(img_g, ctg_ref[:, :])
            dacc_b = dacc(img_b, ctb_ref[:, :])

        # ---- PASS 2: per sample, re-forward with stores then reverse
        def p2_body(s, cam_sums):
            if skip_p1:
                # same derivation PASS 1 would have stored (parallel
                # mode never advances the pixel seed across samples)
                sd_s = rng.fold_in(seed0, s)
            else:
                sd_s = pltpu.bitcast(seeds_ref[s], jnp.uint32)
            (v_r, v_g, v_b), _, (u, v, (ldx, ldy)), d_len = fwd_sample(
                sd_s, True, s)

            def rev_body(k, carry):
                d = d_len - 1 - k
                (d_ox, d_oy, d_oz, d_dx, d_dy, d_dz,
                 d_cr, d_cg, d_cb) = carry
                ox = res_ref[d, _R_OX]
                oy = res_ref[d, _R_OY]
                oz = res_ref[d, _R_OZ]
                dx = res_ref[d, _R_DX]
                dy = res_ref[d, _R_DY]
                dz = res_ref[d, _R_DZ]
                cr = res_ref[d, _R_CR]
                cg = res_ref[d, _R_CG]
                cb = res_ref[d, _R_CB]
                idx_f = res_ref[d, _R_IDX]
                scat = res_ref[d, _R_SCAT] > 0
                missed = res_ref[d, _R_MISS] > 0
                sd_t = pltpu.bitcast(res_ref[d, _R_SEED], jnp.uint32)
                # winner attrs were stored by the PASS-2 forward — no
                # per-bounce gather in the reverse sweep
                attrs = tuple(res_ref[d, _R_ATTR0 + k] for k in range(9))

                def f(ro, rd, thr, attrs):
                    return _bounce_f(ro, rd, thr, attrs,
                                     (scat, missed), sd_t, t_min,
                                     cfg.scatter_mode)

                _, vjp = jax.vjp(f, (ox, oy, oz), (dx, dy, dz),
                                 (cr, cg, cb), attrs)
                (n_ro, n_rd, n_thr, g_attrs) = vjp(
                    ((d_ox, d_oy, d_oz), (d_dx, d_dy, d_dz),
                     (d_cr, d_cg, d_cb), (dacc_r, dacc_g, dacc_b)))

                if vis_w > 0:
                    g_attrs = silhouette_terms(
                        (ox, oy, oz), (dx, dy, dz), (cr, cg, cb),
                        attrs, scat, missed, (v_r, v_g, v_b),
                        (dacc_r, dacc_g, dacc_b), g_attrs)

                # attr cotangents -> per-winner accumulator rows via
                # the one-hot matmul (masked lanes contribute nothing)
                scatter_attr_grads(jnp.where(scat, idx_f, -1.0),
                                   g_attrs)
                return (*n_ro, *n_rd, *n_thr)

            carry = tuple(zero for _ in range(9))
            # trip count = this sample's tile-max path length (not the
            # static depth): short-path tiles skip the dead tail's
            # attribute gathers and bounce VJPs entirely
            carry = jax.lax.fori_loop(0, d_len, rev_body, carry)
            (d_ox, d_oy, d_oz, d_dx, d_dy, d_dz, _, _, _) = carry

            # effective origin cotangent: the ray dir d = L + uH + vV - o
            # consumes o with weight -1, so everything the ORIGIN node
            # feeds (c_origin and the lens offset) sees d_o - d_d
            eo_x = d_ox - d_dx
            eo_y = d_oy - d_dy
            eo_z = d_oz - d_dz

            # raygen cotangent sums (assembled on the host)
            sums = (
                jnp.sum(eo_x), jnp.sum(eo_y), jnp.sum(eo_z),
                jnp.sum(d_dx), jnp.sum(d_dy), jnp.sum(d_dz),
                jnp.sum(u * d_dx), jnp.sum(u * d_dy), jnp.sum(u * d_dz),
                jnp.sum(v * d_dx), jnp.sum(v * d_dy), jnp.sum(v * d_dz),
                jnp.sum(ldx * eo_x), jnp.sum(ldx * eo_y),
                jnp.sum(ldx * eo_z),
                jnp.sum(ldy * eo_x), jnp.sum(ldy * eo_y),
                jnp.sum(ldy * eo_z),
            )
            # Kahan-compensated across the spp chain: d_origin is a
            # ~800x-cancelling difference of these sums (see
            # scripts/probe_cam_grad.py), so sequential f32 adds over
            # spp x tiles are the one noise source we CAN remove
            out = []
            comp = []
            for i in range(_NCAM_SUMS):
                s, c = cam_sums[i], cam_sums[_NCAM_SUMS + i]
                y = sums[i] - c
                t = s + y
                comp.append((t - s) - y)
                out.append(t)
            return (*out, *comp)

        def kahan_fold(i, v):
            # cross-tile/window chain: compensated adds, SMEM slots
            # [32, 50) hold the running compensations
            y = v - gcam_acc[0, 32 + i]
            t = gcam_acc[0, i] + y
            gcam_acc[0, 32 + i] = (t - gcam_acc[0, i]) - y
            gcam_acc[0, i] = t

        if not p2_refill:
            cam_sums = jax.lax.fori_loop(
                0, dyn_spp, p2_body,
                tuple(jnp.float32(0.0) for _ in range(2 * _NCAM_SUMS)))
            for i in range(_NCAM_SUMS):
                kahan_fold(i, cam_sums[i])
        else:
            # ---- PASS 2, windowed persistent refill (round-3 rework of
            # the per-sample scheme above; parallel RNG + image operand
            # only).  The per-sample loops pay the forward megakernel's
            # old occupancy pathology TWICE: ray-alive falls to a few %
            # after bounce 3 but both the stored forward and the reverse
            # sweep run to the tile-max path length of every sample.
            # Here the forward is the SAME persistent-refill state
            # machine as the render (a lane whose sample dies respawns
            # its pixel's next sample immediately — fold_in streams make
            # respawn seeds order-free), storing _NWREFILL residual
            # planes per GLOBAL STEP; one reverse sweep then walks the
            # steps backward at the same ~100% occupancy.  Per-lane
            # FRESH/FIN flags delimit sample segments: samples are
            # independent (their radiances add linearly into the pixel
            # mean, so every bounce's `out` cotangent is the same dacc),
            # which makes reverse-global-step order equal to reversing
            # each lane's segments newest-first — correct as long as the
            # ray/throughput carry is cut at segment boundaries:
            #   - at a FRESH step, the pre-state cotangent is the raygen
            #     output cotangent -> fold into the 18 camera-sum
            #     accumulator planes (u/v/lens draws re-derived from the
            #     stored sample index by fold_in) and zero the carry;
            #   - at a FIN step, the sample's total radiance (needed by
            #     the vis_w silhouette terms) is recomputed exactly as
            #     missed ? throughput * sky : 0 — a sample misses at
            #     most once, at its terminal step (make_bounce_body's
            #     add-once invariant), so no radiance planes are stored.
            # The residual buffer holds p2_steps rows; a dying lane only
            # respawns while a full-depth sample still fits (g + depth
            # <= p2_steps), else it PARKS at the sample boundary and the
            # outer window loop re-spawns it after the reverse sweep.
            depth_f = dyn_depth.astype(jnp.float32)
            spp_f = dyn_spp.astype(jnp.float32)
            mt_f = jnp.float32(multi_tile)
            g_cap = jnp.int32(p2_steps)
            px_u = px.astype(jnp.uint32)

            def seed0_at(m_pl):
                """Pixel seed of the lane's CURRENT group tile (m_pl
                block_h-row hops below the instance's first block)."""
                if multi_tile == 1:
                    return seed0
                m_i = m_pl.astype(jnp.int32)
                return rng.pixel_seed(
                    px_u, (py + block_h * m_i).astype(jnp.uint32))

            def fy_at(m_pl):
                if multi_tile == 1:
                    return None
                return fy + jnp.float32(block_h) * m_pl

            def sel_m(m_pl, full):
                """(multi_tile*8, 128) stacked plane -> the lane's own
                tile's (8, 128) rows."""
                out = full[0:_TILE_H]
                for mm in range(1, multi_tile):
                    out = jnp.where(
                        m_pl == jnp.float32(mm),
                        full[mm * _TILE_H:(mm + 1) * _TILE_H], out)
                return out

            def win_cond(st):
                return jnp.max(st[10]) > 0

            if tape_mode == "write":
                def flush(mask, m_sel, fr, fgg, fbb):
                    # predicated RMW into the finished block's rows —
                    # tile_done is rare, so the whole unrolled RMW runs
                    # only when some lane finished a tile (megakernel
                    # make_refill_step's flush, op-for-op)
                    @pl.when(jnp.max(jnp.where(mask, 1.0, 0.0)) > 0)
                    def _():
                        for m in range(multi_tile):
                            mm = mask & (m_sel == jnp.float32(m))
                            sl = slice(m * _TILE_H, (m + 1) * _TILE_H)
                            for ref, v in ((r_ref, fr), (g_ref, fgg),
                                           (b_ref, fbb)):
                                cur = ref[sl, :]
                                ref[sl, :] = jnp.where(mm, cur + v, cur)

            def win_body(st):
                if tape_mode == "write":
                    (g, ox, oy, oz, dx, dy, dz, cr, cg, cb,
                     alive_f, sd, s_cur, d_pl, fresh, m_pl,
                     goff, rr, rg, rb, ar, ag, ab) = st
                elif tape_mode == "read":
                    (g, ox, oy, oz, dx, dy, dz, cr, cg, cb,
                     alive_f, sd, s_cur, d_pl, fresh, m_pl, goff) = st
                else:
                    (g, ox, oy, oz, dx, dy, dz, cr, cg, cb,
                     alive_f, sd, s_cur, d_pl, fresh, m_pl) = st
                alive = alive_f > 0
                if tape_mode == "read":
                    # winner index from the HBM tape — NO closest-hit
                    # sweep (87% of the classic VJP kernel's window
                    # forward, probe_bwd_roofline_r5).  2-slot prefetch
                    # pipeline: wait this step's plane, consume, start
                    # the copy for step t+2 into the freed slot.  The
                    # DMA bookkeeping is UNCONDITIONAL (one wait + one
                    # start per step keeps the semaphore pairing exact);
                    # steps past the tape's capacity fall back to the
                    # sweep below (partial-tape mode).
                    t_true = goff + g
                    t_abs = jnp.minimum(t_true, jnp.int32(tape_gcap - 1))
                    slot = jax.lax.rem(t_abs, 2)
                    pltpu.make_async_copy(
                        tape_ref.at[ti, tj, t_abs], t_stage.at[slot],
                        t_sem.at[slot]).wait()
                    raw = t_stage[slot]
                    nxt = jnp.minimum(t_abs + 2,
                                      jnp.int32(tape_gcap - 1))
                    pltpu.make_async_copy(
                        tape_ref.at[ti, tj, nxt], t_stage.at[slot],
                        t_sem.at[slot]).start()

                    def from_tape(_):
                        hit_any = raw >= 0
                        idx_f = jnp.maximum(raw, 0.0)
                        # exact one-hot extraction of the winner's
                        # attrs (miss lanes gather column 0 — every
                        # downstream use is scat/missed-masked, and the
                        # residual store re-masks to match the classic
                        # kernel bit-for-bit)
                        return (idx_f, hit_any,
                                gather_attrs(idx_f))

                    if tape_partial:
                        # PARTIAL tape (the worst-case schedule bound
                        # exceeded the byte budget, e.g. refv2's depth
                        # -50 x 60 spp): steps beyond the tape re-run
                        # the sweep — a whole-tile scalar cond, so
                        # typical frames (actual steps << worst case)
                        # stay sweep-free and correctness never depends
                        # on the tape size.  Threshold g_cap - 1, not
                        # g_cap: the writer CLAMPS overflow writes into
                        # the last slot, trashing it — so that slot is
                        # only trustworthy when overflow is impossible
                        # (the full-tape branch below).  Bool vectors
                        # cannot ride scf.if on Mosaic (the i1-vector
                        # class, CLAUDE.md) — the hit mask crosses the
                        # cond as f32.
                        def _f(fn):
                            def g(_):
                                i, h, a = fn(_)
                                return (i, jnp.where(h, 1.0, 0.0), a)
                            return g

                        idx_f, hit_f, attrs = jax.lax.cond(
                            t_true < jnp.int32(tape_gcap - 1),
                            _f(from_tape),
                            _f(lambda _: closest_hit(
                                ox, oy, oz, dx, dy, dz, alive)),
                            0)
                        hit_any = hit_f > 0
                    else:
                        idx_f, hit_any, attrs = from_tape(0)
                else:
                    idx_f, hit_any, attrs = closest_hit(
                        ox, oy, oz, dx, dy, dz, alive)
                mt = attrs[4]
                ok = (mt == 0.0) | (mt == 1.0) | (mt == 2.0)
                scat = alive & hit_any & ok
                missed = alive & ~hit_any
                d_next = jnp.where(alive, d_pl + 1.0, d_pl)
                fin = alive & ((~scat) | (d_next >= depth_f))
                flags = (jnp.where(scat, _F_SCAT, 0)
                         | jnp.where(missed, _F_MISS, 0)
                         | jnp.where(fresh > 0, _F_FRESH, 0)
                         | jnp.where(fin, _F_FIN, 0)).astype(jnp.int32)
                if tape_mode == "write":
                    # stream this step's winner plane to the HBM tape
                    # (2-slot staging: wait the copy issued two steps
                    # ago on this slot before overwriting it).  The
                    # index clamp is defensive only: tape_plan's g_cap
                    # is a proven worst-case bound (+1 window margin),
                    # so the clamp never fires in practice — it turns a
                    # hypothetical bound bug into a stale-plane read
                    # instead of an out-of-bounds DMA.
                    t_abs = jnp.minimum(goff + g, jnp.int32(tape_gcap - 1))
                    slot = jax.lax.rem(t_abs, 2)

                    @pl.when(t_abs >= 2)
                    def _():
                        pltpu.make_async_copy(
                            t_stage.at[slot],
                            tape_ref.at[ti, tj, t_abs],
                            t_sem.at[slot]).wait()

                    _dbg = __import__("os").environ.get(
                        "RAYTPU_TAPE_DEBUG", "")
                    if _dbg:
                        # diagnostic: record a state plane instead of
                        # the winner index (tape becomes unusable for
                        # replay — debugging only)
                        t_stage[slot] = {
                            "dx": dx, "dy": dy, "dz": dz, "ox": ox,
                            "oy": oy, "oz": oz, "cr": cr,
                            "sd": pltpu.bitcast(sd, jnp.float32),
                        }[_dbg]
                    else:
                        t_stage[slot] = jnp.where(hit_any, idx_f, -1.0)
                    pltpu.make_async_copy(
                        t_stage.at[slot], tape_ref.at[ti, tj, t_abs],
                        t_sem.at[slot]).start()
                if tape_mode != "write" and "nostore" not in _ABL:
                    res_ref[g, _WR_OX] = ox
                    res_ref[g, _WR_OY] = oy
                    res_ref[g, _WR_OZ] = oz
                    res_ref[g, _WR_DX] = dx
                    res_ref[g, _WR_DY] = dy
                    res_ref[g, _WR_DZ] = dz
                    res_ref[g, _WR_CR] = cr
                    res_ref[g, _WR_CG] = cg
                    res_ref[g, _WR_CB] = cb
                    res_ref[g, _WR_IDX] = jnp.where(scat, idx_f, -1.0)
                    res_ref[g, _WR_FLG] = pltpu.bitcast(flags,
                                                        jnp.float32)
                    res_ref[g, _WR_SEED] = pltpu.bitcast(sd, jnp.float32)
                    res_ref[g, _WR_SPL] = s_cur
                    res_ref[g, _WR_MPL] = m_pl
                    if p2_attrs:
                        # masked like the reverse's gather-by-stored-idx
                        # (idx = -1 for non-scat lanes -> all-zero
                        # attrs), so the reverse reads bit-identical
                        # values
                        for _k in range(9):
                            res_ref[g, _WR_ATTR0 + _k] = jnp.where(
                                scat, attrs[_k], 0.0)
                n_ro, n_rd, n_thr, _out = _bounce_f(
                    (ox, oy, oz), (dx, dy, dz), (cr, cg, cb), attrs,
                    (scat, missed), sd, t_min, cfg.scatter_mode)
                _, sd_new = rng.random_in_unit_sphere(sd)
                sd = jnp.where(scat, sd_new, sd)
                ox, oy, oz = n_ro
                dx, dy, dz = n_rd
                cr, cg, cb = n_thr
                if tape_mode == "write":
                    # per-sample radiance (out is nonzero only at the
                    # miss step — megakernel add-once invariant)
                    rr = rr + _out[0]
                    rg = rg + _out[1]
                    rb = rb + _out[2]
                s_next = jnp.where(fin, s_cur + 1.0, s_cur)
                tile_done = fin & (s_next >= spp_f)
                m_next = jnp.where(tile_done, m_pl + 1.0, m_pl)
                s_eff = jnp.where(tile_done, 0.0, s_next)
                can = (g + 1 + dyn_depth) <= g_cap
                more = fin & (m_next < mt_f) & can
                if tape_mode == "write":
                    # fold finished samples into the per-lane tile
                    # accumulator; flush exhausted tiles into the output
                    # block (sample order per pixel = the megakernel's,
                    # so images stay bit-compatible)
                    fr_ = ar + rr
                    fg_ = ag + rg
                    fb_ = ab + rb
                    flush(tile_done, m_pl, fr_, fg_, fb_)
                    ar = jnp.where(tile_done, 0.0,
                                   jnp.where(fin, fr_, ar))
                    ag = jnp.where(tile_done, 0.0,
                                   jnp.where(fin, fg_, ag))
                    ab = jnp.where(tile_done, 0.0,
                                   jnp.where(fin, fb_, ab))
                    rr = jnp.where(fin, 0.0, rr)
                    rg = jnp.where(fin, 0.0, rg)
                    rb = jnp.where(fin, 0.0, rb)
                sd_r = rng.fold_in(
                    seed0_at(m_next),
                    s_eff.astype(jnp.int32).astype(jnp.uint32))
                nray, _, _, _, sd_n = gen_ray(sd_r, fy_at(m_next))
                nox, noy, noz, ndx, ndy, ndz = nray
                ox = jnp.where(more, nox, ox)
                oy = jnp.where(more, noy, oy)
                oz = jnp.where(more, noz, oz)
                dx = jnp.where(more, ndx, dx)
                dy = jnp.where(more, ndy, dy)
                dz = jnp.where(more, ndz, dz)
                cr = jnp.where(more, 1.0, cr)
                cg = jnp.where(more, 1.0, cg)
                cb = jnp.where(more, 1.0, cb)
                sd = jnp.where(more, sd_n, sd)
                alive_f = jnp.where(
                    fin, jnp.where(more, 1.0, 0.0), alive_f)
                d_pl = jnp.where(more, 0.0, d_next)
                fresh = jnp.where(more, 1.0, 0.0)
                s_cur = jnp.where(fin, s_eff, s_cur)
                base = (g + 1, ox, oy, oz, dx, dy, dz, cr, cg, cb,
                        alive_f, sd, s_cur, d_pl, fresh, m_next)
                if tape_mode == "write":
                    return (*base, goff, rr, rg, rb, ar, ag, ab)
                if tape_mode == "read":
                    return (*base, goff)
                return base

            def outer_body(carry_out):
                if tape_mode == "write":
                    s_pl, m_pl, goff, ar0, ag0, ab0 = carry_out
                elif tape_mode == "read":
                    s_pl, m_pl, goff = carry_out
                else:
                    s_pl, m_pl = carry_out
                pending = m_pl < mt_f
                sd_r = rng.fold_in(
                    seed0_at(m_pl),
                    s_pl.astype(jnp.int32).astype(jnp.uint32))
                ray0, _, _, _, sd_i = gen_ray(sd_r, fy_at(m_pl))
                iox, ioy, ioz, idxr, idyr, idzr = ray0
                pf = jnp.where(pending, 1.0, 0.0)
                st = (jnp.int32(0), iox, ioy, ioz, idxr, idyr, idzr,
                      one, one, one, pf, sd_i, s_pl, zero, pf, m_pl)
                if tape_mode == "write":
                    st = (*st, goff, zero, zero, zero, ar0, ag0, ab0)
                elif tape_mode == "read":
                    st = (*st, goff)
                st = jax.lax.while_loop(win_cond, win_body, st)
                g_hi = st[0]
                s_pl_out = st[12]
                m_pl_out = st[15]
                if tape_mode == "write":
                    # no reverse in the taping forward: carry the tape
                    # offset and the parked lanes' tile accumulators
                    return (s_pl_out, m_pl_out, goff + g_hi,
                            st[20], st[21], st[22])

                def rev_body(k, carry):
                    g = g_hi - 1 - k
                    (d_ox, d_oy, d_oz, d_dx, d_dy, d_dz,
                     d_cr, d_cg, d_cb, v_r, v_g, v_b) = carry[:12]
                    sums = carry[12:]
                    ox = res_ref[g, _WR_OX]
                    oy = res_ref[g, _WR_OY]
                    oz = res_ref[g, _WR_OZ]
                    dx = res_ref[g, _WR_DX]
                    dy = res_ref[g, _WR_DY]
                    dz = res_ref[g, _WR_DZ]
                    cr = res_ref[g, _WR_CR]
                    cg = res_ref[g, _WR_CG]
                    cb = res_ref[g, _WR_CB]
                    idx_f = res_ref[g, _WR_IDX]
                    flags = pltpu.bitcast(res_ref[g, _WR_FLG], jnp.int32)
                    scat = (flags & _F_SCAT) > 0
                    missed = (flags & _F_MISS) > 0
                    fresh = (flags & _F_FRESH) > 0
                    fin = (flags & _F_FIN) > 0
                    sd_t = pltpu.bitcast(res_ref[g, _WR_SEED], jnp.uint32)
                    s_g = res_ref[g, _WR_SPL]
                    m_g = res_ref[g, _WR_MPL]
                    # the lane's own group tile's cotangent scale
                    dacc_r_g = sel_m(m_g, dacc_r)
                    dacc_g_g = sel_m(m_g, dacc_g)
                    dacc_b_g = sel_m(m_g, dacc_b)
                    # winner attrs: re-gathered by the exact one-hot
                    # matmul (idx = -1 misses extract all-zero columns;
                    # every use downstream is guarded/masked), or read
                    # back from the stored planes (RAYTPU_P2_ATTRS)
                    if p2_attrs:
                        attrs = tuple(res_ref[g, _WR_ATTR0 + _k]
                                      for _k in range(9))
                    else:
                        attrs = gather_attrs(idx_f)
                    skr, skg, skb = _sky(dx, dy, dz)
                    # terminal step: the sample's total radiance — seen
                    # FIRST in reverse order, so it is live for every
                    # earlier step of the segment
                    v_r = jnp.where(fin,
                                    jnp.where(missed, cr * skr, 0.0), v_r)
                    v_g = jnp.where(fin,
                                    jnp.where(missed, cg * skg, 0.0), v_g)
                    v_b = jnp.where(fin,
                                    jnp.where(missed, cb * skb, 0.0), v_b)

                    if "novjp" in _ABL:
                        # timing-only ablation: cheap masked algebra of
                        # the same operands keeps the carries and the
                        # scatter operands live without the transpose
                        n_ro = (d_ox + dacc_r_g * ox,
                                d_oy + dacc_g_g * oy,
                                d_oz + dacc_b_g * oz)
                        n_rd = (d_dx + dacc_r_g * dx,
                                d_dy + dacc_g_g * dy,
                                d_dz + dacc_b_g * dz)
                        n_thr = (d_cr + cr, d_cg + cg, d_cb + cb)
                        g_attrs = tuple(a * d_ox for a in attrs)
                    else:
                        def f(ro, rd, thr, attrs_):
                            return _bounce_f(ro, rd, thr, attrs_,
                                             (scat, missed), sd_t, t_min,
                                             cfg.scatter_mode)

                        _, vjp = jax.vjp(f, (ox, oy, oz), (dx, dy, dz),
                                         (cr, cg, cb), attrs)
                        (n_ro, n_rd, n_thr, g_attrs) = vjp(
                            ((d_ox, d_oy, d_oz), (d_dx, d_dy, d_dz),
                             (d_cr, d_cg, d_cb),
                             (dacc_r_g, dacc_g_g, dacc_b_g)))

                    if vis_w > 0:
                        g_attrs = silhouette_terms(
                            (ox, oy, oz), (dx, dy, dz), (cr, cg, cb),
                            attrs, scat, missed, (v_r, v_g, v_b),
                            (dacc_r_g, dacc_g_g, dacc_b_g), g_attrs)

                    scatter_attr_grads(idx_f, g_attrs)

                    # FRESH steps: the pre-state cotangent is the raygen
                    # output's — fold into the camera-sum planes with
                    # the re-derived jitter/lens draws, cut the carry
                    eo_x = n_ro[0] - n_rd[0]
                    eo_y = n_ro[1] - n_rd[1]
                    eo_z = n_ro[2] - n_rd[2]
                    sd_rr = rng.fold_in(
                        seed0_at(m_g),
                        s_g.astype(jnp.int32).astype(jnp.uint32))
                    (j1a, _), sd2 = rng.hash2(sd_rr)
                    (_, j2b), sd2 = rng.hash2(sd2)
                    uu = (fx + j1a * 1.1) * inv_w
                    fy_g = fy if multi_tile == 1 else fy_at(m_g)
                    vv = (fy_g + j2b * 1.1) * inv_h
                    (ldx, ldy), _ = rng.random_in_unit_disk(sd2)
                    terms = (
                        eo_x, eo_y, eo_z,
                        n_rd[0], n_rd[1], n_rd[2],
                        uu * n_rd[0], uu * n_rd[1], uu * n_rd[2],
                        vv * n_rd[0], vv * n_rd[1], vv * n_rd[2],
                        ldx * eo_x, ldx * eo_y, ldx * eo_z,
                        ldy * eo_x, ldy * eo_y, ldy * eo_z,
                    )
                    sums = tuple(
                        s + jnp.where(fresh, tm, 0.0)
                        for s, tm in zip(sums, terms))
                    d_ox = jnp.where(fresh, 0.0, n_ro[0])
                    d_oy = jnp.where(fresh, 0.0, n_ro[1])
                    d_oz = jnp.where(fresh, 0.0, n_ro[2])
                    d_dx = jnp.where(fresh, 0.0, n_rd[0])
                    d_dy = jnp.where(fresh, 0.0, n_rd[1])
                    d_dz = jnp.where(fresh, 0.0, n_rd[2])
                    d_cr = jnp.where(fresh, 0.0, n_thr[0])
                    d_cg = jnp.where(fresh, 0.0, n_thr[1])
                    d_cb = jnp.where(fresh, 0.0, n_thr[2])
                    return (d_ox, d_oy, d_oz, d_dx, d_dy, d_dz,
                            d_cr, d_cg, d_cb, v_r, v_g, v_b, *sums)

                carry0 = tuple(zero for _ in range(12 + _NCAM_SUMS))
                g_rev = jnp.int32(0) if "norev" in _ABL else g_hi
                carry = jax.lax.fori_loop(0, g_rev, rev_body, carry0)
                for i in range(_NCAM_SUMS):
                    kahan_fold(i, jnp.sum(carry[12 + i]))
                if tape_mode == "read":
                    return (s_pl_out, m_pl_out, goff + g_hi)
                return (s_pl_out, m_pl_out)

            def outer_cond(carry_out):
                return jnp.min(carry_out[1]) < mt_f

            if tape_mode == "write":
                # prime nothing: the first two stage slots are written
                # before their first wait (guarded by t_abs >= 2)
                fin_c = jax.lax.while_loop(
                    outer_cond, outer_body,
                    (zero, zero, jnp.int32(0), zero, zero, zero))
                tot = fin_c[2]
                # drain BY SLOT, not by step index: each slot that ever
                # started has EXACTLY ONE outstanding copy at loop end
                # (the in-loop wait precedes every start).  With
                # partial-tape overflow the clamped final steps all
                # share one slot, so a by-index drain double-waits that
                # slot's semaphore and strands the other — observed as
                # a TPU worker crash (deadlocked DMA wait) on config-5
                # @ 500 spp.  Slot s first starts at step s, hence the
                # tot >= s+1 guards; the descriptor's index only sizes
                # the wait.
                t_d = jnp.minimum(tot - 1, jnp.int32(tape_gcap - 1))
                for _s in (0, 1):
                    if _s == 1 and tape_gcap < 2:
                        continue  # a 1-slot tape only ever uses slot 0

                    @pl.when(tot >= _s + 1)
                    def _(_s=_s):
                        pltpu.make_async_copy(
                            t_stage.at[_s],
                            tape_ref.at[ti, tj, jnp.maximum(t_d, 0)],
                            t_sem.at[_s]).wait()
                # linear sums -> display image (golden._to_gamma twin)
                inv_spp_f = jnp.float32(inv_spp)

                def _gam(x):
                    safe = jnp.where(x > 0, x, 1.0)
                    return jnp.where(
                        x > 0, jnp.exp(jnp.log(safe) / gamma), 0.0)

                r_ref[:, :] = _gam(r_ref[:, :] * inv_spp_f)
                g_ref[:, :] = _gam(g_ref[:, :] * inv_spp_f)
                b_ref[:, :] = _gam(b_ref[:, :] * inv_spp_f)
            elif tape_mode == "read":
                # prime the 2-slot prefetch pipeline for steps 0 and 1
                for _t0 in range(2):
                    _t0c = min(_t0, tape_gcap - 1)
                    pltpu.make_async_copy(
                        tape_ref.at[ti, tj, _t0c], t_stage.at[_t0],
                        t_sem.at[_t0]).start()
                jax.lax.while_loop(outer_cond, outer_body,
                                   (zero, zero, jnp.int32(0)))
                # two prefetches are always outstanding at exit
                for _s in range(2):
                    pltpu.make_async_copy(
                        tape_ref.at[ti, tj, 0], t_stage.at[_s],
                        t_sem.at[_s]).wait()
            else:
                jax.lax.while_loop(outer_cond, outer_body, (zero, zero))

        if tape_mode != "write":
            @pl.when(last)
            def _():
                gsc_ref[:, :] = gsc_acc[:, :]
                for i in range(32):
                    gcam_ref[0, i] = gcam_acc[0, i]

    return kernel


def render_pallas_vjp(scene: Scene, cam: Camera, cfg: RenderConfig, ct,
                      interpret: bool | None = None, bvh=None,
                      row0=0, rows=None, vma=None, vis_w: float = 0.0,
                      img=None, p2_refill: bool | None = None,
                      block_w: int | None = None, tape=None,
                      tape_partial: bool = False):
    """Fused image + VJP -> (img, d_scene, d_camera) for image cotangent
    ``ct``.  Pass a BVH to accelerate large scenes (the returned d_scene
    is in the ORIGINAL sphere order).

    ``(row0, rows)`` restrict to a row slab of the cfg-sized frame (for
    sharded execution; ``ct`` must then be the slab's (rows, W, 3)
    cotangent); ``vma`` declares varying mesh axes under shard_map.

    ``img`` (parallel RNG mode only): the already-rendered forward image
    for this (scene, cam, cfg) — elides the kernel's PASS-1 forward
    entirely (the cotangent scale needs only the gamma'd image and
    per-sample seeds re-derive by fold_in), cutting one full closest
    -hit sweep from the VJP.  The custom_vjp wrappers pass the image
    they already rendered.  Sequential RNG ignores it (sample seeds
    chain through the trace, so PASS 1 must run).

    ``p2_refill`` selects the windowed persistent-refill PASS 2 (see
    _make_grad_kernel) — requires the image operand (parallel RNG).
    ``None`` auto-engages it at the same scene-size threshold as the
    forward megakernel's refill loop (megakernel._REFILL_MIN; override
    with RAYTPU_GRAD_REFILL=0/1).  Gradients are allclose but not
    bit-equal to the per-sample PASS 2 (the (sample, bounce) terms add
    into the accumulators in a different order).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    h, w = (rows if rows is not None else cfg.height), cfg.width
    n = scene.count
    from raytpu.kernels.megakernel import (_scramble, _unscramble,
                                           _mt_for, _auto_block_w,
                                           _REFILL_MIN)
    tile_bytes = _TILE_H * _TILE_W * 4
    skip_p1 = img is not None and cfg.rng_mode == "parallel"
    import os as _os
    _env = _os.environ.get("RAYTPU_GRAD_REFILL")
    if p2_refill is None:
        p2_refill = (_env != "0"
                     and (scene.count >= _REFILL_MIN or _env == "1"))
    p2_refill = bool(p2_refill) and skip_p1
    if block_w is None:
        # block-frustum tiling for BVH scenes (the megakernel's win
        # ported to the VJP).  The refill PASS 2 also groups blocks
        # multi-tile, so its choice is mt-aware like the forward's;
        # the per-sample PASS 2 has no grouping — pure frustum shape
        # (32 measured best: config-4 fwd+bwd 365.9 strips / 341.5
        # b64 / 339.7 b32, pre-grouping)
        if bvh is None:
            block_w = _TILE_W
        elif p2_refill:
            block_w = _auto_block_w(cfg, n, h)
        else:
            block_w = 32
    block_h = (_TILE_H * _TILE_W) // block_w
    hp = -(-h // block_h) * block_h
    wp = -(-w // block_w) * block_w
    grid = (hp // block_h, wp // block_w)

    def lay(p):
        """Image-layout (hp, wp) plane -> kernel tile layout."""
        if block_w == _TILE_W:
            return p
        return _scramble(p, grid, block_h, block_w)
    perm_i = None
    if bvh is not None:
        from raytpu.bvh import permute_scene
        perm_i = bvh.perm.astype(jnp.int32)
        scene_k = permute_scene(scene, bvh.perm)
        # padded-leaf BVHs have MORE kernel-side entries than real
        # spheres (dummies); accumulators must span them all
        nk = int(bvh.perm.shape[0])
    else:
        scene_k = scene
        nk = n

    ct = jnp.asarray(ct, jnp.float32)
    ct_pad = jnp.zeros((hp, wp, 3), jnp.float32).at[:h, :w].set(ct)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    n_pad = max(-(-nk // 128) * 128, 128)
    # scene-grad output rides VMEM (vector-written once, at the final
    # grid step, from the VMEM accumulator); the 32 camera sums stay
    # SMEM scalars (Mosaic forbids scalar stores to VMEM)
    acc_sc = pl.BlockSpec((16, n_pad), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    acc_cam = pl.BlockSpec((1, 32), lambda i, j: (0, 0),
                           memory_space=pltpu.SMEM)

    def _shp(shape):
        if vma is None:
            return jax.ShapeDtypeStruct(shape, jnp.float32)
        return jax.ShapeDtypeStruct(shape, jnp.float32,
                                    vma=frozenset(vma))

    out_plane = _shp((grid[0] * _TILE_H, grid[1] * _TILE_W))

    use_flat = (bvh is not None and bvh.flat is not None
                and bvh.n_leaves <= _FLAT_MAX_LEAVES and _TIDX)
    m = 0 if bvh is None else (bvh.n_leaves if use_flat else bvh.n_trav)
    # with PASS 1 elided there is no index-recording pass; PASS 2's
    # forward runs the closest-hit sweep itself (once total — still one
    # fewer sweep than the PASS-1 + replay scheme)
    store_idx = (not skip_p1 and
                 cfg.spp * cfg.depth * tile_bytes <= _IDX_VMEM_BUDGET)
    # window size: as many residual-step rows as the VMEM budget allows,
    # never fewer than one full-depth sample, never more than the
    # worst-case total (spp * depth: every sample runs to the cap).
    # The plane count is depth-aware (_p2_attrs_for): deep bounces
    # favor the narrow 14-plane window (less parking drain).
    p2a = _p2_attrs_for(cfg.depth)
    nwr = _nwrefill(p2a)
    p2_steps = (max(cfg.depth, min(cfg.spp * cfg.depth,
                                   _P2_VMEM_BUDGET
                                   // (nwr * tile_bytes)))
                if p2_refill else 0)
    # multi-tile grouping (forward megakernel policy: largest divisor
    # of the row-block count <= _MULTI_TILE) — the refill PASS 2's
    # while-loop tail is paid once per group instead of per block; the
    # residual window spans the group (parking handles overflow)
    mt = _mt_for(h, block_w, cfg, n) if p2_refill else 1
    pgrid = (grid[0] // mt, grid[1])
    plane = pl.BlockSpec((mt * _TILE_H, _TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    packed = _pack_scene(scene_k)
    # attribute matrix for the one-hot winner extraction: used by the
    # flat (t, idx) sweep AND by PASS 2's stored-index replay gather on
    # every path (replaces the serial distinct-winner loop); padded to
    # n_pad so winner indices align with the grad accumulator columns
    fat, fat_pad = _pack_flat_at(packed, min_pad=n_pad)
    from raytpu.kernels.megakernel import _bvh_outliers
    outl = (None if bvh is None
            else _bvh_outliers(bvh.perm, bvh.flat, bvh.leaf_size))
    use_tape = tape is not None
    if use_tape:
        assert p2_refill and skip_p1, \
            "the tape replay rides the windowed refill PASS 2"
        assert tape.shape[:2] == pgrid and tape.shape[3:] == (
            _TILE_H, _TILE_W), (tape.shape, pgrid)
    kernel = _make_grad_kernel(
        cfg, n, n_nodes=m, store_idx=store_idx, vis_w=float(vis_w),
        static_leaf=None if bvh is None else bvh.leaf_size,
        flat_leaves=use_flat, fat_pad=fat_pad, skip_p1=skip_p1,
        outliers=outl, p2_refill=p2_refill, p2_steps=p2_steps,
        block_w=block_w, multi_tile=mt,
        tape_mode="read" if use_tape else "",
        tape_gcap=int(tape.shape[2]) if use_tape else 0,
        tape_partial=bool(tape_partial), p2_attrs=p2a)
    # nk, not n: dyn_nsph bounds the vis_w near-miss sweep, which runs
    # over the PERMUTED pack — real spheres sit at rows >= count when
    # leaves carry padding dummies (dummies are NaN and never win)
    operands = [_pack_camera(cam, cfg, nk, m, row0), packed]
    in_specs = [smem, smem]
    if bvh is not None:
        nd = bvh.flat if use_flat else bvh.nodes
        operands.append(nd.T.astype(jnp.float32))
        in_specs.append(smem)
    operands.append(fat)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if use_tape:
        # the winner-index tape stays in HBM; the kernel prefetches one
        # (8, 128) plane per step through a 2-slot DMA pipeline
        operands.append(jnp.asarray(tape, jnp.float32))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    operands += [lay(ct_pad[:, :, 0]), lay(ct_pad[:, :, 1]),
                 lay(ct_pad[:, :, 2])]
    in_specs += [plane, plane, plane]
    if skip_p1:
        img_pad = jnp.zeros((hp, wp, 3), jnp.float32).at[:h, :w].set(
            jnp.asarray(img, jnp.float32))
        operands += [lay(img_pad[:, :, 0]), lay(img_pad[:, :, 1]),
                     lay(img_pad[:, :, 2])]
        in_specs += [plane, plane, plane]
    scratch = [
        pltpu.VMEM((p2_steps, nwr, _TILE_H, _TILE_W), jnp.float32)
        if p2_refill else
        pltpu.VMEM((cfg.depth, _NRES, _TILE_H, _TILE_W), jnp.float32),
    ]
    if not skip_p1:
        scratch.append(
            pltpu.VMEM((cfg.spp, _TILE_H, _TILE_W), jnp.float32))
    if store_idx:
        scratch.append(
            pltpu.VMEM((cfg.spp, cfg.depth, _TILE_H, _TILE_W),
                       jnp.float32))
    scratch += [
        pltpu.VMEM((16, n_pad), jnp.float32),
        # 18 camera sums + 14 spare + 18 Kahan compensations
        pltpu.SMEM((1, 64), jnp.float32),
    ]
    if use_tape:
        scratch += [pltpu.VMEM((2, _TILE_H, _TILE_W), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))]
    r, g, b, gsc, gcam = pl.pallas_call(
        kernel,
        grid=pgrid,
        out_shape=(out_plane, out_plane, out_plane,
                   _shp((16, n_pad)), _shp((1, 32))),
        in_specs=in_specs,
        out_specs=(plane, plane, plane, acc_sc, acc_cam),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)

    if block_w != _TILE_W:
        r, g, b = (_unscramble(x, grid, block_h, block_w)
                   for x in (r, g, b))
    img = jnp.stack([r[:h, :w], g[:h, :w], b[:h, :w]], axis=-1)
    if perm_i is not None:
        # cotangents are in (padded) BVH leaf order: scatter back to
        # input order; dummy entries (perm == -1) are dropped via an
        # out-of-bounds index
        gsc = gsc[:, :nk]
        idx = jnp.where(perm_i >= 0, perm_i, n)
        gsc = jnp.zeros((16, n), jnp.float32).at[:, idx].set(
            gsc, mode="drop")
    else:
        gsc = gsc[:, :n]
    d_scene = Scene(
        center=gsc[0:3].T, radius=gsc[3], mat_type=None,
        albedo=gsc[5:8].T, mat_param=gsc[8],
    )
    # raygen transpose: assemble the Camera cotangent from the 18 sums
    s = gcam[0]
    sum_eo = s[0:3]        # effective origin cotangent (d_o - d_d)
    sum_dd = s[3:6]
    sum_udd = s[6:9]
    sum_vdd = s[9:12]
    sum_ldx_eo = s[12:15]
    sum_ldy_eo = s[15:18]
    lens_r = cam.lens_radius
    # pinhole (lens_r == 0): the forward's where() never consumes the
    # lens offset, so its cotangents are exactly zero
    live = jnp.where(lens_r > 0, 1.0, 0.0)
    d_cam = Camera(
        origin=sum_eo,
        horizontal=sum_udd,
        vertical=sum_vdd,
        lower_left=sum_dd,
        u=live * lens_r * sum_ldx_eo,
        v=live * lens_r * sum_ldy_eo,
        lens_radius=live * (jnp.dot(cam.u, sum_ldx_eo)
                            + jnp.dot(cam.v, sum_ldy_eo)),
    )
    return img, d_scene, d_cam


# ---- winner-index tape (round 5) -------------------------------------------
#
# The backward roofline (scripts/probe_bwd_roofline_r5.py, one v5e chip,
# config-4 @ 100 spp) showed the fused VJP kernel is 87% a DUPLICATED
# forward: 482.8 ms window-forward (closest-hit sweep dominated) + 73.1
# ms reverse, while the render forward had already swept the identical
# rays.  The tape removes the duplication: under jax.grad, the
# custom_vjp's forward runs ``render_tape_fwd`` — the same windowed/
# parked refill schedule as the VJP's PASS 2, streaming each step's
# winner index to an HBM tape — and the backward replays the tape
# (gather instead of sweep).  Gradients are BIT-IDENTICAL to the
# classic refill PASS 2: the state machines are the same code, and the
# classic kernel's attrs already come from the same one-hot gather.
#
# The tape is sized for the WORST CASE schedule (every sample runs to
# the depth cap) and gated by RAYTPU_TAPE_BUDGET bytes — workloads past
# the budget (e.g. REFERENCE_V2's depth-50 x 60 spp ~ 12 GB) keep the
# classic self-sweeping PASS 2.  RAYTPU_TAPE=0 disables.

_TAPE = __import__("os").environ.get("RAYTPU_TAPE", "1") != "0"
_TAPE_BUDGET = int(float(__import__("os").environ.get(
    "RAYTPU_TAPE_BUDGET", str(4 * 2**30))))


def _p2_plan(cfg: RenderConfig, n: int, bvh, h: int | None = None):
    """The (block_w, mt, p2_steps, grid, pgrid) the windowed refill
    PASS 2 will use — shared by the taping forward and the replay so
    their schedules agree by construction.  ``h`` overrides the frame
    height for row-slab (sharded) execution."""
    from raytpu.kernels.megakernel import _auto_block_w, _mt_for
    if h is None:
        h = cfg.height
    block_w = _TILE_W if bvh is None else _auto_block_w(cfg, n, h)
    block_h = (_TILE_H * _TILE_W) // block_w
    hp = -(-h // block_h) * block_h
    wp = -(-cfg.width // block_w) * block_w
    grid = (hp // block_h, wp // block_w)
    mt = _mt_for(h, block_w, cfg, n)
    tile_bytes = _TILE_H * _TILE_W * 4
    p2_steps = max(cfg.depth, min(cfg.spp * cfg.depth,
                                  _P2_VMEM_BUDGET
                                  // (_nwrefill(_p2_attrs_for(cfg.depth))
                                      * tile_bytes)))
    return block_w, mt, p2_steps, grid, (grid[0] // mt, grid[1])


def tape_plan(cfg: RenderConfig, n: int, bvh=None, vis_w: float = 0.0,
              interpret: bool = False, rows: int | None = None):
    """-> {"g_cap", "bytes", "partial"} when the taped backward
    applies, else None.

    Applies when: parallel RNG (fold_in streams), the refill PASS 2
    would engage, no silhouette terms (their near-miss sweep keeps the
    classic kernel), and compiled execution.  When the WORST-CASE
    schedule bound fits RAYTPU_TAPE_BUDGET the tape is full (replay is
    sweep-free by construction); otherwise the tape is sized to the
    budget and marked ``partial`` — the replay sweeps the (typically
    nonexistent) overflow steps, so correctness never depends on the
    tape size.  Partial only engages when the budget covers at least
    4x the EXPECTED step count (~2.5 bounces/sample average) — below
    that the replay would degenerate to the classic sweep anyway."""
    import os as _os
    if not _TAPE or vis_w != 0.0 or cfg.rng_mode != "parallel":
        return None
    from raytpu.kernels.megakernel import _REFILL_MIN
    env = _os.environ.get("RAYTPU_GRAD_REFILL")
    if env == "0" or not (n >= _REFILL_MIN or env == "1"):
        return None
    block_w, mt, p2_steps, grid, pgrid = _p2_plan(cfg, n, bvh, h=rows)
    d = cfg.depth
    # worst-case global steps: every busy lane completes at least
    # spw = (p2_steps - depth) // depth samples per window (respawn
    # allowed while g <= p2_steps - depth - 1; a sample lasts <= depth
    # steps), each lane owns mt * spp samples, and a window never
    # exceeds p2_steps steps.  One extra window of margin.
    spw = max(1, (p2_steps - d) // d)
    n_win = -(-mt * cfg.spp // spw) + 1
    g_worst = n_win * p2_steps
    plane_bytes = _TILE_H * _TILE_W * 4
    inst = pgrid[0] * pgrid[1]
    g_fit = _TAPE_BUDGET // (inst * plane_bytes)
    if g_worst <= g_fit:
        return {"g_cap": int(g_worst),
                "bytes": int(inst * g_worst * plane_bytes),
                "partial": False}
    # partial tape: budget-sized, sweep fallback past the cap.  Partial
    # COVERAGE helps proportionally (taped steps skip the sweep;
    # uncovered steps cost what the classic kernel already paid), so
    # engage whenever the expected coverage clears the taping forward's
    # parking overhead: sweep share ~0.8 of the window forward
    # (probe_bwd_roofline_r5) vs parking ~6% at depth <= 32 / up to
    # ~27% at depth 50 -> thresholds 0.15 / 0.5.  Measured: config-5 @
    # 500 spp (coverage ~0.34) 28.2 s classic -> taped, see BASELINE.
    g_expect = int(mt * cfg.spp * 2.5 * p2_steps
                   / max(p2_steps - d, 1)) + p2_steps
    cov = g_fit / max(g_expect, 1)
    if cov < (0.15 if d <= 32 else 0.5):
        return None
    return {"g_cap": int(g_fit),
            "bytes": int(inst * g_fit * plane_bytes),
            "partial": True}


def render_tape_fwd(scene: Scene, cam: Camera, cfg: RenderConfig,
                    g_cap: int, interpret: bool | None = None,
                    bvh=None, row0=0, rows: int | None = None,
                    vma=None):
    """The taping forward: -> (img, tape).

    Renders the image through the SAME windowed/parked refill schedule
    the replay VJP runs (one win_body, one parking rule — gradkernel
    ._make_grad_kernel tape_mode="write") while streaming each global
    step's winner-index plane to an HBM tape of ``g_cap`` steps per
    kernel instance.  The image is the megakernel's (same per-pixel
    sample order and accumulation chain).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    h, w = (rows if rows is not None else cfg.height), cfg.width
    n = scene.count
    from raytpu.kernels.megakernel import _scramble, _unscramble
    block_w, mt, p2_steps, grid, pgrid = _p2_plan(cfg, n, bvh, h=h)
    block_h = (_TILE_H * _TILE_W) // block_w

    if bvh is not None:
        from raytpu.bvh import permute_scene
        scene_k = permute_scene(scene, bvh.perm)
        nk = int(bvh.perm.shape[0])
    else:
        scene_k = scene
        nk = n

    n_pad = max(-(-nk // 128) * 128, 128)
    use_flat = (bvh is not None and bvh.flat is not None
                and bvh.n_leaves <= _FLAT_MAX_LEAVES and _TIDX)
    m = 0 if bvh is None else (bvh.n_leaves if use_flat else bvh.n_trav)
    packed = _pack_scene(scene_k)
    fat, fat_pad = _pack_flat_at(packed, min_pad=n_pad)
    from raytpu.kernels.megakernel import _bvh_outliers
    outl = (None if bvh is None
            else _bvh_outliers(bvh.perm, bvh.flat, bvh.leaf_size))

    kernel = _make_grad_kernel(
        cfg, n, n_nodes=m, store_idx=False, vis_w=0.0,
        static_leaf=None if bvh is None else bvh.leaf_size,
        flat_leaves=use_flat, fat_pad=fat_pad, skip_p1=True,
        outliers=outl, p2_refill=True, p2_steps=p2_steps,
        block_w=block_w, multi_tile=mt,
        tape_mode="write", tape_gcap=int(g_cap),
        p2_attrs=_p2_attrs_for(cfg.depth))

    operands = [_pack_camera(cam, cfg, nk, m, row0), packed]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    if bvh is not None:
        nd = bvh.flat if use_flat else bvh.nodes
        operands.append(nd.T.astype(jnp.float32))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    operands.append(fat)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    plane = pl.BlockSpec((mt * _TILE_H, _TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)

    def _shp(shape):
        if vma is None:
            return jax.ShapeDtypeStruct(shape, jnp.float32)
        return jax.ShapeDtypeStruct(shape, jnp.float32,
                                    vma=frozenset(vma))

    out_plane = _shp((grid[0] * _TILE_H, grid[1] * _TILE_W))
    tape_shape = _shp(
        (pgrid[0], pgrid[1], int(g_cap), _TILE_H, _TILE_W))

    r, g, b, tape = pl.pallas_call(
        kernel,
        grid=pgrid,
        out_shape=(out_plane, out_plane, out_plane, tape_shape),
        in_specs=in_specs,
        out_specs=(plane, plane, plane,
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[pltpu.VMEM((2, _TILE_H, _TILE_W), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(*operands)

    if block_w != _TILE_W:
        r, g, b = (_unscramble(x, grid, block_h, block_w)
                   for x in (r, g, b))
    img = jnp.stack([r[:h, :w], g[:h, :w], b[:h, :w]], axis=-1)
    return img, tape
