"""Sorted-wavefront renderer — ray reordering between bounce segments.

STATUS: EXPERIMENTAL / DEMOTED (round 4).  Settled against the refill
megakernel on hardware (scripts/probe_wavefront_settle.py +
probe_wf_settle2.py, one v5e chip, warm tunnel):

    config-4 @ 100 spp   megakernel 61.4 Mrays/s
                         wavefront  18.6 (spp_batch 1) / 15.6 (4)
                         / 15.9 (10) / 15.1 (20) / 10.1 (50)
    config-5 @ 20 spp    megakernel 69.0; wavefront 16.8 (1) / 14.7 (4)

The spp_batch-folding hypothesis below (bigger folds -> bigger sort
groups -> per-ray-like culling) is REFUTED: every fold size measured
SLOWER than spp_batch=1 — the sort's own cost grows with R faster than
the coherence it buys, and the refill megakernel's group-amortized
tail already captures most of the occupancy win at zero sort cost.
The engine stays for research (``render(backend="wavefront")``
explicitly; never auto-selected) and its tests keep running — the
sort/compaction machinery is the scaffold any future reordering
experiment would start from.

The megakernel (raytpu/kernels/megakernel.py) keeps each pixel-tile's
rays together for the whole spp x depth loop.  That is optimal for small
scenes, but for large scenes its tile-coherent BVH walk degrades: after
one diffuse bounce the 1024 rays of a tile point everywhere, so the
whole tile enters almost every node (the union of 1024 random frusta
covers the scene).  The reference has no analogue — its brute-force
loop (CSVersion/ShaderCompute.hlsl:188-205) pays N sphere tests per ray
per bounce regardless.

This module restructures the trace the TPU-native way, as a WAVEFRONT
over a flat ray array (SURVEY.md §7 hard-part 2):

- rays live in (R,) HBM planes, processed by a segment kernel that runs
  k bounces in VMEM registers per (8, 128) tile of CONSECUTIVE slots;
- between segments, rays are re-sorted by a (quantized hit position,
  direction octant) key — one ``lax.sort`` over all state planes — so
  the next segment's tiles are spatially/directionally coherent and the
  tile-coherent BVH walk culls again;
- dead rays get the +inf key, compacting them to the array tail where
  whole tiles early-exit in one step (the depth-50 tail of
  REFERENCE_V2 stops paying for dead lanes);
- radiance/throughput/seed ride IN-SLOT through every sort; pixel ids
  ride alongside, and ONE final scatter assembles the image after all
  samples — there is no per-wave unsort.
- wave k+1's primary rays reuse wave k's final slot order: slots end
  grouped by bounce-1 hit position, which is grouped by pixel
  neighborhood, so primary coherence survives without a restore sort.

Per-bounce math is raytpu.kernels.megakernel.make_bounce_body — the
SAME ops as the megakernel and golden.py, so images are bit-identical
to the golden oracle (asserted in tests/test_wavefront.py).

``spp_batch = B > 1`` folds B samples per pixel into the ray array
(R = B * n_pixels) — "parallel" RNG mode only (independent per-(pixel,
sample) counter streams; sequential seed chains force B = 1).  Folding
is the lever against the tile-union problem: sort-group sizes scale
with R, so with enough samples in flight each (rows x 128) kernel tile
is a single position/direction cluster and the tile-coherent BVH walk
culls like a per-ray walk would.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytpu import rng
from raytpu.camera import Camera, get_ray
from raytpu.config import RenderConfig
from raytpu.scene import Scene
from raytpu.kernels.megakernel import (
    _TILE_H, _TILE_W, make_bounce_body, make_gen_ray, make_refill_step,
    _bvh_outliers, _pack_camera, _pack_scene, _to_gamma,
)

_BLOCK = 32            # primary rays are laid out in 32x32 pixel blocks
_LANES = _TILE_H * _TILE_W
_DEAD_KEY = np.float32(1.0e9)
_QBITS_XZ = 32         # position-key buckets along x/z
_QBITS_Y = 8           # position-key buckets along y (height)
# rays per kernel tile = _ROWS x 128.  Bigger tiles amortize the BVH
# walk's serial per-node overhead (scalar loads + loop control between
# vector ops) over more rays; sorting keeps even 4096-ray tiles
# coherent.  Must be a multiple of 8.
_ROWS_DEFAULT = 32


def _make_segment_kernel(n_spheres: int, n_nodes: int, t_min, rows,
                         scatter_mode: str = "v2",
                         static_leaf: int | None = None,
                         flat_leaves: bool = False,
                         dense_pad: int | None = None,
                         flat_at_pad: int | None = None,
                         outliers: tuple | None = None):
    """Pallas kernel: run up to ``n_bounces`` bounces over one tile of
    consecutive ray slots, then emit the next sort key."""

    def kernel(scal_ref, sc_ref, *rest):
        mx_ref = at_ref = fat_ref = None
        if dense_pad:
            mx_ref, at_ref, *rest = rest
        if flat_at_pad:
            fat_ref, *rest = rest
        nd_ref = None
        if n_nodes:
            nd_ref, *rest = rest
        ins = rest[:14]
        outs = rest[14:28]
        key_ref = rest[28]
        alive_in = ins[12][:, :]
        anylive = jnp.max(alive_in) > 0

        @pl.when(jnp.logical_not(anylive))
        def _():
            for o, i in zip(outs, ins):
                o[:, :] = i[:, :]
            key_ref[:, :] = jnp.full(
                (rows, _TILE_W), _DEAD_KEY, jnp.float32)

        @pl.when(anylive)
        def _():
            dyn_nsph = scal_ref[0].astype(jnp.int32)
            dyn_nodes = scal_ref[1].astype(jnp.int32)
            dyn_bounces = scal_ref[2].astype(jnp.int32)
            (ox, oy, oz, dx, dy, dz, cr, cg, cb,
             rr, rg, rb, al, sdf) = (r[:, :] for r in ins)
            sd = pltpu.bitcast(sdf, jnp.uint32)

            from raytpu.kernels.megakernel import _FLAT_UNROLL_MAX
            unroll = (n_nodes if flat_leaves
                      and n_nodes <= _FLAT_UNROLL_MAX else None)
            dense = ((mx_ref, at_ref, dense_pad) if dense_pad else None)
            flat_at = ((fat_ref, flat_at_pad) if flat_at_pad else None)
            bounce = make_bounce_body(sc_ref, nd_ref, dyn_nsph,
                                      dyn_nodes, t_min, scatter_mode,
                                      static_leaf, flat_leaves, unroll,
                                      dense, flat_at, outliers=outliers)

            def cond(st):
                return (st[0] < dyn_bounces) & (jnp.max(st[13]) > 0)

            st = (jnp.int32(0), ox, oy, oz, dx, dy, dz,
                  cr, cg, cb, rr, rg, rb, al, sd)
            st = jax.lax.while_loop(cond, bounce, st)
            (_, ox, oy, oz, dx, dy, dz, cr, cg, cb,
             rr, rg, rb, al, sd) = st

            for o, v in zip(outs, (ox, oy, oz, dx, dy, dz, cr, cg, cb,
                                   rr, rg, rb, al)):
                o[:, :] = v
            outs[13][:, :] = pltpu.bitcast(sd, jnp.float32)

            key_ref[:, :] = jnp.where(
                al > 0, _cell_key(scal_ref, ox, oy, oz, dx, dy, dz),
                _DEAD_KEY)

    return kernel


def _cell_key(scal_ref, ox, oy, oz, dx, dy, dz):
    """Sort key: direction octant MAJOR, then quantized origin cell
    (32 x 8 x 32 over the scene bbox; scal_ref[3:9] = lo.xyz,
    bins/extent.xyz).  Octant-major matters: with the octant in the low
    bits a sorted tile mixes all 8 direction cones and the tile
    -coherent BVH walk culls nothing."""
    qx = jnp.clip(((ox - scal_ref[3]) * scal_ref[6])
                  .astype(jnp.int32), 0, _QBITS_XZ - 1)
    qy = jnp.clip(((oy - scal_ref[4]) * scal_ref[7])
                  .astype(jnp.int32), 0, _QBITS_Y - 1)
    qz = jnp.clip(((oz - scal_ref[5]) * scal_ref[8])
                  .astype(jnp.int32), 0, _QBITS_XZ - 1)
    octant = (jnp.where(dx < 0, 4, 0) + jnp.where(dy < 0, 2, 0)
              + jnp.where(dz < 0, 1, 0))
    cell = (((octant * _QBITS_XZ + qx) * _QBITS_XZ + qz)
            * _QBITS_Y + qy)
    return cell.astype(jnp.float32)


# fresh (not-yet-bounced) primaries sort ABOVE all bounce cells, keyed
# by direction — primary directions map 1:1 to pixels, so this groups
# respawns by pixel neighborhood
_PRIMARY_BASE = np.float32(1 << 20)
_QDIR = 64


def _make_refill_segment_kernel(n_spheres: int, n_nodes: int, t_min,
                                B: int, inv_w, inv_h,
                                scatter_mode: str = "v2",
                                static_leaf: int | None = None,
                                flat_leaves: bool = False,
                                dense_pad: int | None = None,
                                flat_at_pad: int | None = None,
                                outliers: tuple | None = None):
    """Persistent-refill segment kernel: run up to ``n_bounces`` bounces
    over one tile of consecutive ray slots with IN-KERNEL sample respawn
    (megakernel.make_refill_step — a lane whose sample terminates
    immediately starts its pixel's next sample), then emit the next sort
    key.  Lanes are dead only when their spp budget is exhausted, so
    tile occupancy stays ~100% while the sort boundaries outside keep
    tiles leaf-coherent — the refill megakernel's utilization plus the
    sorted wavefront's coherence.

    Ride planes (sorted outside, in/out):
      key, pid, sdpk (s_pl*256 + d_pl), o3, d3, thr3, sd, acc3   (16)
    Aux planes (recomputed from pid after each sort, in only):
      px, py, bidx                                               (3)

    The current-sample radiance (rr, rg, rb) does NOT ride: a sample's
    radiance becomes nonzero only at its terminal bounce (miss -> sky),
    and the refill step folds it into (ar, ag, ab) and zeroes it in
    that same iteration — so it is identically zero at every round
    boundary.  s_pl/d_pl pack into one plane (both small ints, exact in
    f32 far beyond spp*256 + depth).
    """

    def kernel(cam_ref, scal_ref, sc_ref, *rest):
        mx_ref = at_ref = fat_ref = None
        if dense_pad:
            mx_ref, at_ref, *rest = rest
        if flat_at_pad:
            fat_ref, *rest = rest
        nd_ref = None
        if n_nodes:
            nd_ref, *rest = rest
        ins = rest[:19]
        outs = rest[19:35]
        key_in = ins[0][:, :]
        anywork = jnp.min(key_in) < _DEAD_KEY

        @pl.when(jnp.logical_not(anywork))
        def _():
            for o, i in zip(outs, ins[:16]):
                o[:, :] = i[:, :]

        @pl.when(anywork)
        def _():
            dyn_nsph = scal_ref[0].astype(jnp.int32)
            dyn_nodes = scal_ref[1].astype(jnp.int32)
            dyn_bounces = scal_ref[2].astype(jnp.int32)
            dyn_depth_f = cam_ref[19]
            dyn_spp_f = cam_ref[20]     # spp per SLOT (cfg.spp / B)
            (_, pidf, sdpk, ox, oy, oz, dx, dy, dz,
             cr, cg, cb, sdf, ar, ag, ab,
             fx, fy, bidxf) = (r[:, :] for r in ins)
            s_pl = jnp.floor(sdpk * np.float32(1.0 / 256.0))
            d_pl = sdpk - s_pl * 256.0
            rr = rg = rb = jnp.zeros_like(ox)
            sd = pltpu.bitcast(sdf, jnp.uint32)
            alive_f = jnp.where(key_in < _DEAD_KEY, 1.0, 0.0)
            seed0 = rng.pixel_seed(
                fx.astype(jnp.int32).astype(jnp.uint32),
                fy.astype(jnp.int32).astype(jnp.uint32))
            bidx = bidxf.astype(jnp.int32).astype(jnp.uint32)

            from raytpu.kernels.megakernel import _FLAT_UNROLL_MAX
            unroll = (n_nodes if flat_leaves
                      and n_nodes <= _FLAT_UNROLL_MAX else None)
            dense = ((mx_ref, at_ref, dense_pad) if dense_pad else None)
            flat_at = ((fat_ref, flat_at_pad) if flat_at_pad else None)
            bounce = make_bounce_body(sc_ref, nd_ref, dyn_nsph,
                                      dyn_nodes, t_min, scatter_mode,
                                      static_leaf, flat_leaves, unroll,
                                      dense, flat_at, outliers=outliers)
            gen_ray = make_gen_ray(cam_ref, fx, fy, inv_w, inv_h)
            step = make_refill_step(bounce, gen_ray, seed0, dyn_depth_f,
                                    dyn_spp_f, True, bidx,
                                    sample_stride=B)

            def cond(st):
                return (st[0] < dyn_bounces) & (jnp.max(st[13]) > 0)

            def body(st):
                return (st[0] + 1, *step(st[1:]))

            st = (jnp.int32(0), ox, oy, oz, dx, dy, dz, cr, cg, cb,
                  rr, rg, rb, alive_f, sd, s_pl, d_pl, ar, ag, ab)
            st = jax.lax.while_loop(cond, body, st)
            (_, ox, oy, oz, dx, dy, dz, cr, cg, cb, rr, rg, rb,
             alive_f, sd, s_pl, d_pl, ar, ag, ab) = st

            # key: exhausted -> DEAD tail; fresh respawns (d_pl == 0,
            # about to cast their primary) -> direction-quantized
            # primary band (z-sign bit disambiguates the +-z hemispheres
            # so view-down-z cameras don't collapse into one bin);
            # mid-path rays -> position/octant cell
            inv = jax.lax.rsqrt(jnp.maximum(
                dx * dx + dy * dy + dz * dz, np.float32(1e-20)))
            qdx = jnp.clip(((dx * inv + 1.0) * np.float32(_QDIR / 2))
                           .astype(jnp.int32), 0, _QDIR - 1)
            qdy = jnp.clip(((dy * inv + 1.0) * np.float32(_QDIR / 2))
                           .astype(jnp.int32), 0, _QDIR - 1)
            sz = jnp.where(dz < 0, 1, 0)
            pkey = _PRIMARY_BASE + (
                (sz * _QDIR + qdx) * _QDIR + qdy).astype(jnp.float32)
            key = jnp.where(
                alive_f > 0,
                jnp.where(d_pl == 0, pkey,
                          _cell_key(scal_ref, ox, oy, oz, dx, dy, dz)),
                _DEAD_KEY)

            for o, v in zip(outs, (
                    key, pidf, s_pl * 256.0 + d_pl, ox, oy, oz,
                    dx, dy, dz, cr, cg, cb, None, ar, ag, ab)):
                if v is not None:
                    o[:, :] = v
            outs[12][:, :] = pltpu.bitcast(sd, jnp.float32)

    return kernel


def _key_bounds(scene: Scene):
    """Robust scene bbox for the position key: outlier-huge spheres
    (e.g. r=1000 ground) would collapse every interesting hit into one
    cell, so the box covers only spheres up to 10x the median radius.
    Traced (jnp) so scenes can be jit arguments; only feeds the SORT KEY,
    never the image values."""
    center = jnp.asarray(scene.center, jnp.float32)
    radius = jnp.abs(jnp.asarray(scene.radius, jnp.float32))
    keep = radius <= 10.0 * jnp.maximum(jnp.median(radius), 1e-6)
    big = jnp.float32(1e30)
    lo = jnp.min(jnp.where(keep[:, None], center - radius[:, None], big),
                 axis=0)
    hi = jnp.max(jnp.where(keep[:, None], center + radius[:, None], -big),
                 axis=0)
    extent = jnp.clip(hi - lo, 1e-6, 1e6)
    scale = (jnp.asarray([_QBITS_XZ, _QBITS_Y, _QBITS_XZ], jnp.float32)
             / extent)
    return lo, scale


def _pad32(x: int) -> int:
    return -(-x // _BLOCK) * _BLOCK


def _decode_pid(pid, wp):
    """Block-order slot index -> absolute (px, py) pixel coords."""
    nbx = wp // _BLOCK
    b = pid // _LANES
    m = pid % _LANES
    py = (b // nbx) * _BLOCK + m // _BLOCK
    px = (b % nbx) * _BLOCK + m % _BLOCK
    return px, py


def _block_to_image(lin, hp, wp):
    """(R, ...) block-order slots -> (hp, wp, ...) image layout."""
    tail = lin.shape[1:]
    nby, nbx = hp // _BLOCK, wp // _BLOCK
    return (lin.reshape(nby, nbx, _BLOCK, _BLOCK, *tail)
            .transpose(0, 2, 1, 3, *range(4, 4 + len(tail)))
            .reshape(hp, wp, *tail))


def _render_wavefront_impl(scene: Scene, cam: Camera, nodes, perm,
                           cfg: RenderConfig, interpret: bool,
                           segments, tile_rows, leaf_size=None,
                           sort_every: int = 1, row0=0, rows=None,
                           spp_batch: int = 1, flat=None,
                           sort_chunk: int = 0, refill: int = 0):
    """Render rows [row0, row0+rows) of the cfg-sized frame as one
    wavefront.  ``row0`` may be traced (shard_map axis offset); RNG
    seeds and sort keys derive from ABSOLUTE pixel coords, so a sharded
    frame is bit-identical to the single-chip render."""
    h, w = (rows if rows is not None else cfg.height), cfg.width
    hp, wp = _pad32(h), _pad32(w)
    B = int(spp_batch)
    if B > 1:
        if cfg.rng_mode != "parallel":
            raise ValueError(
                "spp_batch > 1 needs rng_mode='parallel' (sequential "
                "seed chains are order-dependent within a pixel)")
        if cfg.spp % B:
            raise ValueError(f"spp_batch {B} must divide spp {cfg.spp}")
    R = hp * wp * B
    rows = R // _TILE_W
    trows = tile_rows or min(_ROWS_DEFAULT, rows)
    while rows % trows:
        trows //= 2
    grid = (rows // trows,)
    parallel = cfg.rng_mode == "parallel"
    t_min = np.float32(cfg.t_min)
    inv_w = np.float32(1.0 / (w - 1))
    inv_h = np.float32(1.0 / (cfg.height - 1))  # full-frame v coords

    n = scene.count
    use_flat = False
    dense_ops = None
    n_pad = None
    from raytpu.kernels.megakernel import _use_dense
    if _use_dense(n, interpret, has_bvh=nodes is not None):
        # dense-MXU hit stage (megakernel._pack_dense): the BVH (if
        # any) is ignored, scene stays in original order
        from raytpu.kernels.megakernel import _pack_dense
        packed = _pack_scene(scene)
        mx, at, n_pad = _pack_dense(scene)
        dense_ops = (mx, at)
        nodes_t = None
        m = 0
    fat_ops = None
    fat_pad = None
    if dense_ops is None and nodes is not None:
        from raytpu.bvh import permute_scene
        from raytpu.kernels.megakernel import (_FLAT_MAX_LEAVES, _TIDX,
                                               _pack_flat_at)
        packed = _pack_scene(permute_scene(scene, perm))
        use_flat = (flat is not None
                    and flat.shape[0] // 8 <= _FLAT_MAX_LEAVES)
        if use_flat:
            # flat leaf-list traversal (bvh.flat): leaf rows only
            nodes_t = flat.T.astype(jnp.float32)
            m = flat.shape[0] // 8
            if _TIDX:
                fat, fat_pad = _pack_flat_at(packed)
                fat_ops = (fat,)
        else:
            # padded BVHs store 8 octant-ordered copies: walk covers one
            nodes_t = nodes.T.astype(jnp.float32)
            m = nodes.shape[0] // 8 if leaf_size else nodes.shape[0]
    elif dense_ops is None:
        packed = _pack_scene(scene)
        nodes_t = None
        m = 0
    lo, scale = _key_bounds(scene)
    outl = (_bvh_outliers(perm, flat, leaf_size)
            if dense_ops is None and nodes is not None else None)

    kernel = _make_segment_kernel(n, m, t_min, trows, cfg.scatter_mode,
                                  leaf_size, use_flat, n_pad, fat_pad,
                                  outliers=outl)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    plane = pl.BlockSpec((trows, _TILE_W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    pshape = jax.ShapeDtypeStruct((rows, _TILE_W), jnp.float32)

    def _hit_ops(n_bounces):
        """(operands, in_specs) prefix shared by both segment kernels:
        the scal vector, SMEM scene pack, and the dense/flat/BVH hit
        -mode operands."""
        scal = jnp.asarray(
            [n, m, n_bounces, lo[0], lo[1], lo[2],
             scale[0], scale[1], scale[2]], jnp.float32)
        operands = [scal, packed]
        in_specs = [smem, smem]
        if dense_ops is not None:
            operands += list(dense_ops)
            in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        if fat_ops is not None:
            operands += list(fat_ops)
            in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)]
        if m:
            operands.append(nodes_t)
            in_specs.append(smem)
        return operands, in_specs

    def seg_call(planes, n_bounces):
        operands, in_specs = _hit_ops(n_bounces)
        operands += [p.reshape(rows, _TILE_W) for p in planes]
        in_specs += [plane] * 14
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=tuple([pshape] * 15),
            in_specs=in_specs,
            out_specs=tuple([plane] * 15),
            interpret=interpret,
        )(*operands)
        return [o.reshape(R) for o in outs[:14]], outs[14].reshape(R)

    # sort-boundary plan: rays are independent and radiance is scattered
    # by pid once at the end, so the image is BIT-IDENTICAL under any
    # slot permutation — which frees the sort to be CHUNKED: C
    # independent (tile-aligned) chunks batch-sorted along the last
    # axis.  A monolithic R x 15-operand lax.sort outgrows VMEM and
    # falls into a slow merge regime (~37 ms at 640k on a v5e); chunk
    # sorts are embarrassingly parallel and near-linear.  Within-chunk
    # order still makes kernel tiles key-uniform (only the C chunk
    # -boundary tiles mix key groups), and dead rays compact to each
    # chunk's tail where whole tiles early-exit.
    if sort_chunk and R > sort_chunk:
        tile_rays = trows * _TILE_W
        n_tiles = rows // trows
        tpc = max(1, sort_chunk // tile_rays)
        while n_tiles % tpc:
            tpc -= 1
        n_chunks = n_tiles // tpc
    else:
        n_chunks = 1

    def _sort_ops(ops):
        if n_chunks == 1:
            return list(jax.lax.sort(ops, num_keys=1))
        ops2 = [o.reshape(n_chunks, R // n_chunks) for o in ops]
        out = jax.lax.sort(ops2, dimension=1, num_keys=1)
        return [o.reshape(R) for o in out]

    pid0 = jnp.arange(R, dtype=jnp.int32)

    def _jitter_ray(fx, fy, sd):
        """Per-slot jitter draws + raygen — the host-side twin of the
        kernel's make_gen_ray (same draws, same 1.1 jitter scale)."""
        (j1a, _), sd = rng.hash2(sd)
        (_, j2b), sd = rng.hash2(sd)
        u = (fx + j1a * 1.1) * inv_w
        v = (fy + j2b * 1.1) * inv_h
        return get_ray(cam, u, v, sd)

    if refill:
        # persistent-refill wavefront: ONE pass over all samples with
        # in-kernel respawn (lanes stay ~100% occupied) and a chunked
        # sort every ``refill`` bounces (tiles stay leaf-coherent) —
        # the refill megakernel's utilization plus the sorted
        # wavefront's coherence.  Op-for-op the standard wavefront
        # (same per-slot sample partition, per-sample math and
        # accumulation order); compiled outputs may drift ~1 ulp per
        # bounce from FMA-contraction context differences between the
        # two schedules (see tests/test_wavefront.py refill tests).
        if not parallel:
            raise ValueError(
                "refill wavefront needs rng_mode='parallel' (respawn "
                "re-derives per-sample seeds by fold_in)")
        spp_slot = cfg.spp // B
        if cfg.depth > 256 or spp_slot > 65535:
            # the (s_pl, d_pl) pair rides ONE f32 plane as s*256 + d
            raise ValueError(
                "refill wavefront supports depth <= 256 and "
                f"spp/spp_batch <= 65535 (got depth={cfg.depth}, "
                f"spp_slot={spp_slot})")
        kernel_r = _make_refill_segment_kernel(
            n, m, t_min, B, inv_w, inv_h, cfg.scatter_mode,
            leaf_size, use_flat, n_pad, fat_pad, outliers=outl)
        cam_pack = _pack_camera(cam, cfg, n, m, row0, spp=spp_slot)

        def seg_call_refill(ride, aux):
            operands, in_specs = _hit_ops(refill)
            operands = [cam_pack] + operands
            in_specs = [smem] + in_specs
            operands += [p.reshape(rows, _TILE_W)
                         for p in (*ride, *aux)]
            in_specs += [plane] * 19
            outs = pl.pallas_call(
                kernel_r,
                grid=grid,
                out_shape=tuple([pshape] * 16),
                in_specs=in_specs,
                out_specs=tuple([plane] * 16),
                interpret=interpret,
            )(*operands)
            return [o.reshape(R) for o in outs]

        # initial spawn: sample 0 for every slot (same seed/jitter
        # derivation as the standard wavefront's first wave)
        base0 = pid0 // B if B > 1 else pid0
        px0, py0 = _decode_pid(base0, wp)
        py0 = py0 + row0
        valid0 = (px0 < w) & (py0 < cfg.height)
        bidx0 = pid0 % B if B > 1 else jnp.zeros_like(pid0)
        sd = rng.fold_in(
            rng.pixel_seed(px0.astype(jnp.uint32),
                           py0.astype(jnp.uint32)),
            bidx0.astype(jnp.uint32))
        (ox0, oy0, oz0), (dx0, dy0, dz0), sd = _jitter_ray(
            px0.astype(jnp.float32), py0.astype(jnp.float32), sd)
        one = jnp.ones((R,), jnp.float32)
        zero = jnp.zeros((R,), jnp.float32)
        key0 = jnp.where(valid0, 0.0, _DEAD_KEY)
        ride0 = (key0, pid0.astype(jnp.float32), zero,
                 ox0, oy0, oz0, dx0, dy0, dz0, one, one, one,
                 jax.lax.bitcast_convert_type(sd, jnp.float32),
                 zero, zero, zero)

        def rcond(ride):
            return jnp.min(ride[0]) < _DEAD_KEY

        def rbody(ride):
            ride = _sort_ops(list(ride))
            pid_i = ride[1].astype(jnp.int32)
            base = pid_i // B if B > 1 else pid_i
            pxl, pyl = _decode_pid(base, wp)
            pyl = pyl + row0
            bidxl = pid_i % B if B > 1 else jnp.zeros_like(pid_i)
            aux = (pxl.astype(jnp.float32), pyl.astype(jnp.float32),
                   bidxl.astype(jnp.float32))
            return tuple(seg_call_refill(ride, aux))

        ride = jax.lax.while_loop(rcond, rbody, ride0)
        pid = ride[1].astype(jnp.int32)
        lin = jnp.zeros((R, 3), jnp.float32).at[pid].set(
            jnp.stack([ride[13], ride[14], ride[15]], axis=-1),
            unique_indices=True)
        if B > 1:
            lin = lin.reshape(hp * wp, B, 3).sum(axis=1)
        img = _block_to_image(lin, hp, wp)[:h, :w]
        return _to_gamma(img * np.float32(1.0 / cfg.spp), cfg.gamma)

    def wave(carry, s):
        pid, seed_carry, rad_r, rad_g, rad_b = carry
        # pid = original slot id: pixel-block slot major, sample minor
        base = pid // B if B > 1 else pid
        px, py = _decode_pid(base, wp)
        py = py + row0  # absolute image row (sharded slabs)
        valid = (px < w) & (py < cfg.height)
        if parallel:
            k = s * B + pid % B if B > 1 else s  # global sample index
            sd = rng.fold_in(
                rng.pixel_seed(px.astype(jnp.uint32),
                               py.astype(jnp.uint32)),
                k.astype(jnp.uint32))
        else:
            sd = seed_carry
        (ox, oy, oz), (dx, dy, dz), sd = _jitter_ray(
            px.astype(jnp.float32), py.astype(jnp.float32), sd)

        one = jnp.ones((R,), jnp.float32)
        alive = jnp.where(valid, 1.0, 0.0)
        planes = [ox, oy, oz, dx, dy, dz, one, one, one,
                  rad_r, rad_g, rad_b, alive,
                  jax.lax.bitcast_convert_type(sd, jnp.float32)]
        # sort_every > 1: only every k-th wave re-sorts — wave k+1's
        # primary rays reuse wave k's order, and bounce-1 hit positions
        # barely move between jittered samples, so the stale order stays
        # nearly as coherent at a fraction of the lax.sort cost
        do_sort = (s % jnp.int32(sort_every)) == 0
        for i, seg in enumerate(segments):
            planes, key = seg_call(planes, seg)
            if i < len(segments) - 1:
                # the alive plane (index 12) rides OUTSIDE the sort:
                # the kernel writes key = _DEAD_KEY iff alive == 0, so
                # it reconstructs exactly from the (sorted or not) key
                ops = [key, pid.astype(jnp.float32),
                       *planes[:12], planes[13]]
                sorted_ops = jax.lax.cond(
                    do_sort, _sort_ops, lambda a: list(a), ops)
                pid = sorted_ops[1].astype(jnp.int32)
                alive_s = jnp.where(sorted_ops[0] < _DEAD_KEY, 1.0, 0.0)
                planes = [*sorted_ops[2:14], alive_s, sorted_ops[14]]
        rad_r, rad_g, rad_b = planes[9], planes[10], planes[11]
        seed_out = jax.lax.bitcast_convert_type(planes[13], jnp.uint32)
        return (pid, seed_out, rad_r, rad_g, rad_b), None

    px0, py0 = _decode_pid(pid0 // B if B > 1 else pid0, wp)
    py0 = py0 + row0
    seed0 = rng.pixel_seed(px0.astype(jnp.uint32), py0.astype(jnp.uint32))
    zero = jnp.zeros((R,), jnp.float32)
    carry = (pid0, seed0, zero, zero, zero)
    carry, _ = jax.lax.scan(wave, carry,
                            jnp.arange(cfg.spp // B, dtype=jnp.int32))
    pid, _, rad_r, rad_g, rad_b = carry

    # ONE unsort: scatter per-slot radiance sums back to block order
    lin = jnp.zeros((R, 3), jnp.float32).at[pid].set(
        jnp.stack([rad_r, rad_g, rad_b], axis=-1), unique_indices=True)
    if B > 1:
        lin = lin.reshape(hp * wp, B, 3).sum(axis=1)
    img = _block_to_image(lin, hp, wp)[:h, :w]
    return _to_gamma(img * np.float32(1.0 / cfg.spp), cfg.gamma)


def default_segments(depth: int) -> tuple[int, ...]:
    """Bounce-segment split: one sort boundary after bounce 3 and (deep
    configs) another after bounce 12.  Each boundary's 16-operand
    lax.sort costs ~37 ms at R=640k on a v5e, and the payoff is the
    dead-ray compaction (live rays pack into dense tiles so the whole
    -tile early exit actually fires), so sparse geometric boundaries
    beat both extremes — round-2 sweeps: config 4 (depth 12) nosort
    24.0 / every-bounce 9.3 / (3, 9) 29.2 Mrays/s; REFERENCE_V2
    (depth 50) nosort 12.3 / (3, 9, 38) 29.5 Mrays/s."""
    if depth > 12:
        return (3, 9, depth - 12)
    if depth > 3:
        return (3, depth - 3)
    if depth > 1:
        return (1, depth - 1)
    return (depth,)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13, 14))
def _render_wavefront(scene, cam, nodes, perm, flat, cfg, interpret,
                      segments, tile_rows, vis_w, leaf_size, sort_every,
                      spp_batch, sort_chunk, refill):
    return _render_wavefront_impl(scene, cam, nodes, perm, cfg,
                                  interpret, segments, tile_rows,
                                  leaf_size, sort_every,
                                  spp_batch=spp_batch, flat=flat,
                                  sort_chunk=sort_chunk, refill=refill)


def _wf_fwd(scene, cam, nodes, perm, flat, cfg, interpret, segments,
            tile_rows, vis_w, leaf_size, sort_every, spp_batch,
            sort_chunk, refill):
    img = _render_wavefront_impl(scene, cam, nodes, perm, cfg,
                                 interpret, segments, tile_rows,
                                 leaf_size, sort_every,
                                 spp_batch=spp_batch, flat=flat,
                                 sort_chunk=sort_chunk, refill=refill)
    return img, (scene, cam, nodes, perm, flat, img)


def _wf_bwd(cfg, interpret, segments, tile_rows, vis_w, leaf_size,
            sort_every, spp_batch, sort_chunk, refill, res, ct):
    # backward: the fused Pallas VJP kernel (gradkernel.py) — shared
    # with the megakernel path; the wavefront is a forward-schedule
    # change only, so the same per-pixel reverse sweep applies.  The
    # image residual elides the VJP's PASS-1 forward (parallel RNG).
    from raytpu.kernels.megakernel import _golden_bwd
    scene, cam, nodes, perm, flat, img = res
    if not interpret:
        from raytpu.kernels import gradkernel
        bvh = None
        if nodes is not None:
            from raytpu.bvh import BVH
            bvh = BVH(nodes=nodes, perm=perm, leaf_size=leaf_size,
                      flat=flat)
        _, ds, dc = gradkernel.render_pallas_vjp(
            scene, cam, cfg, ct, interpret=False, bvh=bvh, vis_w=vis_w,
            img=img)
    else:
        ds, dc = _golden_bwd(cfg, (scene, cam), ct, vis_w)
    return (ds, dc, jax.tree.map(jnp.zeros_like, nodes),
            jax.tree.map(jnp.zeros_like, perm),
            jax.tree.map(jnp.zeros_like, flat))


_render_wavefront.defvjp(_wf_fwd, _wf_bwd)


def render_wavefront(scene: Scene, cam: Camera, cfg: RenderConfig,
                     bvh=None, segments=None,
                     interpret: bool | None = None,
                     tile_rows: int | None = None,
                     vis_w: float = 0.0,
                     sort_every: int = 1,
                     spp_batch: int = 1,
                     sort_chunk: int = 65536,
                     refill: int = 0) -> jnp.ndarray:
    """Full-frame sorted-wavefront render -> (H, W, 3) f32 image.

    Bit-identical (to 1 ulp; see tests/test_wavefront.py) to
    ``golden.render_golden`` — same math, same RNG streams, same
    per-pixel accumulation order.  ``segments`` is the tuple of
    bounce-segment lengths (summing to cfg.depth) between which rays
    are re-sorted; default ``(1, depth-1)`` sorts once after the first
    bounce.  Pass a BVH for large scenes.  ``tile_rows`` sets the rays
    -per-kernel-tile (rows x 128); larger tiles amortize traversal
    overhead, smaller ones maximize coherence.  ``spp_batch = B`` folds
    B samples per pixel into the ray array (parallel RNG mode only) —
    B-times-larger sort groups, so large-scene traversal culls harder.
    ``sort_chunk`` caps the rays per independent sort chunk (the image
    is permutation-invariant, so chunked sorting only trades a few
    chunk-boundary tiles' coherence for a near-linear sort;
    0 = monolithic).  ``refill = k`` switches to the PERSISTENT-REFILL
    wavefront (parallel RNG only): one pass over all samples with
    in-kernel respawn and a sort every k bounces — ``segments`` is then
    ignored.
    Differentiable: the backward pass is the fused VJP kernel
    (``vis_w > 0`` adds silhouette gradients).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if segments is None:
        segments = default_segments(cfg.depth)
    segments = tuple(int(s) for s in segments)
    assert sum(segments) == cfg.depth, (segments, cfg.depth)
    nodes = bvh.nodes if bvh is not None else None
    perm = bvh.perm if bvh is not None else None
    flat = bvh.flat if bvh is not None else None
    return _render_wavefront(scene, cam, nodes, perm, flat, cfg,
                             bool(interpret), segments,
                             None if tile_rows is None else int(tile_rows),
                             float(vis_w),
                             None if bvh is None else bvh.leaf_size,
                             int(sort_every), int(spp_batch),
                             int(sort_chunk), int(refill))
