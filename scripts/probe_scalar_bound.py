"""Is the flat leaf sweep SCALAR-unit bound?

Round-4 trace work showed the 24-vop issue-efficiency model can't be
checked by the old microbench (its modulo-indexed SMEM loads run 10x
slower than the real frame).  This probe separates the costs directly:
four kernels run the same 64-test leaf body per iteration, differing
only in WHERE the sphere data comes from:

  A. dynamic SMEM index per test, (it+kk) %% leaf   (the old micro)
  B. dynamic leaf BASE per iteration + static offsets — the real
     kernel's pattern (start = nd_ref[6, node]; 4 scalar loads + 1
     scalar mul per test)
  C. fully static SMEM indices — hoistable to registers; steady-state
     scalar cost ~0, measures the pure VPU ceiling of the sweep math
  D. dense-style: spheres as a VMEM (64, 8) block, (64, 128) plane
     math per ray row, min/argmin winner — zero scalar traffic, no
     per-test select chain.  This is the per-leaf dense candidate's
     inner loop, so its tests/s PREDICTS that design's ceiling.

If B << C, the sweep is scalar-bound and a per-leaf dense hit stage
(D's layout) is the round's kernel lever; if B ~ C ~ the in-frame
achieved rate, the sweep is already at its issue ceiling and the only
remaining lever is cutting tests (coherence).

Run on real TPU:  python scripts/probe_scalar_bound.py
"""
import sys, time

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAF = 64
# a single tunnel dispatch costs ~28 ms wall regardless of content (the
# first run of this probe measured ALL variants at exactly 28 ms with
# ITERS=4096 — pure dispatch latency; the round-3 "speed-of-light"
# micro's 27.2 ms was the same artifact).  ITERS must make the kernel
# itself dominate: 2^19 iters * 64 tests * 1024 lanes = 34.4 G tests,
# ~0.5-1 s at realistic rates -> overhead < 5%.
ITERS = 524288
t_min = np.float32(1e-3)


def _rays():
    shape = (8, 128)
    ox = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32) * 0.01
    oy = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32) * 0.01
    oz = ox * 0.0 + 1.0
    dx, dy, dz = ox * 0.0 + 0.3, oy * 0.0 + 0.2, oz * 0.0 - 1.0
    a = dx * dx + dy * dy + dz * dz
    return ox, oy, oz, dx, dy, dz, a, 1.0 / a


def _test(sc4, rays, tb, idxf, jf):
    ox, oy, oz, dx, dy, dz, a, inv_a = rays
    s_cx, s_cy, s_cz, s_rad = sc4
    ocx = ox - s_cx
    ocy = oy - s_cy
    ocz = oz - s_cz
    half_b = ocx * dx + ocy * dy + ocz * dz
    c = (ocx * ocx + ocy * ocy + ocz * ocz) - s_rad * s_rad
    disc = half_b * half_b - a * c
    sqrtd = jnp.sqrt(disc)
    root1 = (half_b + sqrtd) * (-inv_a)
    root2 = (sqrtd - half_b) * inv_a
    near_ok = root1 >= t_min
    root = jnp.where(near_ok, root1, root2)
    win = (root >= t_min) & (root < tb)
    return jnp.where(win, root, tb), jnp.where(win, jf, idxf)


def make_smem_kernel(mode):
    def kernel(sc_ref, o_ref):
        rays = _rays()
        zero = rays[0] * 0.0

        def body(it, ti):
            tb, idxf = ti
            if mode == "A":
                base = jnp.int32(0)
            elif mode == "B":
                # dynamic leaf base, stride 64 over an 8-leaf array —
                # the real sweep's start = nd_ref[6, node] pattern
                base = (it % 8) * LEAF
            else:
                base = jnp.int32(0)
            for kk in range(LEAF):
                if mode == "A":
                    j = (it + kk) % LEAF
                elif mode == "B":
                    j = base + kk
                else:  # C: static
                    j = jnp.int32(kk)
                sc4 = (sc_ref[0, j], sc_ref[1, j], sc_ref[2, j],
                       sc_ref[3, j])
                tb, idxf = _test(sc4, rays, tb, idxf,
                                 jnp.float32(0.0) + kk)
            return (tb, idxf)

        tb, idxf = jax.lax.fori_loop(0, ITERS, body,
                                     (zero + 3e38, zero - 1.0))
        o_ref[:, :] = tb + idxf

    return kernel


def dense_kernel(cl_ref, o_ref):
    """D: spheres (8*LEAF, 8) VMEM rows [cx cy cz r2 ...]; per iter load
    a dynamic 64-row leaf block, per ray row compute (64, 128) planes."""
    rays = _rays()
    ox, oy, oz, dx, dy, dz, a, inv_a = rays
    zero = ox * 0.0

    def body(it, ti):
        tb, idxf = ti
        start = (it % 8) * LEAF
        blk = cl_ref[pl.dslice(start, LEAF), :]      # (64, 8)
        c_x = blk[:, 0:1]
        c_y = blk[:, 1:2]
        c_z = blk[:, 2:3]
        r2 = blk[:, 3:4]
        iota = jax.lax.broadcasted_iota(jnp.int32, (LEAF, 128), 0)
        tb_rows, id_rows = [], []
        for r in range(8):
            sl = slice(r, r + 1)
            ocx = ox[sl] - c_x
            ocy = oy[sl] - c_y
            ocz = oz[sl] - c_z
            half_b = ocx * dx[sl] + ocy * dy[sl] + ocz * dz[sl]
            ctm = (ocx * ocx + ocy * ocy + ocz * ocz) - r2
            disc = half_b * half_b - a[sl] * ctm
            sqrtd = jnp.sqrt(disc)
            root1 = (half_b + sqrtd) * (-inv_a[sl])
            root2 = (sqrtd - half_b) * inv_a[sl]
            near_ok = root1 >= t_min
            root = jnp.where(near_ok, root1, root2)
            t_all = jnp.where(root >= t_min, root, 3e38)
            tb_r = jnp.min(t_all, axis=0, keepdims=True)
            id_r = jnp.argmin(t_all, axis=0, keepdims=True)
            tb_rows.append(tb_r)
            id_rows.append(id_r.astype(jnp.float32))
        tbl = jnp.concatenate(tb_rows, axis=0)
        idl = jnp.concatenate(id_rows, axis=0)
        win = tbl < tb
        return (jnp.where(win, tbl, tb), jnp.where(win, idl, idxf))

    tb, idxf = jax.lax.fori_loop(0, ITERS, body, (zero + 3e38, zero - 1.0))
    o_ref[:, :] = tb + idxf


def run(label, kernel, operand, space):
    f = jax.jit(lambda x: jnp.sum(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=space)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)))
    try:
        float(f(operand))
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            float(f(operand + i * 1e-6))
            ts.append(time.perf_counter() - t0)
        t = sorted(ts)[2]
        tests = LEAF * ITERS * 1024
        print(f"{label:44s}: {t*1e3:7.2f} ms  {tests/t/1e9:7.2f} Gtests/s"
              f"  ({tests/1024/t/0.94e9:.4f} tile-tests/cycle)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label:44s}: FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)


sc = np.random.RandomState(0).uniform(-5, 5, (9, 8 * LEAF)).astype(np.float32)
sc[3] = np.abs(sc[3]) * 0.1 + 0.05
sc_j = jnp.asarray(sc)

cl = np.zeros((8 * LEAF, 8), np.float32)
cl[:, 0:3] = sc[0:3].T
cl[:, 3] = sc[3] * sc[3]
cl_j = jnp.asarray(cl)

run("A: SMEM, per-test dynamic idx (modulo)", make_smem_kernel("A"),
    sc_j, pltpu.SMEM)
run("B: SMEM, dynamic leaf base + static off", make_smem_kernel("B"),
    sc_j, pltpu.SMEM)
run("C: SMEM, fully static idx (hoistable)", make_smem_kernel("C"),
    sc_j, pltpu.SMEM)
run("D: VMEM dense (64,128) planes, min/argmin", dense_kernel,
    cl_j, pltpu.VMEM)
