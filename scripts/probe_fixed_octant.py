"""Round-4: fixed per-instance traversal octant vs per-step majority.

The per-step octant pick costs 4 cross-lane reduces per bounce step
(3 axis majorities + the live count); the leaf-512 wash priced
reduce+cond machinery at ~200 cycles each, so fixing the octant from
the instance-center PRIMARY direction (scalar prologue math) should
return ~10-15% of step time — IF the bounced steps' culling doesn't
degrade (they enter 5/8 leaves under the adaptive pick already).

Prints frame time AND the census (leaves entered / step) so the win or
loss decomposes into machinery-vs-culling.  Run each mode in a fresh
process (env read at import):

  RAYTPU_FIXED_OCTANT=  python scripts/probe_fixed_octant.py
  RAYTPU_FIXED_OCTANT=1 python scripts/probe_fixed_octant.py
"""
import sys, time

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp
import numpy as np

import raytpu
from raytpu.bvh import build_bvh, outlier_tail
from raytpu.config import RenderConfig
from raytpu.render import render
from raytpu.kernels import megakernel as mk

scene = raytpu.final_world()
b = build_bvh(scene, leaf_size=64)
cfg = RenderConfig(width=800, height=400, spp=100, depth=12,
                   rng_mode="parallel")
rays = cfg.width * cfg.height * cfg.spp


def cam_i(eps):
    c = raytpu.make_camera((13., 2., 3.), (0., 0., 0.), vfov=20.,
                           aspect=cfg.aspect)
    return c._replace(lower_left=c.lower_left.at[0].add(eps * 1e-6))


f = jax.jit(lambda s, eps: jnp.sum(render(s, cam_i(eps), cfg,
                                          backend="pallas", bvh=b)))
float(f(scene, jnp.float32(997.0)))
ts = []
for i in range(3):
    t0 = time.perf_counter()
    float(f(scene, jnp.float32(i)))
    ts.append(time.perf_counter() - t0)
t = min(ts)
print(f"FIXED_OCTANT={int(mk._FIXED_OCTANT)} config4@100spp fwd: "
      f"{t*1e3:7.1f} ms  {rays/t/1e6:5.1f} Mrays/s", flush=True)

# census at the production layout (20 spp keeps it quick; ratios are
# spp-independent)
cfg20 = cfg.replace(spp=20)
bw = mk._auto_block_w(cfg20, scene.count)
outl = outlier_tail(b.perm, b.flat, b.leaf_size)


@jax.jit
def census(s, c):
    img, cnt = mk._render_pallas_fwd_impl(
        s, c, cfg20, False, b.nodes, b.perm, block_w=bw,
        leaf_size=b.leaf_size, flat=b.flat, count_leaves=True)
    return jnp.sum(img), cnt


_, cnt = census(scene, cam_i(0.0))
cnt = np.asarray(jax.device_get(cnt))[0]
leaves, steps, live = float(cnt[0]), float(cnt[1]), float(cnt[2])
print(f"census: {leaves/steps:.3f}/{b.n_leaves} leaves/step, "
      f"{100*live/(steps*1024):.1f}% live", flush=True)
