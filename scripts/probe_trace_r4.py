"""Round-4 VERDICT item 1 step 1: profile the config-4 megakernel frame
with real measurements and reconcile the 24-op roofline model.

Three independent measurements, all on the production engine (parallel
RNG, mt-aware auto block, flat leaf-64 BVH + outlier tail):

1. ``jax.profiler`` trace attempt over the tunnel (the VERDICT asks for
   a real trace; axon is a remote tunnel so device-side tracing may be
   unsupported — the outcome is recorded either way, and the files it
   produces are listed).
2. The sweep's own speed-of-light: probe_roofline.sweep_peak_tests — the
   EXACT sphere_body_ti math, straight-line, all lanes live, no
   traversal/cond/respawn.  Model-free numerator AND denominator.
3. The production frame's census (entered leaves, steps, live lanes)
   + timing -> achieved in-frame tests/s.

Reconciliation: achieved / speed-of-light bounds the sweep section's
issue efficiency from below (the frame also pays ~13% non-sweep work by
the round-2 ablation).  If the ratio is already high, issue efficiency
is NOT a lever and the remaining gap is WORK (the leaf-union
overcount); if low, something in-frame stalls the sweep (scalar loads /
cond / respawn) and that is the round's kernel target.

Run on real TPU:  python scripts/probe_trace_r4.py
"""
import sys, os, time, glob

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp
import numpy as np

import raytpu
from raytpu.bvh import build_bvh, outlier_tail
from raytpu.config import RenderConfig
from raytpu.render import render
from raytpu.kernels import megakernel as mk
from scripts.probe_roofline import sweep_peak_tests

cfg = RenderConfig(width=800, height=400, spp=20, depth=12,
                   rng_mode="parallel")
scene = raytpu.final_world()
bvh64 = build_bvh(scene, leaf_size=64)
rays = cfg.width * cfg.height * cfg.spp


def cam(i):
    return raytpu.make_camera((13.0 + i * 1e-4, 2.0, 3.0), (0, 0, 0),
                              vfov=20.0, aspect=cfg.aspect)


f = jax.jit(lambda s, c: jnp.sum(render(s, c, cfg, backend="pallas",
                                        bvh=bvh64)))
float(f(scene, cam(991)))  # compile

# -- 1. profiler trace attempt
trace_dir = "/tmp/raytpu_trace_r4"
trace_ok = False
try:
    with jax.profiler.trace(trace_dir):
        float(f(scene, cam(1)))
        float(f(scene, cam(2)))
    files = [p for p in glob.glob(trace_dir + "/**", recursive=True)
             if os.path.isfile(p)]
    print("trace files:", flush=True)
    for p in files:
        print(f"  {os.path.getsize(p):>10d}  {p}", flush=True)
    trace_ok = any("xplane" in p or p.endswith(".json.gz") for p in files)
except Exception as e:  # noqa: BLE001
    print(f"trace attempt FAILED: {type(e).__name__}: {str(e)[:200]}",
          flush=True)
print(f"device trace captured: {trace_ok}", flush=True)

# -- 2. sweep speed-of-light (same math, straight-line)
for k in (1, 2):
    sol, t_micro = sweep_peak_tests(k)
    print(f"sweep speed-of-light k={k}: {sol/1e9:.2f} Gtests/s "
          f"({t_micro*1e3:.1f} ms micro) = "
          f"{sol*24/1024/0.94e9:.2f} vops/cycle @ 24-op model", flush=True)
sol1, _ = sweep_peak_tests(1)

# -- 3. production frame census + timing
bw = mk._auto_block_w(cfg, scene.count)
outl = outlier_tail(bvh64.perm, bvh64.flat, bvh64.leaf_size)
n_out = 0 if outl is None else outl[1]


@jax.jit
def census(s, c):
    img, cnt = mk._render_pallas_fwd_impl(
        s, c, cfg, False, bvh64.nodes, bvh64.perm, block_w=bw,
        leaf_size=bvh64.leaf_size, flat=bvh64.flat, count_leaves=True)
    return jnp.sum(img), cnt


_, cnt = census(scene, cam(0))
cnt = np.asarray(jax.device_get(cnt))[0]
leaves, steps, live = float(cnt[0]), float(cnt[1]), float(cnt[2])

ts = []
for i in range(5):
    t0 = time.perf_counter()
    float(f(scene, cam(i)))
    ts.append(time.perf_counter() - t0)
t_frame = sorted(ts)[2]

tests = (leaves * bvh64.leaf_size + steps * n_out) * 1024
ach = tests / t_frame
print(f"frame: {t_frame*1e3:.1f} ms ({rays/t_frame/1e6:.1f} Mrays/s) "
      f"block_w={bw}", flush=True)
print(f"census: {leaves/steps:.2f}/{bvh64.n_leaves} leaves/step, "
      f"{100*live/(steps*1024):.1f}% live lanes", flush=True)
print(f"achieved in-frame: {ach/1e9:.2f} Gtests/s = "
      f"{100*ach/sol1:.1f}% of straight-line speed-of-light", flush=True)
print(f"tests vs 1-leaf ideal: "
      f"{tests/(live*(bvh64.leaf_size+n_out)):.2f}x", flush=True)
