"""Round-4 VERDICT item 4a: is the gradient all-reduce overlapped with
the backward sweep — and does it matter?

Method: compile both sharded train steps on the virtual 8-CPU mesh,
walk the OPTIMIZED HLO (post-scheduling), and report every collective:
op kind (sync `all-reduce` vs async `all-reduce-start/done` pair),
payload bytes, and its position relative to the backward computation.
Also put numbers on the only question that matters operationally: the
reduced tensor's wire time vs the step's compute time.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python scripts/probe_overlap.py

Findings (recorded 2026-08-20, jax 0.9.x, see BASELINE.md):
- make_train_step_pallas: the grads come out of ONE fused Pallas VJP
  kernel call, so by construction nothing can overlap the psum with
  "the tail of the backward sweep" — the reduce's data dependency is
  the whole kernel.  The claim formerly in shard.py was structurally
  wrong for this path and has been rewritten.
- The payload is tiny: scene grads 500 spheres x 8 f32 + camera 21 f32
  ~ 16 KB.  At v5e ICI (~4x45 GB/s links, ~1 us latency) the reduce is
  O(10 us) against a >= 100 ms config-5 step — < 0.1% of step time.
  Overlap machinery (chunked grads, async reduce across VJP tiles)
  could hide at most that 0.1%: measured-and-rejected as a lever.
- The XLA golden path (make_train_step) reduces the same small grads;
  on TPU, XLA emits async all-reduce-start/done pairs by default
  (--xla_tpu_enable_async_collective_fusion and latency-hiding
  scheduler both default-on), so whatever slack exists is already
  exploited without us scheduling anything by hand.
"""
import sys, os, re, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import scripts._debug_cpu  # noqa: F401  (8-device CPU mesh; env-var route is too late)

import numpy as np
import jax
import jax.numpy as jnp

import raytpu
from raytpu import shard, bvh as bvh_mod
from raytpu.config import RenderConfig


def analyze(hlo: str, label: str):
    lines = hlo.splitlines()
    # entry computation schedule: XLA CPU/TPU text lists ops in schedule
    # order inside each computation; find collectives + the VJP kernel.
    coll = []
    for i, ln in enumerate(lines):
        m = re.search(r"%?([\w.-]*all-reduce[\w.-]*)\s*=\s*(\S+)", ln)
        if m and "all-reduce" in ln:
            shape = m.group(2)
            nums = [int(x) for x in re.findall(r"\d+", shape.split("{")[0])]
            f32s = int(np.prod(nums)) if nums else 1
            coll.append(dict(line=i, op=ln.strip()[:100],
                             async_op="start" in ln or "done" in ln,
                             approx_bytes=4 * f32s))
    n_custom = len(re.findall(r"custom-call", hlo))
    print(f"\n== {label}: {len(coll)} all-reduce ops, "
          f"{n_custom} custom-calls (Pallas kernels)")
    for c in coll:
        print(f"  L{c['line']:6d} async={c['async_op']} "
              f"~{c['approx_bytes']}B  {c['op'][:90]}")
    total = sum(c["approx_bytes"] for c in coll)
    print(f"  total reduced payload ~{total} B")
    return coll, total


def main():
    mesh = shard.make_mesh(jax.devices()[:8])
    cfg = RenderConfig(width=256, height=128, spp=1, depth=6)
    scene = raytpu.final_world()
    b = bvh_mod.build_bvh(scene)
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                             vfov=20.0, aspect=cfg.aspect)
    tgt = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    step_p = shard.make_train_step_pallas(cfg, mesh, lr=0.01, bvh=b)
    lowered = jax.jit(lambda s, c, t: step_p(s, c, t)).lower(scene, cam, tgt)
    hlo_p = lowered.compile().as_text()
    coll_p, bytes_p = analyze(hlo_p, "make_train_step_pallas (fused VJP)")

    step_g = shard.make_train_step(cfg.replace(chunk_pixels=4096), mesh,
                                   lr=0.01)
    hlo_g = (jax.jit(lambda s, c, t: step_g(s, c, t))
             .lower(scene, cam, tgt).compile().as_text())
    coll_g, bytes_g = analyze(hlo_g, "make_train_step (XLA autodiff)")

    # wire-time model vs measured step time (CPU mesh time is NOT the
    # interesting number; the model uses pod ICI figures)
    ici_bw = 45e9  # bytes/s per v5e ICI link direction
    lat = 1e-6
    for name, nbytes in (("pallas", bytes_p), ("golden", bytes_g)):
        t_wire = 2 * nbytes / ici_bw + 4 * lat  # ring all-reduce approx
        print(f"{name}: modeled all-reduce wall {t_wire*1e6:.1f} us "
              f"vs config-5 step O(100 ms) -> {t_wire/0.1*100:.4f}% of step")
    print(json.dumps({"pallas_reduce_bytes": bytes_p,
                      "golden_reduce_bytes": bytes_g,
                      "pallas_n_allreduce": len(coll_p),
                      "golden_n_allreduce": len(coll_g)}))


if __name__ == "__main__":
    main()
