"""Round-5 probe: what does a jax.profiler trace of a MULTI-KERNEL
dispatch (fwd+bwd: megakernel + gradkernel + XLA glue) look like over
the tunnel?  profiling.device_ms takes the LONGEST single device event —
correct if the trace carries one top-level module event spanning the
whole program, an underestimate if only per-kernel events exist.

Prints the top device events by duration, plus the busy-union of leaf
events, for (a) a 2-frame scanned forward, (b) a fwd+bwd grad dispatch.

CONCLUSION (one v5e over the tunnel, 2026-08-20): the trace carries a
top-level ``jit_<fn>(...)`` event that EQUALS the busy-union of the
kernel events in both cases (fwd 4.66 = 4.66; fwd+bwd 6.00 = 6.00 ms),
so ``profiling.device_ms``'s max-event read is exact for multi-kernel
dispatches.  Bonus: the per-kernel events (``jvp__`` = forward
megakernel, ``transpose_jvp__`` = fused VJP kernel) decompose a train
step for free — the instrument behind probe_bwd_roofline_r5.py.
"""

import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp

import raytpu
from raytpu.config import RenderConfig
from raytpu.render import render
from raytpu import profiling


def dump_trace(run_once, label):
    d = tempfile.mkdtemp()
    with profiling.trace(d):
        run_once()
    for path in glob.glob(d + "/plugins/profile/*/*.trace.json.gz"):
        with gzip.open(path) as fh:
            tr = json.load(fh)
        ev = tr.get("traceEvents", [])
        pidname = {}
        for e in ev:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pidname[e["pid"]] = str(e.get("args", {}).get("name", ""))
        tpu_pids = {p for p, n in pidname.items() if "TPU" in n}
        xs = [e for e in ev if e.get("ph") == "X" and e["pid"] in tpu_pids]
        xs.sort(key=lambda e: -e.get("dur", 0))
        print(f"== {label}: {len(xs)} device events, pids={ {p: pidname[p] for p in tpu_pids} }")
        for e in xs[:12]:
            print(f"   {e.get('dur', 0)/1e3:9.2f} ms  tid={e.get('tid')}  {e.get('name','')[:90]}")
        # busy union of ALL device events (overlaps merged)
        iv = sorted((e["ts"], e["ts"] + e.get("dur", 0)) for e in xs)
        busy, cur_s, cur_e = 0.0, None, None
        for s, t in iv:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    busy += cur_e - cur_s
                cur_s, cur_e = s, t
            else:
                cur_e = max(cur_e, t)
        if cur_e is not None:
            busy += cur_e - cur_s
        print(f"   busy-union {busy/1e3:.2f} ms   max-event {xs[0].get('dur',0)/1e3:.2f} ms")


def main():
    cfg = RenderConfig(width=400, height=200, spp=20, depth=12,
                       rng_mode="parallel")
    scene = raytpu.config2_world()
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                             vfov=20.0, aspect=cfg.aspect)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    @jax.jit
    def fwd2(s, c):
        def body(acc, k):
            cc = c._replace(lower_left=c.lower_left.at[0].add(k * 1e-6))
            return acc + jnp.sum(render(s, cc, cfg, backend="pallas")), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(2, dtype=jnp.float32))
        return acc

    @jax.jit
    def fwdbwd(s, c):
        def loss_fn(s, c):
            img = render(s, c, cfg, backend="pallas")
            return jnp.mean((img - target) ** 2)
        g = jax.grad(loss_fn, argnums=(0, 1), allow_int=True)(s, c)
        return jnp.sum(g[0].center) + jnp.sum(g[1].origin)

    t0 = time.time()
    float(fwd2(scene, cam))
    print("fwd2 compile+run", round(time.time() - t0, 1))
    t0 = time.time()
    float(fwdbwd(scene, cam))
    print("fwdbwd compile+run", round(time.time() - t0, 1))

    dump_trace(lambda: float(fwd2(scene, cam)), "fwd 2-frame scan")
    dump_trace(lambda: float(fwdbwd(scene, cam)), "fwd+bwd grad")


if __name__ == "__main__":
    main()
