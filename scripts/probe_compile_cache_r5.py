"""Round-5: first-render latency (VERDICT item 7).

Measures COLD vs WARM compile time for the headline kernels and whether
``jax.config.jax_compilation_cache_dir`` (the persistent XLA compile
cache) carries compiles across PROCESSES — a fresh process's first
``render()`` should pay seconds, not minutes.

Run modes (one process each; the parent orchestrates):
  --child <name> --cache 0|1   compile one workload, print timing JSON

Workloads: config2 megakernel fwd, config4 (BVH) fwd, config4 fwd+bwd
(fused VJP), refv2 depth-50 fwd.

VERDICT (one v5e over the tunnel, 2026-08-20): fresh-process first-call
latency for an ALREADY-SEEN shape is 2.8-6.4 s (the remote compile
server caches across processes; a never-seen shape pays the
environment's ~20-40 s).  The local persistent cache shaves the round
trip further: config-4 fwd 3.7 -> 2.4 s, fwd+bwd 6.4 -> 4.3 s
cross-process.  Wired ON by default in raytpu/__init__
(~/.cache/raytpu-xla; RAYTPU_CACHE=0 disables).
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

CACHE_DIR = "/tmp/raytpu_xla_cache_probe"


def child(name: str, cache: bool):
    import jax
    if cache:
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    import jax.numpy as jnp
    import raytpu
    from raytpu.bvh import build_bvh
    from raytpu.config import RenderConfig, CONFIG2, REFERENCE_V2
    from raytpu.render import render

    if name == "config2_fwd":
        cfg, scene, bvh = CONFIG2, raytpu.config2_world(), None
        def fn(s, c):
            return jnp.sum(render(s, c, cfg, backend="pallas"))
    elif name in ("config4_fwd", "config4_fwdbwd"):
        cfg = RenderConfig(width=800, height=400, spp=20, depth=12,
                           rng_mode="parallel")
        scene = raytpu.final_world()
        bvh = build_bvh(scene, leaf_size=64)
        if name == "config4_fwd":
            def fn(s, c):
                return jnp.sum(render(s, c, cfg, backend="pallas",
                                      bvh=bvh))
        else:
            tgt = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
            def fn(s, c):
                def loss(s, c):
                    img = render(s, c, cfg, backend="pallas", bvh=bvh)
                    return jnp.mean((img - tgt) ** 2)
                g = jax.grad(loss, argnums=(0, 1), allow_int=True)(s, c)
                return jnp.sum(g[0].center) + jnp.sum(g[1].origin)
    elif name == "refv2_fwd":
        cfg = REFERENCE_V2.replace(rng_mode="parallel")
        scene = raytpu.random_world()
        bvh = build_bvh(scene, leaf_size=64)
        def fn(s, c):
            return jnp.sum(render(s, c, cfg, backend="pallas", bvh=bvh))
    else:
        raise SystemExit(f"unknown workload {name}")

    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                             vfov=20.0, aspect=cfg.aspect)
    f = jax.jit(fn)
    t0 = time.time()
    float(f(scene, cam))
    first = time.time() - t0
    t0 = time.time()
    float(f(scene, cam._replace(origin=cam.origin + 1e-5)))
    steady = time.time() - t0
    print(json.dumps({"workload": name, "cache": cache,
                      "first_call_s": round(first, 1),
                      "steady_s": round(steady, 3)}))


WORKLOADS = ["config2_fwd", "config4_fwd", "config4_fwdbwd", "refv2_fwd"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", default=None)
    ap.add_argument("--cache", type=int, default=0)
    args = ap.parse_args()
    if args.child:
        child(args.child, bool(args.cache))
        return

    shutil.rmtree(CACHE_DIR, ignore_errors=True)
    here = os.path.abspath(__file__)
    cwd = os.path.dirname(os.path.dirname(here))
    rows = []
    for name in WORKLOADS:
        for label, cache in (("cold_nocache", 0), ("cold_populate", 1),
                             ("warm_crossproc", 1)):
            out = subprocess.run(
                [sys.executable, here, "--child", name,
                 "--cache", str(cache)],
                capture_output=True, text=True, timeout=3600, cwd=cwd)
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")]
            if line:
                r = json.loads(line[-1])
                r["mode"] = label
                rows.append(r)
                print(json.dumps(r), flush=True)
            else:
                print(json.dumps({"workload": name, "mode": label,
                                  "error": out.stderr[-200:]}),
                      flush=True)
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
