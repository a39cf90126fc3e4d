"""Round-5 backward-pass roofline: decompose the fused VJP kernel's
device time into its cost centers at the BASELINE flagship workload
(config-4: 500 spheres, 800x400, 100 spp, depth 12, parallel RNG).

Two instruments:
  1. the device trace of one fwd+bwd dispatch already separates the
     forward render kernel from the VJP kernel (distinct XLA ops);
  2. RAYTPU_BWD_ABL timing-only ablations (gradkernel._ABL) kill one
     VJP cost center each while keeping the refill state machine's
     schedule identical:
       norev          -> forward window machinery only (sweep + stores
                         + bounce math + respawn); reverse = base - this
       norev,nostore  -> the 23-plane residual stores' share
       noscatter      -> the per-step one-hot scatter matmuls' share
       novjp          -> the in-kernel jax.vjp transpose's share

Usage:
  python scripts/probe_bwd_roofline_r5.py            # full ledger
  python scripts/probe_bwd_roofline_r5.py --abl X    # one cell (JSON)

LEDGER (one v5e, 2026-08-20, pre-tape classic kernel):
  fwd+bwd total 1026.2 ms = render fwd 470.2 + VJP kernel 555.9
  VJP kernel: norev 482.8 (window forward) -> reverse = 73.1
              norev,nostore 483.1          -> residual stores ~ 0
              noscatter 504.5              -> scatter matmuls = 51.4
              novjp 536.7                  -> vjp transpose  = 19.2
  => the VJP kernel was 87% a DUPLICATED forward (its closest-hit
  sweep re-swept what the render had already swept).  This measurement
  drove the round-5 winner-index tape: post-tape the same dispatch
  reads 651.7 ms (VJP 152.9) and, with the right-sized builder +
  depth-aware windows, 622.2 ms = 51.4 Mrays/s (BASELINE.md round 5).

POST-TAPE LEDGER (same probe re-run on the final round-5 code — the
jax.grad path tapes automatically):
  fwd+bwd total 621.2 ms = taping forward 468.3 + replay VJP 152.9
  replay: norev 71.6 (tape read + one-hot gather + bounce + respawn)
          reverse walk = 81.3, of which scatter matmuls 51.2, vjp
          transpose 19.4, residual stores 7.1
  => the taping forward (the round-4-exhausted sweep + ~6% parking) is
  now 75% of the step; the biggest unexplored replay lever is the
  per-step one-hot scatter (51 ms — the 48-row bf16x3 layout is pinned
  by sublane-16 alignment; slimming needs a gsc-accumulator redesign).
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def measure(spp):
    import jax
    import jax.numpy as jnp
    import raytpu
    from raytpu.bvh import build_bvh
    from raytpu.config import RenderConfig
    from raytpu.render import render
    from raytpu import profiling

    cfg = RenderConfig(width=800, height=400, spp=spp, depth=12,
                       rng_mode="parallel")
    scene = raytpu.final_world()
    bvh = build_bvh(scene, leaf_size=64)
    cam = raytpu.make_camera((13.0, 2.0, 3.0), (0.0, 0.0, 0.0),
                             vfov=20.0, aspect=cfg.aspect)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    @jax.jit
    def fwdbwd(s, c):
        def loss_fn(s, c):
            img = render(s, c, cfg, backend="pallas", bvh=bvh)
            return jnp.mean((img - target) ** 2)
        g = jax.grad(loss_fn, argnums=(0, 1), allow_int=True)(s, c)
        return jnp.sum(g[0].center) + jnp.sum(g[1].origin)

    float(fwdbwd(scene, cam))  # compile
    evs = profiling.device_events(lambda: float(fwdbwd(scene, cam)))
    # top-level program event + the two kernels (largest sub-events)
    total = evs[0][1]
    sub = [(n, d) for n, d in evs[1:] if d > 1.0][:6]
    return {"total_ms": round(total, 1),
            "top_events": [(n[:60], round(d, 1)) for n, d in sub]}


ABLATIONS = ["norev", "norev,nostore", "noscatter", "novjp"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--abl", default=None)
    ap.add_argument("--spp", type=int, default=100)
    args = ap.parse_args()
    if args.abl is not None:
        os.environ["RAYTPU_BWD_ABL"] = args.abl
        print(json.dumps({"abl": args.abl, **measure(args.spp)}))
        return

    rows = []
    base = measure(args.spp)
    rows.append({"abl": "", **base})
    print(json.dumps(rows[-1]), flush=True)
    for abl in ABLATIONS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--abl", abl,
             "--spp", str(args.spp)],
            capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(
                __file__))))
        line = [l for l in out.stdout.splitlines()
                if l.startswith("{")]
        if line:
            rows.append(json.loads(line[-1]))
            print(line[-1], flush=True)
        else:
            print(json.dumps({"abl": abl, "error":
                              out.stderr.strip()[-300:]}), flush=True)

    # ledger: the VJP kernel is the largest sub-event of each run
    def vjp_ms(r):
        return max((d for n, d in r.get("top_events", [])), default=0.0)

    base_vjp = vjp_ms(rows[0])
    print("\n== VJP-kernel ledger (config-4 @ %d spp, device ms) ==" %
          args.spp)
    print(f"  full VJP kernel        {base_vjp:8.1f}")
    for r in rows[1:]:
        if "error" in r:
            print(f"  {r['abl']:<22} ERROR")
            continue
        v = vjp_ms(r)
        print(f"  {r['abl']:<22} {v:8.1f}   share of base "
              f"{100 * (base_vjp - v) / base_vjp:5.1f}%")


if __name__ == "__main__":
    main()
