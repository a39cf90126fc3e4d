"""Turnkey pod scaling benchmark — BASELINE config 5 (1920x1080, 500
spp, depth 12, 500-sphere scene): 1-chip vs N-chip rays/s and the
scaling-efficiency table BASELINE.json asks for (>= 90% target).

One command on a pod owner's machine:

    python scripts/pod_bench.py                     # all local devices
    python scripts/pod_bench.py --spp 100           # shorter frames
    python scripts/pod_bench.py --train             # + fwd+bwd scaling

Multi-host: run the same command on every host after setting the usual
pod env (the script calls ``jax.distributed.initialize()`` when
``--distributed`` is passed); the mesh then spans all processes.

CPU validation mode (what the driver dryrun exercises — the harness
end-to-end on the virtual 8-device mesh, tiny shapes, interpret-mode
kernels; the NUMBERS are meaningless, the table and plumbing are real):

    python scripts/pod_bench.py --cpu

Timing protocol (CLAUDE.md): everything under one jit, scalar checksum
forced with float(), DISTINCT camera per timed call, median of
``--iters``.  Efficiency(N) = rays_s(N) / (N * rays_s(1)).
"""
import sys, os, time, json, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="virtual 8-device CPU mesh, tiny shapes")
    ap.add_argument("--distributed", action="store_true",
                    help="call jax.distributed.initialize() first")
    ap.add_argument("--spp", type=int, default=None,
                    help="override spp (default: 500, or 2 with --cpu)")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--train", action="store_true",
                    help="also measure train-step (fwd+bwd) scaling")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--sizes", type=str, default=None,
                    help="comma-separated mesh sizes (default: 1,2,4,...,D)")
    args = ap.parse_args(argv)

    if args.cpu:
        import scripts._debug_cpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    if args.distributed:
        from raytpu.shard import init_distributed
        init_distributed()

    import raytpu
    from raytpu import shard, bvh as bvh_mod
    from raytpu.config import RenderConfig

    devices = jax.devices()
    D = len(devices)
    if args.cpu:
        cfg = RenderConfig(width=args.width or 320,
                           height=args.height or 160,
                           spp=args.spp or 2, depth=args.depth or 4)
        iters = 1
    else:
        cfg = RenderConfig(width=args.width or 1920,
                           height=args.height or 1080,
                           spp=args.spp or 500, depth=args.depth or 12)
        iters = args.iters
    scene = raytpu.final_world()
    b = bvh_mod.build_bvh(scene)
    rays = cfg.width * cfg.height * cfg.spp

    if args.sizes:
        sizes = [int(s) for s in args.sizes.split(",")]
    else:
        sizes = []
        n = 1
        while n <= D:
            sizes.append(n)
            n *= 2
        if sizes[-1] != D:
            sizes.append(D)
    sizes = [n for n in sizes if n <= D]

    def cam_i(i):
        return raytpu.make_camera((13.0 + i * 1e-4, 2.0, 3.0),
                                  (0.0, 0.0, 0.0), vfov=20.0,
                                  aspect=cfg.aspect)

    def median_time(fn):
        float(fn(cam_i(997)))  # compile/warmup
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            float(fn(cam_i(i)))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    rows = []
    tgt = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    for n in sizes:
        mesh = shard.make_mesh(devices[:n])

        def fwd(cam, mesh=mesh):
            img = shard.render_sharded_pallas(scene, cam, cfg, mesh=mesh,
                                              bvh=b)
            return jnp.sum(img)

        t = median_time(jax.jit(fwd))
        row = dict(n=n, fwd_s=round(t, 4),
                   fwd_rays_s=round(rays / t))
        if args.train:
            step = shard.make_train_step_pallas(cfg, mesh, lr=0.0, bvh=b)

            def fb(cam, step=step):
                _, _, loss = step(scene, cam, tgt)
                return loss

            tt = median_time(fb)
            row.update(fwdbwd_s=round(tt, 4),
                       fwdbwd_rays_s=round(rays / tt))
        rows.append(row)

    anchor = rows[0]["fwd_rays_s"]
    # On a VIRTUAL CPU mesh all n "devices" share the host's cores, so
    # the achievable efficiency ceiling is min(1, ncores/n) — with 4
    # cores an 8-device mesh can reach at most 50%.  The ceiling is
    # stated per row so the dryrun table reads as "fraction of the
    # virtual-mesh ceiling", not as a (meaningless) absolute scaling
    # number; real-pod efficiency needs real chips.
    ncores = os.cpu_count() or 1
    cpu_mesh = devices[0].platform == "cpu"
    print(f"\n{'N':>3} {'fwd s':>9} {'fwd Mrays/s':>12} {'eff %':>7}"
          + ("  ceil %" if cpu_mesh else "")
          + ("  fwd+bwd Mrays/s  eff %" if args.train else ""))
    for r in rows:
        eff = 100.0 * r["fwd_rays_s"] / (r["n"] * anchor)
        r["fwd_eff_pct"] = round(eff, 1)
        line = (f"{r['n']:>3} {r['fwd_s']:>9.3f} "
                f"{r['fwd_rays_s']/1e6:>12.1f} {eff:>7.1f}")
        if cpu_mesh:
            ceil = 100.0 * min(1.0, ncores / r["n"])
            r["cpu_ceiling_pct"] = round(ceil, 1)
            line += f" {ceil:>7.1f}"
        if args.train:
            effb = (100.0 * r["fwdbwd_rays_s"]
                    / (r["n"] * rows[0]["fwdbwd_rays_s"]))
            r["fwdbwd_eff_pct"] = round(effb, 1)
            line += f"  {r['fwdbwd_rays_s']/1e6:>15.1f} {effb:>6.1f}"
        print(line)
    out = {"config": f"{cfg.width}x{cfg.height} spp{cfg.spp} "
                     f"depth{cfg.depth} n_spheres{scene.count}",
           "platform": devices[0].platform,
           "rows": rows}
    if cpu_mesh:
        out["host_cores"] = ncores
    print(json.dumps(out))
    return rows


if __name__ == "__main__":
    main()
