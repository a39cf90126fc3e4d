import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import raytpu
from raytpu import bvh as bvh_mod
from raytpu.kernels import megakernel
from raytpu.config import RenderConfig
cfg = RenderConfig(width=800, height=400, spp=20, depth=12)
scene = raytpu.final_world()
def cam_i(i):
    return raytpu.make_camera((13.+i*1e-4,2.,3.),(0.,0.,0.),vfov=20.,aspect=cfg.aspect)
rays = cfg.width*cfg.height*cfg.spp
for leaf in (4, 8, 16, 32):
    b = bvh_mod.build_bvh(scene, leaf_size=leaf)
    f = jax.jit(lambda s, c, b=b: jnp.sum(megakernel.render_pallas(s, c, cfg, bvh=b)))
    float(f(scene, cam_i(99)))
    ts=[]
    for i in range(2):
        t0=time.perf_counter(); float(f(scene, cam_i(i))); ts.append(time.perf_counter()-t0)
    dt=min(ts)
    print(f'leaf={leaf} nodes={b.n_nodes}: {dt*1e3:.0f} ms, {rays/dt/1e6:.1f} Mrays/s', flush=True)
