import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import raytpu
from raytpu import golden, bvh as bvh_mod
from raytpu.kernels import megakernel
from raytpu.config import REFERENCE_V2, CONFIG4

def timed(label, fn, scene, rays, iters=2):
    f = jax.jit(lambda s, c: jnp.sum(fn(s, c)))
    def cam_i(i):
        return raytpu.make_camera((13.+i*1e-4,2.,3.),(0.,0.,0.),vfov=20.,
                                  aspect=ASPECT)
    float(f(scene, cam_i(99)))
    ts=[]
    for i in range(iters):
        t0=time.perf_counter(); float(f(scene, cam_i(i)))
        ts.append(time.perf_counter()-t0)
    dt=min(ts)
    print(f'{label}: {dt*1e3:.1f} ms, {rays/dt/1e6:.1f} Mrays/s', flush=True)

# reference v2 workload: 1024x576, 60spp, depth50, ~328 spheres
cfg = REFERENCE_V2
ASPECT = cfg.aspect
scene = raytpu.random_world()
rays = cfg.width*cfg.height*cfg.spp
print('refv2 spheres:', scene.count, flush=True)
b = bvh_mod.build_bvh(scene, leaf_size=8)
timed('refv2 pallas+bvh', lambda s,c: megakernel.render_pallas(s,c,cfg,bvh=b), scene, rays)
timed('refv2 pallas brute', lambda s,c: megakernel.render_pallas(s,c,cfg), scene, rays)
