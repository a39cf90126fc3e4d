import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import raytpu
from raytpu.kernels import megakernel
from raytpu.config import RenderConfig
scene = raytpu.config2_world()
def cam_i(i, aspect):
    return raytpu.make_camera((13.+i*1e-4,2.,3.),(0.,0.,0.),vfov=20.,aspect=aspect)
for spp in (20, 100, 300):
    cfg = RenderConfig(width=400, height=200, spp=spp, depth=12)
    f = jax.jit(lambda s, c: jnp.sum(megakernel.render_pallas(s, c, cfg)))
    float(f(scene, cam_i(99, cfg.aspect)))
    ts = []
    for i in range(3):
        t0=time.perf_counter(); float(f(scene, cam_i(i, cfg.aspect))); ts.append(time.perf_counter()-t0)
    dt = sorted(ts)[1]
    rays = cfg.width*cfg.height*spp
    print(f'spp={spp}: {dt*1e3:.1f} ms  ({rays/dt/1e6:.1f} Mrays/s)', flush=True)
