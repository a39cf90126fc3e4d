import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import raytpu
from raytpu.kernels import megakernel
from raytpu.config import CONFIG2
cfg = CONFIG2
scene = raytpu.config2_world()
rays = cfg.width*cfg.height*cfg.spp
f = jax.jit(lambda s, c: megakernel.render_pallas(s, c, cfg))
def cam_i(i):
    return raytpu.make_camera((13.+i*1e-4,2.,3.),(0.,0.,0.),vfov=20.,aspect=cfg.aspect)
print('compiling...', flush=True)
t0=time.time()
out = np.asarray(f(scene, cam_i(99)))
print(f'first: {time.time()-t0:.1f}s', flush=True)
times=[]
for i in range(4):
    t0=time.perf_counter()
    out = np.asarray(f(scene, cam_i(i)))
    times.append(time.perf_counter()-t0)
print('per-call s:', ['%.3f'%t for t in times], flush=True)
dt = min(times)
print(f'pallas best: {dt*1e3:.1f} ms, {rays/dt/1e6:.1f} Mrays/s', flush=True)
