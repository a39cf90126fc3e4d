import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax
import raytpu
from raytpu.kernels import megakernel
from raytpu.config import CONFIG2
cfg = CONFIG2
scene = raytpu.config2_world()
cam = raytpu.make_camera((13.,2.,3.),(0.,0.,0.),vfov=20.,aspect=cfg.aspect)
out = megakernel.render_pallas(scene, cam, cfg); jax.block_until_ready(out)
rays = cfg.width*cfg.height*cfg.spp
t0=time.perf_counter()
for _ in range(5): out = megakernel.render_pallas(scene, cam, cfg)
jax.block_until_ready(out)
dt=(time.perf_counter()-t0)/5
tag = f"static={os.environ.get('RAYTPU_STATIC_BOUNDS','')} noee={os.environ.get('RAYTPU_NO_EARLY_EXIT','')}"
print(f'{tag}: {dt*1e3:.1f} ms, {rays/dt/1e6:.1f} Mrays/s', flush=True)
