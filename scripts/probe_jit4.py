import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import raytpu
from raytpu import golden
from raytpu.kernels import megakernel
from raytpu.config import CONFIG2
cfg = CONFIG2
scene = raytpu.config2_world()
rays = cfg.width*cfg.height*cfg.spp
fp = jax.jit(lambda s, c: megakernel.render_pallas(s, c, cfg))
fg = jax.jit(lambda s, c: golden.render_golden(s, c, cfg))
cams = [raytpu.make_camera((13.+i*1e-4,2.,3.),(0.,0.,0.),vfov=20.,aspect=cfg.aspect)
        for i in range(21)]
cams = jax.device_put(cams)
for label, fn in (('pallas', fp), ('golden', fg)):
    jax.block_until_ready(fn(scene, cams[20]))
    t0=time.perf_counter()
    outs = [fn(scene, cams[i]) for i in range(20)]
    jax.block_until_ready(outs)
    dt=(time.perf_counter()-t0)/20
    print(f'{label} amortized: {dt*1e3:.2f} ms, {rays/dt/1e6:.1f} Mrays/s', flush=True)
