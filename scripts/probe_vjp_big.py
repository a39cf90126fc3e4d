import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import raytpu
from raytpu import bvh as bvh_mod
from raytpu.kernels import gradkernel
from raytpu.config import RenderConfig
cfg = RenderConfig(width=800, height=400, spp=20, depth=12)
scene = raytpu.final_world()
b = bvh_mod.build_bvh(scene)
def cam_i(i):
    return raytpu.make_camera((13.+i*1e-4,2.,3.),(0.,0.,0.),vfov=20.,aspect=cfg.aspect)
rays = cfg.width*cfg.height*cfg.spp
ct = jnp.ones((cfg.height, cfg.width, 3), jnp.float32) * 1e-6
vjp = jax.jit(lambda s, c: jnp.sum(
    gradkernel.render_pallas_vjp(s, c, cfg, ct, bvh=b)[1].center))
float(vjp(scene, cam_i(98)))
ts=[]
for i in range(2):
    t0=time.perf_counter(); float(vjp(scene, cam_i(i))); ts.append(time.perf_counter()-t0)
print(f'final-scene fused vjp+bvh: {min(ts)*1e3:.0f} ms, {rays/min(ts)/1e6:.1f} Mrays/s', flush=True)
