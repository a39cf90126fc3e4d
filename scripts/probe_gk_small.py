import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import raytpu
from raytpu.kernels import gradkernel
from raytpu.config import RenderConfig
cfg = RenderConfig(width=256, height=16, spp=2, depth=3)  # 4 tiles
scene = raytpu.test_world()
cam = raytpu.make_camera((13.,2.,3.),(0.,0.,0.),vfov=20.,aspect=cfg.aspect)
ct = jnp.ones((cfg.height, cfg.width, 3), jnp.float32)
t0=time.time()
img, ds, dc = jax.jit(lambda s, c: gradkernel.render_pallas_vjp(s, c, cfg, ct))(scene, cam)
jax.block_until_ready((img, ds.center))
print(f'small compile+run: {time.time()-t0:.1f}s', flush=True)
print('grads:', np.array(ds.center).sum(axis=1), flush=True)
