import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import raytpu
from raytpu import golden
from raytpu.kernels import gradkernel
from raytpu.config import CONFIG2
cfg = CONFIG2
scene = raytpu.config2_world()
cam = raytpu.make_camera((13.,2.,3.),(0.,0.,0.),vfov=20.,aspect=cfg.aspect)
target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
img_ref = golden.render_golden(scene, cam, cfg)
ct = 2.0 * (img_ref - target) / img_ref.size
_, ds, dc = jax.jit(lambda s, c, ct: gradkernel.render_pallas_vjp(s, c, cfg, ct))(scene, cam, ct)
print('TPU fused center grads:'); print(np.array(ds.center))
np.save('/tmp/gk_tpu_center.npy', np.array(ds.center))
np.save('/tmp/gk_tpu_alb.npy', np.array(ds.albedo))
