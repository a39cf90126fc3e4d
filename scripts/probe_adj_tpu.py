import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import raytpu
from raytpu import adjoint
from raytpu.config import CONFIG2
cfg = CONFIG2
scene = raytpu.config2_world()
cam = raytpu.make_camera((13.,2.,3.),(0.,0.,0.),vfov=20.,aspect=cfg.aspect)
target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
def loss(s, c):
    return jnp.mean((adjoint.render_golden_adjoint(s, c, cfg) - target)**2)
gs, gc = jax.jit(jax.grad(loss, argnums=(0,1), allow_int=True))(scene, cam)
print('TPU adjoint-XLA center grads:'); print(np.array(gs.center))
