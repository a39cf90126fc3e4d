import sys, os, time, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import raytpu
from raytpu import golden, adjoint
from raytpu.config import CONFIG2
scene = raytpu.config2_world()
cfg = CONFIG2.replace(rng_mode="parallel", chunk_pixels=131072)
cam = raytpu.make_camera((13.,2.,3.),(0.,0.,0.),vfov=20.,aspect=cfg.aspect)
target = golden.render_golden(scene, cam, cfg)
@jax.jit
def fb(s, c):
    def loss(s, c):
        return jnp.mean((adjoint.render_golden_adjoint(s, c, cfg) - target)**2)
    g = jax.grad(loss, argnums=(0,1), allow_int=True)(s, c)
    return sum(jnp.sum(l) for l in
               [g[0].center, g[0].radius, g[0].albedo, g[0].mat_param])
float(fb(scene, cam))
jax.profiler.start_trace("/tmp/jaxtrace")
float(fb(scene, cam))
jax.profiler.stop_trace()
print(glob.glob("/tmp/jaxtrace/**/*", recursive=True))
