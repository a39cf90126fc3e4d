import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import raytpu
from raytpu import golden, adjoint
from raytpu.config import CONFIG2
scene = raytpu.config2_world()
def cam_i(i, aspect):
    return raytpu.make_camera((13.+i*1e-4,2.,3.),(0.,0.,0.),vfov=20.,aspect=aspect)
for chunk in (16384, 40000, 80000):
    cfg = CONFIG2.replace(chunk_pixels=chunk)
    target = golden.render_golden(scene, cam_i(0, cfg.aspect), cfg)
    rays = cfg.width*cfg.height*cfg.spp
    @jax.jit
    def fb(s, c):
        def loss(s, c):
            return jnp.mean((adjoint.render_golden_adjoint(s, c, cfg) - target)**2)
        g = jax.grad(loss, argnums=(0,1), allow_int=True)(s, c)
        return sum(jnp.sum(l) for l in
                   [g[0].center, g[0].radius, g[0].albedo, g[0].mat_param,
                    g[1].origin, g[1].horizontal, g[1].vertical, g[1].lower_left])
    float(fb(scene, cam_i(99, cfg.aspect)))
    ts=[]
    for i in range(3):
        t0=time.perf_counter(); float(fb(scene, cam_i(i, cfg.aspect))); ts.append(time.perf_counter()-t0)
    dt=sorted(ts)[1]
    print(f'chunk={chunk}: fwd+bwd {dt*1e3:.1f} ms, {rays/dt/1e6:.2f} Mrays/s', flush=True)
