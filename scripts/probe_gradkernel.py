import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import raytpu
from raytpu import golden
from raytpu.kernels import gradkernel
from raytpu.config import CONFIG2
cfg = CONFIG2
scene = raytpu.config2_world()
def cam_i(i):
    return raytpu.make_camera((13.+i*1e-4,2.,3.),(0.,0.,0.),vfov=20.,aspect=cfg.aspect)
target = golden.render_golden(scene, cam_i(0), cfg)
rays = cfg.width*cfg.height*cfg.spp

@jax.jit
def fb(s, c):
    img0 = gradkernel.render_pallas_vjp(s, c, cfg, jnp.zeros_like(target))[0]
    ct = 2.0 * (img0 - target) / img0.size
    img, ds, dc = gradkernel.render_pallas_vjp(s, c, cfg, ct)
    return (jnp.sum(ds.center) + jnp.sum(ds.radius) + jnp.sum(ds.albedo)
            + jnp.sum(ds.mat_param) + jnp.sum(dc.origin) + jnp.sum(dc.horizontal)
            + jnp.sum(dc.vertical) + jnp.sum(dc.lower_left))

t0=time.time()
v = float(fb(scene, cam_i(99)))
print(f'compile+first: {time.time()-t0:.1f}s val={v:.6g}', flush=True)
ts=[]
for i in range(3):
    t0=time.perf_counter(); float(fb(scene, cam_i(i))); ts.append(time.perf_counter()-t0)
dt=sorted(ts)[1]
print(f'fused fwd+ct+fwdbwd: {dt*1e3:.1f} ms, {rays/dt/1e6:.2f} Mrays/s', flush=True)

# correctness vs XLA autodiff on TPU
from raytpu import adjoint
def loss(s, c):
    return jnp.mean((adjoint.render_golden_adjoint(s, c, cfg) - target)**2)
gs, gc = jax.jit(jax.grad(loss, argnums=(0,1), allow_int=True))(scene, cam_i(0))
img0 = gradkernel.render_pallas_vjp(scene, cam_i(0), cfg, jnp.zeros_like(target))[0]
ct = 2.0 * (img0 - target) / img0.size
_, ds, dc = jax.jit(lambda s, c, ct: gradkernel.render_pallas_vjp(s, c, cfg, ct))(scene, cam_i(0), ct)
for k in ('center','radius','albedo','mat_param'):
    a, b = np.array(getattr(ds,k)), np.array(getattr(gs,k))
    print(k, 'rel', np.abs(a-b).max()/max(np.abs(b).max(),1e-9), flush=True)
