"""Chunked vs monolithic lax.sort cost on the wavefront's operand set.

Motivation: the wavefront's sort boundary costs ~37 ms at R=640k x 16
f32 operands on a v5e, but 320k x 15 measured only 2.3 ms — strongly
superlinear (the operand set outgrows VMEM and the sort falls into a
multi-chunk merge regime).  Rays are independent, so the image is
bit-identical under ANY permutation: sorting C independent chunks
(lax.sort batches over leading axes natively) keeps tiles coherent
WITHIN chunks and compacts dead rays to each chunk's tail, at what
should be near-linear cost.
"""
import sys, time

sys.path.insert(0, '.')
import jax
import jax.numpy as jnp
import numpy as np

R = 640 * 1024
NOPS = 15  # key + pid + 13 planes (alive derived from key)


def run(chunks):
    rows = R // chunks

    @jax.jit
    def f(key, planes):
        ops = [key.reshape(chunks, rows)] + [
            p.reshape(chunks, rows) for p in planes]
        out = jax.lax.sort(ops, dimension=1, num_keys=1)
        return sum(jnp.sum(o[:, ::1024]) for o in out)

    k = jax.random.key(0)
    key = jax.random.randint(k, (R,), 0, 8192).astype(jnp.float32)
    planes = [jax.random.uniform(jax.random.fold_in(k, i), (R,))
              for i in range(NOPS - 1)]
    float(f(key, planes))
    ts = []
    for i in range(5):
        key2 = key + np.float32(i * 1e-3)
        t0 = time.perf_counter()
        float(f(key2, planes))
        ts.append(time.perf_counter() - t0)
    print(f"chunks={chunks:4d} rows={rows:7d}: {min(ts)*1e3:7.2f} ms"
          f"  (all {[f'{x*1e3:.1f}' for x in ts]})")


for c in (1, 2, 4, 8, 16, 32, 64, 160):
    run(c)
