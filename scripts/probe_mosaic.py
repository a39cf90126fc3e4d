"""Probe Mosaic compile times for the megakernel's loop shapes (TPU)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(shape_kind, spp, depth, nsph):
    def kernel(sc_ref, out_ref):
        zero = jnp.zeros((8, 128), jnp.float32)

        def trace(ox, sd):
            def sphere_body(j, hs):
                tb, acc = hs
                c = sc_ref[0, j]
                t = (ox - c) * (ox - c) + sd.astype(jnp.int32).astype(
                    jnp.float32) * 1e-9
                win = t < tb
                return jnp.where(win, t, tb), jnp.where(win, acc + c, acc)

            def body_fori(d, st):
                ox, acc, alive_f, sd = st
                tb, acc = jax.lax.fori_loop(
                    0, nsph, sphere_body, (zero + 1e30, acc))
                alive_f = jnp.where(tb < 1.0, alive_f, 0.0)
                sd = sd + jnp.uint32(1)
                return ox * 0.99, acc, alive_f, sd

            if shape_kind == "fori":
                st = jax.lax.fori_loop(
                    0, depth, body_fori, (ox, zero, zero + 1.0, sd))
            else:
                def cond(st2):
                    d, ox, acc, alive_f, sd = st2
                    return (d < depth) & (jnp.max(alive_f) > 0)

                def body_w(st2):
                    d, ox, acc, alive_f, sd = st2
                    ox, acc, alive_f, sd = body_fori(
                        d, (ox, acc, alive_f, sd))
                    return d + 1, ox, acc, alive_f, sd

                st = jax.lax.while_loop(
                    cond, body_w, (jnp.int32(0), ox, zero, zero + 1.0, sd))[1:]
            return st[1]

        def sample(s, carry):
            acc, sd = carry
            r = trace(zero + 0.5, sd)
            return acc + r, sd + jnp.uint32(7)

        acc, _ = jax.lax.fori_loop(
            0, spp, sample, (zero, jnp.zeros((8, 128), jnp.uint32)))
        out_ref[:, :] = acc

    return kernel


def probe(kind, spp, depth, nsph):
    sc = jnp.ones((2, max(nsph, 1)), jnp.float32)
    k = make_kernel(kind, spp, depth, nsph)
    f = pl.pallas_call(
        k,
        grid=(2, 1),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )
    t0 = time.time()
    out = jax.jit(f)(sc)
    jax.block_until_ready(out)
    print(f"{kind} spp={spp} depth={depth} nsph={nsph}: "
          f"{time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    kind = sys.argv[1]
    spp, depth, nsph = (int(x) for x in sys.argv[2:5])
    probe(kind, spp, depth, nsph)
