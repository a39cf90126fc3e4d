"""Round-5 API probe: HBM (ANY-space) tape ref + per-step async DMA
inside a while_loop — the mechanism for the winner-index tape.

Kernel: for t in [0, T): stage[t%2] = f(t); DMA stage -> tape[t] (write
probe), then a second kernel prefetch-reads tape[t] back (read probe).
Checks correctness in interpret mode (CPU) and compiled (TPU).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 7
H, W = 8, 128


def write_kernel(x_ref, tape_ref, stage, sem):
    def body(t, _):
        slot = jax.lax.rem(t, 2)

        @pl.when(t >= 2)
        def _():
            pltpu.make_async_copy(stage.at[slot], tape_ref.at[t],
                                  sem.at[slot]).wait()

        stage[slot] = x_ref[:, :] + jnp.float32(t)
        pltpu.make_async_copy(stage.at[slot], tape_ref.at[t],
                              sem.at[slot]).start()
        return 0

    jax.lax.fori_loop(0, T, body, 0)
    # drain the last two in-flight copies
    for k in (2, 1):
        @pl.when(T >= k)
        def _(k=k):
            t = T - k
            pltpu.make_async_copy(stage.at[jax.lax.rem(t, 2)],
                                  tape_ref.at[t],
                                  sem.at[jax.lax.rem(t, 2)]).wait()


def read_kernel(tape_ref, out_ref, stage, sem):
    # prefetch t=0,1 then pipeline
    for t0 in range(2):
        pltpu.make_async_copy(tape_ref.at[t0], stage.at[t0],
                              sem.at[t0]).start()

    def body(t, acc):
        slot = jax.lax.rem(t, 2)
        pltpu.make_async_copy(tape_ref.at[t], stage.at[slot],
                              sem.at[slot]).wait()
        acc = acc + stage[slot]
        nxt = jnp.minimum(t + 2, T - 1)
        pltpu.make_async_copy(tape_ref.at[nxt], stage.at[slot],
                              sem.at[slot]).start()
        return acc

    acc = jax.lax.fori_loop(0, T, body, jnp.zeros((H, W), jnp.float32))
    # drain outstanding prefetches
    for k in (2, 1):
        slot = (T - k) % 2
        pltpu.make_async_copy(tape_ref.at[T - 1], stage.at[slot],
                              sem.at[slot]).wait()
    out_ref[:, :] = acc


def run(interpret):
    x = jnp.ones((H, W), jnp.float32)
    tape = pl.pallas_call(
        write_kernel,
        out_shape=jax.ShapeDtypeStruct((T, H, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((2, H, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(x)
    want = np.stack([np.ones((H, W)) + t for t in range(T)])
    ok_w = np.allclose(np.asarray(tape), want)

    out = pl.pallas_call(
        read_kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, H, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(tape)
    ok_r = np.allclose(np.asarray(out), want.sum(0))
    print(f"interpret={interpret}: write_ok={ok_w} read_ok={ok_r}")
    return ok_w and ok_r


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    if mode == "cpu":
        import scripts._debug_cpu  # noqa: F401
        run(True)
    else:
        run(False)
