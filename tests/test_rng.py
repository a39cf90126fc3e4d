"""RNG bit-exactness: vectorized jnp implementation vs the independent
scalar numpy transcription (tests/hlsl_ref.py), plus jit-stability —
the property that motivated the counter-based u32 redesign (float-seed
chains change bits under XLA's algebraic simplifier)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytpu import rng
import hlsl_ref


def test_base_hash_matches_scalar_ref():
    xs = np.array([0, 1, 2, 17, 1023, 575, 12345, 2**31, 2**32 - 1], np.uint32)
    ys = np.array([0, 5, 2, 99, 575, 1023, 54321, 7, 2**32 - 2], np.uint32)
    got = np.asarray(rng.base_hash(jnp.asarray(xs), jnp.asarray(ys)))
    want = np.array([hlsl_ref.base_hash(int(x), int(y)) for x, y in zip(xs, ys)])
    np.testing.assert_array_equal(got, want)


def test_hash_stream_bit_exact():
    """Chained hash1/hash2/hash3 draws agree bitwise over a long stream."""
    states = np.array([0, 1, 12345, 2**31, 0xDEADBEEF], np.uint32)
    j_state = jnp.asarray(states)
    n_states = [np.uint32(s) for s in states]
    for step in range(60):
        kind = step % 3
        if kind == 0:
            jv, j_state = rng.hash1(j_state)
            ref = [hlsl_ref.hash1(s) for s in n_states]
            np.testing.assert_array_equal(
                np.asarray(jv), np.array([r[0] for r in ref], np.float32))
        elif kind == 1:
            (ja, jb), j_state = rng.hash2(j_state)
            ref = [hlsl_ref.hash2(s) for s in n_states]
            np.testing.assert_array_equal(
                np.asarray(ja), np.array([r[0][0] for r in ref], np.float32))
            np.testing.assert_array_equal(
                np.asarray(jb), np.array([r[0][1] for r in ref], np.float32))
        else:
            (ja, jb, jc), j_state = rng.hash3(j_state)
            ref = [hlsl_ref.hash3(s) for s in n_states]
            for got, want in zip(
                    (ja, jb, jc),
                    ([r[0][0] for r in ref], [r[0][1] for r in ref],
                     [r[0][2] for r in ref])):
                np.testing.assert_array_equal(
                    np.asarray(got), np.array(want, np.float32))
        n_states = [r[1] for r in ref]
        np.testing.assert_array_equal(
            np.asarray(j_state), np.array(n_states, np.uint32))


def test_jit_bit_stability():
    """Draw streams are bit-identical eager vs jit — integer state cannot
    be reassociated by XLA (the float-seed scheme fails this test)."""
    states = jnp.arange(4096, dtype=jnp.uint32) * jnp.uint32(2654435761)

    def draws(s):
        v1, s = rng.hash1(s)
        (a, b), s = rng.hash2(s)
        (x, y, z), s = rng.random_in_unit_sphere(s)
        (dx, dy), s = rng.random_in_unit_disk(s)
        return (v1, a, b, s), (x, y, z, dx, dy)

    exact_e, trans_e = draws(states)
    exact_j, trans_j = jax.jit(draws)(states)
    for e, j in zip(exact_e, exact_j):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(j))
    # transcendental mappings (sin/cos/cbrt) may differ by ~1 ulp under jit
    for e, j in zip(trans_e, trans_j):
        np.testing.assert_allclose(np.asarray(e), np.asarray(j), atol=1e-6)


def test_uniformity():
    """Draws are roughly uniform on [0,1) (sanity, not a statistical suite)."""
    states = jnp.arange(1 << 16, dtype=jnp.uint32)
    v, _ = rng.hash1(states)
    v = np.asarray(v)
    assert 0.0 <= v.min() and v.max() < 1.0
    hist, _ = np.histogram(v, bins=16, range=(0, 1))
    assert hist.min() > 0.8 * (len(v) / 16)
    assert abs(v.mean() - 0.5) < 0.01


def test_unit_sphere_and_disk_samples():
    states = (np.arange(256) * 7919).astype(np.uint32)
    (x, y, z), new_state = rng.random_in_unit_sphere(jnp.asarray(states))
    r = np.sqrt(np.asarray(x) ** 2 + np.asarray(y) ** 2 + np.asarray(z) ** 2)
    assert (r <= 1.0 + 1e-6).all()
    want = [hlsl_ref.random_in_unit_sphere(np.uint32(s)) for s in states]
    np.testing.assert_allclose(
        np.stack([np.asarray(x), np.asarray(y), np.asarray(z)], -1),
        np.array([w[0] for w in want]), atol=2e-6)
    np.testing.assert_array_equal(
        np.asarray(new_state), np.array([w[1] for w in want], np.uint32))

    (dx, dy), _ = rng.random_in_unit_disk(jnp.asarray(states))
    rr = np.asarray(dx) ** 2 + np.asarray(dy) ** 2
    assert (rr <= 1.0 + 1e-6).all()
    wantd = [hlsl_ref.random_in_unit_disk(np.uint32(s)) for s in states]
    np.testing.assert_allclose(
        np.stack([np.asarray(dx), np.asarray(dy)], -1),
        np.array([w[0] for w in wantd]), atol=2e-6)


def test_layout_invariance():
    """Draws depend only on the state value, not array layout/shape —
    the property that makes renders sharding-invariant."""
    states = (np.arange(64) * 2654435761).astype(np.uint32)
    v_flat, _ = rng.hash1(jnp.asarray(states))
    v_2d, _ = rng.hash1(jnp.asarray(states).reshape(8, 8))
    np.testing.assert_array_equal(np.asarray(v_flat),
                                  np.asarray(v_2d).reshape(-1))
