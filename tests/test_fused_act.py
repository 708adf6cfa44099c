"""Fused Pallas snake-activation kernel vs the unfused XLA composition
(interpret mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flowhigh_tpu.models.bigvgan import (downsample1d, snake, snake_beta,
                                         upsample1d)
from flowhigh_tpu.ops import fused_snake_activation1d


def reference(x, alpha, beta, logscale):
    u = upsample1d(x, 2, 12)
    s = snake_beta(u, alpha, beta, logscale) if beta is not None else snake(
        u, alpha, logscale)
    return downsample1d(s, 2, 12)


@pytest.mark.parametrize("t,c", [(256, 128), (512, 64), (100, 48), (1000, 96)])
def test_matches_reference(rng, t, c):
    x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.3)
    ref = reference(x, alpha, beta, True)
    got = fused_snake_activation1d(x, alpha, beta, True, True)
    assert got.shape == ref.shape == (2, t, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_edges_exact(rng):
    # boundary samples go through the interleaved-clamp patch — check tightly
    x = jnp.asarray(rng.standard_normal((1, 300, 32)).astype(np.float32))
    alpha = jnp.zeros(32)
    ref = np.asarray(reference(x, alpha, alpha, True))
    got = np.asarray(fused_snake_activation1d(x, alpha, alpha, True, True))
    np.testing.assert_allclose(got[:, :8], ref[:, :8], atol=2e-5)
    np.testing.assert_allclose(got[:, -8:], ref[:, -8:], atol=2e-5)


def test_snake_no_beta(rng):
    x = jnp.asarray(rng.standard_normal((1, 200, 64)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 0.2)
    ref = reference(x, alpha, None, False)
    got = fused_snake_activation1d(x, alpha, None, False, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_gradient_matches_reference(rng):
    x = jnp.asarray(rng.standard_normal((1, 128, 32)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(32).astype(np.float32) * 0.2)
    beta = jnp.asarray(rng.standard_normal(32).astype(np.float32) * 0.2)

    def f_fused(x, a, b):
        return jnp.sum(jnp.square(fused_snake_activation1d(x, a, b, True, True)))

    def f_ref(x, a, b):
        return jnp.sum(jnp.square(reference(x, a, b, True)))

    gf = jax.grad(f_fused, argnums=(0, 1, 2))(x, alpha, beta)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, alpha, beta)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)
