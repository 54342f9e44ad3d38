"""Custom max-pool backward must match XLA's select-and-scatter exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from htr_vt_tpu.ops.pool import max_pool


def _xla_pool(x):
    return nn.max_pool(x, window_shape=(3, 3), strides=(2, 1),
                       padding=((1, 1), (1, 1)))


@pytest.mark.parametrize("shape", [(2, 16, 24, 4), (1, 17, 9, 3)])
def test_forward_matches(shape):
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    np.testing.assert_array_equal(np.asarray(max_pool(x)),
                                  np.asarray(_xla_pool(x)))


@pytest.mark.parametrize("seed", [0, 1])
def test_backward_matches_select_and_scatter(seed):
    x = jax.random.normal(jax.random.PRNGKey(seed), (2, 16, 24, 4))
    g1 = jax.grad(lambda t: (max_pool(t) ** 2).sum())(x)
    g2 = jax.grad(lambda t: (_xla_pool(t) ** 2).sum())(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_backward_ties_first_match():
    """Ties (e.g. ReLU zero plateaus) must route gradient to the first window
    element, like torch and XLA."""
    x = jnp.zeros((1, 6, 6, 1))  # all ties
    g1 = jax.grad(lambda t: max_pool(t).sum())(x)
    g2 = jax.grad(lambda t: _xla_pool(t).sum())(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    assert np.asarray(g1).sum() > 0


def test_backward_with_relu_plateaus():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 12, 16, 2))
    x = jnp.maximum(x, 0)  # realistic post-ReLU ties at zero
    g1 = jax.grad(lambda t: (max_pool(t) * 1.7).sum())(x)
    g2 = jax.grad(lambda t: (_xla_pool(t) * 1.7).sum())(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
