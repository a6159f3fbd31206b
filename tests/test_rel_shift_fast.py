"""Parity of the gather-based rel_shift against the pad-reshape reference.

``rel_shift`` (pad + flat-reinterpret reshape, the reference formulation —
liteasr/nets/attention.py:99-118) is the semantic ground truth, including
the legacy crossover where out[t, j > t+1] reads query row t+1's scores.
``rel_shift_fast`` computes the identical permutation as ONE
layout-preserving gather along the minor axis — no (T2+1, T1)
relayout-reshape pair, which XLA lowers to a slow tiled transpose on TPU.
Values and gradients must match bit-for-bit (it is a permutation + mask:
no arithmetic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteasr_tpu.nets.attention import rel_shift, rel_shift_fast


@pytest.mark.parametrize("t", [3, 8, 199])
def test_values_match(t):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, t, t)), jnp.float32)
    a = rel_shift(x)
    b = rel_shift_fast(x)
    assert jnp.array_equal(a, b), float(jnp.abs(a - b).max())


@pytest.mark.parametrize("t", [5, 64])
def test_grads_match(t):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 2, t, t)), jnp.float32)
    co = jnp.asarray(rng.normal(size=(1, 2, t, t)), jnp.float32)

    ga = jax.grad(lambda x: (rel_shift(x) * co).sum())(x)
    gb = jax.grad(lambda x: (rel_shift_fast(x) * co).sum())(x)
    assert jnp.array_equal(ga, gb), float(jnp.abs(ga - gb).max())


def test_bf16_dtype_preserved():
    x = jnp.ones((1, 1, 16, 16), jnp.bfloat16)
    assert rel_shift_fast(x).dtype == jnp.bfloat16
