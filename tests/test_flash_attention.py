"""Pallas flash attention (interpret mode on CPU) vs the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteasr_tpu.ops.flash_attention import flash_attention


def reference_attention(q, k, v, bias=None, mask=None, scale=1.0):
    s = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        s = s + bias
    if mask is not None:
        s = jnp.where(mask, -1e30, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("tq,tk,d", [(64, 64, 32), (100, 140, 64)])
def test_flash_matches_reference(rng, tq, tk, d):
    bh = 3
    q = jnp.asarray(rng.normal(size=(bh, tq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(bh, tk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(bh, tk, d)), jnp.float32)
    out = flash_attention(q, k, v, scale=0.2, tq=32, tk=32, interpret=True)
    ref = reference_attention(q, k, v, scale=0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_with_bias_and_mask(rng):
    bh, tq, tk, d = 2, 48, 48, 32
    q = jnp.asarray(rng.normal(size=(bh, tq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(bh, tk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(bh, tk, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(bh, tq, tk)), jnp.float32)
    mask = jnp.asarray(rng.random(size=(bh, tq, tk)) < 0.3)
    # keep at least one unmasked key per query
    mask = mask.at[:, :, 0].set(False)
    out = flash_attention(q, k, v, bias=bias, mask=mask, scale=0.18,
                          tq=16, tk=16, interpret=True)
    ref = reference_attention(q, k, v, bias=bias, mask=mask, scale=0.18)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_bf16(rng):
    bh, t, d = 2, 64, 64
    q = jnp.asarray(rng.normal(size=(bh, t, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(bh, t, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(bh, t, d)), jnp.bfloat16)
    out = flash_attention(q, k, v, scale=0.125, tq=32, tk=32, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = reference_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                              v.astype(jnp.float32), scale=0.125)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)
