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


def test_flash_kv_lens_equals_suffix_mask(rng):
    """In-kernel length masking == materialized suffix padding mask."""
    bh, tq, tk, d = 3, 40, 56, 32
    q = jnp.asarray(rng.normal(size=(bh, tq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(bh, tk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(bh, tk, d)), jnp.float32)
    kv_lens = jnp.array([tk, 33, 17], jnp.int32)
    mask = jnp.arange(tk)[None, None, :] >= kv_lens[:, None, None]
    mask = jnp.broadcast_to(mask, (bh, tq, tk))
    out = flash_attention(q, k, v, kv_lens=kv_lens, scale=0.2,
                          tq=16, tk=16, interpret=True)
    ref = reference_attention(q, k, v, mask=mask, scale=0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_in_kernel_rel_bias_matches_rel_shift(rng):
    """The in-kernel compact-table rel-pos bias must reproduce the XLA
    path's (matrix_ac + rel_shift(matrix_bd)) * scale exactly — including
    the legacy rel_shift crossover for keys right of the query
    (liteasr/nets/attention.py:99-118 semantics)."""
    from liteasr_tpu.nets.attention import rel_shift

    bh, t, d = 2, 48, 32
    scale = d ** -0.5
    q_u = jnp.asarray(rng.normal(size=(bh, t, d)), jnp.float32)
    q_v = jnp.asarray(rng.normal(size=(bh, t, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(bh, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(bh, t, d)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(bh, t, d)), jnp.float32)
    kv_lens = jnp.array([t, t - 13], jnp.int32)

    # XLA reference: matrix_bd through the pad-reshape rel_shift
    bd = jnp.einsum("bqd,bkd->bqk", q_v, p)
    bd = rel_shift(bd[:, None])[:, 0]
    mask = jnp.broadcast_to(
        jnp.arange(t)[None, None, :] >= kv_lens[:, None, None], (bh, t, t))
    s = (jnp.einsum("bqd,bkd->bqk", q_u, k) + bd) * scale
    s = jnp.where(mask, -1e30, s)
    ref = jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(s, -1), v)

    out = flash_attention(q_u, k, v, kv_lens=kv_lens, rel_qv=q_v, rel_p=p,
                          scale=scale, tq=16, tk=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)
