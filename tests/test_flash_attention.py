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


def test_flash_train_value_and_grads_match_reference(rng):
    """flash_rel_attention_train forward (kernel) and backward must match
    direct differentiation of the XLA reference."""
    from liteasr_tpu.ops.flash_attention import (
        _ref_rel_attention, flash_rel_attention_train)

    bh, t, d = 4, 96, 32
    mk = lambda: jnp.asarray(rng.normal(size=(bh, t, d)), jnp.float32)
    q_u, qv, k, v, p = mk(), mk(), mk(), mk(), mk()
    kv_lens = jnp.array([t, t - 17, t - 40, 5], jnp.int32)
    scale = 1.0 / (d ** 0.5)

    def loss_flash(*args):
        out = flash_rel_attention_train(
            *args, kv_lens, jnp.zeros((), jnp.int32), scale, 0.0, True)
        return (out ** 2).sum()

    def loss_ref(*args):
        out = _ref_rel_attention(*args, kv_lens, scale)
        return (out ** 2).sum()

    v_flash, g_flash = jax.value_and_grad(
        loss_flash, argnums=(0, 1, 2, 3, 4))(q_u, qv, k, v, p)
    v_ref, g_ref = jax.value_and_grad(
        loss_ref, argnums=(0, 1, 2, 3, 4))(q_u, qv, k, v, p)

    np.testing.assert_allclose(float(v_flash), float(v_ref),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_flash_train_grads_multi_tile(rng):
    """Same, across tile boundaries (T > tile): exercises the k-loop
    dB scatter, the overlapping qv-tile grad merge, and padded tails."""
    from liteasr_tpu.ops.flash_attention import (
        _ref_rel_attention, flash_rel_attention_train)

    bh, t, d = 2, 200, 64
    mk = lambda: jnp.asarray(rng.normal(size=(bh, t, d)) * 0.5, jnp.float32)
    q_u, qv, k, v, p = mk(), mk(), mk(), mk(), mk()
    kv_lens = jnp.array([t, t - 61], jnp.int32)
    scale = 1.0 / (d ** 0.5)

    args = (q_u, qv, k, v, p)
    g_flash = jax.grad(lambda *a: (flash_rel_attention_train(
        *a, kv_lens, jnp.zeros((), jnp.int32), scale, 0.0, True) ** 2).sum(),
        argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(lambda *a: (_ref_rel_attention(
        *a, kv_lens, scale) ** 2).sum(), argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip("qu qv k v p".split(), g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_flash_train_dropout(rng):
    """In-kernel attention-prob dropout: deterministic under a fixed seed,
    drops ~rate of the prob mass, and the regenerated-mask backward agrees
    with numerical differentiation (the mask is value-independent, so
    finite differences are exact through it)."""
    from liteasr_tpu.ops.flash_attention import flash_rel_attention_train

    bh, t, d = 2, 48, 32
    mk = lambda: jnp.asarray(rng.normal(size=(bh, t, d)) * 0.5, jnp.float32)
    q_u, qv, k, v, p = mk(), mk(), mk(), mk(), mk()
    kv_lens = jnp.array([t, t - 9], jnp.int32)
    seed = jnp.asarray(123, jnp.int32)
    rate, scale = 0.3, 1.0 / (d ** 0.5)

    def fwd(*args):
        return flash_rel_attention_train(*args, kv_lens, seed, scale, rate,
                                         True)

    out1, out2 = fwd(q_u, qv, k, v, p), fwd(q_u, qv, k, v, p)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    # other seed -> other mask
    out3 = flash_rel_attention_train(q_u, qv, k, v, p, kv_lens,
                                     jnp.asarray(7, jnp.int32), scale, rate,
                                     True)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))

    # E[out] across many seeds approximates the no-dropout output
    outs = [flash_rel_attention_train(q_u, qv, k, v, p, kv_lens,
                                      jnp.asarray(s, jnp.int32), scale,
                                      rate, True) for s in range(40)]
    base = flash_rel_attention_train(q_u, qv, k, v, p, kv_lens, seed, scale,
                                     0.0, True)
    np.testing.assert_allclose(np.mean([np.asarray(o) for o in outs], 0),
                               np.asarray(base), rtol=0.35, atol=0.12)

    # exact check: rebuild the kernel's keep mask (t fits one tile, so
    # tile coords == global coords) and compare value + grads against an
    # XLA replica using that mask
    from liteasr_tpu.ops.flash_attention import (
        _dropout_keep, _ref_rel_attention, _rel_shift_xla, NEG_INF)

    keep = jnp.stack([
        _dropout_keep(t, t, b, 0, 0, seed, rate) for b in range(bh)])

    def ref_dropout(q_u, qv, k, v, p):
        s = jnp.einsum("bqd,bkd->bqk", q_u, k)
        s = (s + _rel_shift_xla(jnp.einsum("bqd,bkd->bqk", qv, p))) * scale
        j = jnp.arange(t)[None, None, :]
        s = jnp.where(j >= kv_lens[:, None, None], NEG_INF, s)
        a = jax.nn.softmax(s, axis=-1)
        a = jnp.where(keep, a, 0.0) / (1.0 - rate)
        return jnp.einsum("bqk,bkd->bqd", a, v)

    out_ref = ref_dropout(q_u, qv, k, v, p)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)

    g_flash = jax.grad(lambda *a: (fwd(*a) ** 2).sum(),
                       argnums=(0, 1, 2, 3, 4))(q_u, qv, k, v, p)
    g_ref = jax.grad(lambda *a: (ref_dropout(*a) ** 2).sum(),
                     argnums=(0, 1, 2, 3, 4))(q_u, qv, k, v, p)
    for name, a, b in zip("qu qv k v p".split(), g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_flash_train_grads_many_tiles(rng):
    """Five q-tiles (T=520, tq=128): the round-3 tiled backward must
    accumulate dk/dv/dp across grid steps and stitch the dqv crossover
    rows across every tile boundary, not just the 2-tile case above."""
    from liteasr_tpu.ops.flash_attention import (
        _ref_rel_attention, flash_rel_attention_train)

    bh, t, d = 1, 520, 64
    mk = lambda: jnp.asarray(rng.normal(size=(bh, t, d)) * 0.3, jnp.float32)
    q_u, qv, k, v, p = mk(), mk(), mk(), mk(), mk()
    kv_lens = jnp.array([t - 37], jnp.int32)
    scale = 1.0 / (d ** 0.5)

    args = (q_u, qv, k, v, p)
    g_flash = jax.grad(lambda *a: (flash_rel_attention_train(
        *a, kv_lens, jnp.zeros((), jnp.int32), scale, 0.0, True) ** 2).sum(),
        argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(lambda *a: (_ref_rel_attention(
        *a, kv_lens, scale) ** 2).sum(), argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip("qu qv k v p".split(), g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3, err_msg=name)


def test_flash_train_all_masked_row_is_nan_safe(rng):
    """kv_len == 0 (a fully-dummy batch row): output and every gradient for
    that row must be exactly 0, not NaN (lse == NEG_INF path in
    _safe_probs)."""
    from liteasr_tpu.ops.flash_attention import flash_rel_attention_train

    bh, t, d = 2, 24, 32
    mk = lambda: jnp.asarray(rng.normal(size=(bh, t, d)) * 0.5, jnp.float32)
    q_u, qv, k, v, p = mk(), mk(), mk(), mk(), mk()
    kv_lens = jnp.array([0, t - 3], jnp.int32)
    scale = 1.0 / (d ** 0.5)

    out, grads = jax.value_and_grad(
        lambda *a: (flash_rel_attention_train(
            *a, kv_lens, jnp.zeros((), jnp.int32), scale, 0.0, True) ** 2
        ).sum(), argnums=(0, 1, 2, 3, 4))(q_u, qv, k, v, p)
    assert np.isfinite(float(out))
    for g in grads:
        arr = np.asarray(g)
        assert np.isfinite(arr).all()
        np.testing.assert_array_equal(arr[0], 0.0)  # dead row contributes 0


def _rel_mha_with_flash_train(monkeypatch):
    """RelativeMultiHeadAttention with the train kernel force-enabled on CPU
    (availability monkeypatched, kernel re-routed to interpret mode)."""
    import liteasr_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "flash_train_available", lambda: True)
    orig = fa.flash_rel_attention_train
    monkeypatch.setattr(
        fa, "flash_rel_attention_train",
        lambda qu, qv, k, v, p, kv, seed, scale, rate, _i: orig(
            qu, qv, k, v, p, kv, seed, scale, rate, True))
    from liteasr_tpu.nets.attention import RelativeMultiHeadAttention

    return RelativeMultiHeadAttention(n_head=2, dropout_rate=0.0)


def test_flash_debug_mask_contract(rng, monkeypatch):
    """LITEASR_FLASH_DEBUG=1 asserts the suffix-contiguity CONTRACT of
    _flash_train's mask->kv_lens compression (ADVICE r2 #2): a suffix
    padding mask passes, a structured mask with a hole must raise."""
    monkeypatch.setenv("LITEASR_FLASH_DEBUG", "1")
    m = _rel_mha_with_flash_train(monkeypatch)

    B, T, D = 2, 24, 16
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(1, T, D)), jnp.float32)
    suffix = (jnp.arange(T)[None, None, None, :]
              >= jnp.array([T, T - 7])[:, None, None, None])
    params = m.init({"params": jax.random.PRNGKey(0)}, x, x, x, pos,
                    mask=suffix, train=True)
    np.asarray(m.apply(params, x, x, x, pos, mask=suffix, train=True))

    bad = suffix.at[1, 0, 0, 3].set(True)  # hole: True before valid keys
    with pytest.raises(Exception, match="suffix-contiguity|callback"):
        np.asarray(m.apply(params, x, x, x, pos, mask=bad, train=True))


def test_flash_debug_off_by_default(rng, monkeypatch):
    """Without the debug flag the structured mask is NOT checked (the cheap
    production path) — the gate lives in _use_flash_train shape policy."""
    monkeypatch.delenv("LITEASR_FLASH_DEBUG", raising=False)
    m = _rel_mha_with_flash_train(monkeypatch)

    B, T, D = 2, 24, 16
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(1, T, D)), jnp.float32)
    suffix = (jnp.arange(T)[None, None, None, :]
              >= jnp.array([T, T - 7])[:, None, None, None])
    params = m.init({"params": jax.random.PRNGKey(0)}, x, x, x, pos,
                    mask=suffix, train=True)
    np.asarray(m.apply(params, x, x, x, pos, mask=suffix, train=True))
