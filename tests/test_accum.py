"""accumulate_every_k == optax.MultiSteps on the same gradient stream
(the lax.cond accumulator must not change training semantics, only cost)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from liteasr_tpu.trainer import accumulate_every_k


def _inner():
    return optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-2)),
        max_consecutive_errors=10 ** 8)


def _params():
    return {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3) / 10,
            "b": jnp.ones((3,), jnp.float32)}


def _grad_stream(n, nan_at=()):
    rng = np.random.default_rng(0)
    grads = []
    for i in range(n):
        g = {"w": jnp.asarray(rng.normal(size=(2, 3)), jnp.float32),
             "b": jnp.asarray(rng.normal(size=(3,)), jnp.float32)}
        if i in nan_at:
            g = jax.tree.map(lambda x: x * jnp.nan, g)
        grads.append(g)
    return grads


def _run(tx, grads):
    params = _params()
    state = tx.init(params)
    step = jax.jit(lambda g, s, p: tx.update(g, s, p))
    for g in grads:
        updates, state = step(g, state, params)
        params = optax.apply_updates(params, updates)
    return params


def test_matches_multisteps():
    k = 3
    grads = _grad_stream(12)
    ref = _run(optax.MultiSteps(_inner(), every_k_schedule=k), grads)
    got = _run(accumulate_every_k(_inner(), k), grads)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_nan_window_is_skipped():
    """A NaN micro-batch poisons its window; apply_if_finite holds params,
    and the next clean window still applies."""
    k = 2
    grads = _grad_stream(6, nan_at=(2,))  # poisons window [2, 3]
    clean = _grad_stream(6)

    tx = accumulate_every_k(_inner(), k)
    got = _run(tx, grads)
    # same stream with the poisoned window removed entirely
    ref = _run(tx, clean[:2] + clean[4:])
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(got))


def test_hold_step_emits_zero_updates():
    k = 2
    tx = accumulate_every_k(_inner(), k)
    params = _params()
    state = tx.init(params)
    updates, state = tx.update(_grad_stream(1)[0], state, params)
    assert all(float(jnp.abs(u).max()) == 0.0
               for u in jax.tree.leaves(updates))
    assert int(state.mini_step) == 1


def test_flat_optimizer_matches_tree():
    """build_tx(flat=True) must produce the same trajectory as the per-leaf
    tree path (optax.flatten only changes kernel granularity)."""
    from liteasr_tpu.config.core import DotDict
    from liteasr_tpu.optims import build_optimizer
    from liteasr_tpu.trainer import build_tx

    opt_cfg = DotDict(name="noam", lr=1e-3, beta1=0.9, beta2=0.98, eps=1e-9,
                      weight_decay=0.0, amsgrad=False, model_dim=16,
                      factor=1.0, warmup=10)
    o_cfg = DotDict(accum_grad=2, clip_grad_norm=5.0)
    grads = _grad_stream(6)

    ref = _run(build_tx(build_optimizer(opt_cfg, None), o_cfg), grads)
    got = _run(build_tx(build_optimizer(opt_cfg, None), o_cfg, flat=True),
               grads)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
