"""Post-LN (normalize_before=False) toggle: reference
liteasr/nets/transformer_layer.py:17, conformer_layer.py:19."""

import jax
import jax.numpy as jnp
import numpy as np

from liteasr_tpu.config.core import DotDict, _node_to_dict
from liteasr_tpu.models.u2 import U2, U2Config


def _build(normalize_before: bool):
    cfg = DotDict(_node_to_dict(U2Config))
    cfg.update(dict(
        input_dim=8, vocab_size=16, enc_layers=1, dec_layers=1,
        enc_dim=16, enc_ff_dim=32, dec_dim=16, dec_ff_dim=32,
        enc_attn_heads=2, dec_attn_heads=2, dropout_rate=0.0,
        normalize_before=normalize_before,
    ))
    for k in list(cfg):
        if isinstance(cfg[k], str) and cfg[k].startswith("${"):
            cfg[k] = 0.0
    return U2.build_model(cfg, None)


def test_post_ln_builds_and_differs_from_pre_ln():
    pre = _build(True)
    post = _build(False)
    B, T, U = 2, 23, 5
    xs = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, 8)),
                     jnp.float32)
    xlens = jnp.array([T, T - 4], jnp.int32)
    ys = jnp.ones((B, U), jnp.int32)
    ylens = jnp.array([U, U - 2], jnp.int32)

    variables = pre.init({"params": jax.random.PRNGKey(0)},
                         xs, xlens, ys, ylens, train=False)
    h_pre, c_pre = pre.apply(variables, xs, xlens, ys, ylens, train=False)
    # identical param tree => the post-LN model runs on the same variables
    h_post, c_post = post.apply(variables, xs, xlens, ys, ylens, train=False)

    assert np.isfinite(np.asarray(h_post)).all()
    assert np.isfinite(np.asarray(c_post)).all()
    assert not np.allclose(np.asarray(h_pre), np.asarray(h_post))


def test_post_ln_trains_finite():
    import optax

    model = _build(False)
    B, T, U = 2, 23, 5
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32)
    xlens = jnp.array([T, T], jnp.int32)
    ys = jnp.asarray(rng.integers(1, 14, size=(B, U)), jnp.int32)
    ylens = jnp.array([U, U], jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           xs, xlens, ys, ylens, train=False)

    def loss_fn(params):
        vs = dict(variables)
        vs["params"] = params
        (h_attn, h_ctc), _ = model.apply(
            vs, xs, xlens, ys, ylens, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        return jnp.mean(h_attn ** 2) + jnp.mean(h_ctc ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = optax.global_norm(grads)
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0
