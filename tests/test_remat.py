"""Remat: identical forward values and gradients, just recomputed backward."""

import jax
import jax.numpy as jnp
import numpy as np

from liteasr_tpu import criterions, models
from liteasr_tpu.config import compose

BASE = [
    "task=asr", "criterion=hybrid_ctc", "optimizer=adam",
    "task.vocab=/x/v.txt",
    "model.input_dim=16", "model.vocab_size=12",
    "model.enc_arch=transformer",
    "model.enc_layers=2", "model.dec_layers=1",
    "model.enc_dim=32", "model.enc_ff_dim=64",
    "model.dec_dim=32", "model.dec_ff_dim=64",
    "model.enc_attn_heads=2", "model.dec_attn_heads=2",
    "model.dropout_rate=0.0", "criterion.vocab_size=12",
]


def test_remat_matches_plain():
    cfg_plain = compose(["model=U2", *BASE])
    cfg_remat = compose(["model=U2", *BASE, "model.remat=true"])
    plain = models.build_model(cfg_plain.model, None)
    remat = models.build_model(cfg_remat.model, None)

    rng = np.random.default_rng(0)
    B, T, U = 2, 64, 4
    xs = jnp.asarray(rng.normal(size=(B, T, 16)), jnp.float32)
    xlens = jnp.array([T, T - 20], jnp.int32)
    ys = jnp.asarray(rng.integers(1, 11, size=(B, U)), jnp.int32)
    ylens = jnp.array([U, U], jnp.int32)

    variables = plain.init(
        {"params": jax.random.PRNGKey(0)}, xs, xlens, ys, ylens, train=False)

    out_p = plain.apply(variables, xs, xlens, ys, ylens, train=False)
    out_r = remat.apply(variables, xs, xlens, ys, ylens, train=False)
    for a, b in zip(out_p, out_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    crit = criterions.build_criterion(cfg_plain.criterion, None)

    def grads(model):
        return jax.grad(lambda p: crit(
            model, {"params": p},
            {"xs": xs, "xlens": xlens, "ys": ys, "ylens": ylens,
             "valid": jnp.ones(B)},
            rngs={"dropout": jax.random.PRNGKey(1)}, train=True)[0])(
            variables["params"])

    g_p, g_r = grads(plain), grads(remat)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
