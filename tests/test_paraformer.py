"""Paraformer: CIF predictor semantics, two-pass forward, loss, decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteasr_tpu import criterions, models
from liteasr_tpu.config import compose


def test_cif_fires_expected_count():
    """With uniform alpha and beta = sum/U, CIF must fire exactly U times."""
    from liteasr_tpu.nets.paraformer import Predictor

    B, T, D, U = 2, 20, 8, 5
    pred = Predictor()
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    xlens = jnp.array([T, T - 4], jnp.int32)
    ylens = jnp.array([U, U - 2], jnp.int32)
    variables = pred.init(jax.random.PRNGKey(0), xs, xlens, ylens, u_max=U)
    h_cif, sum_alpha = pred.apply(variables, xs, xlens, ylens, u_max=U)
    assert h_cif.shape == (B, U, D)
    assert sum_alpha.shape == (B,)
    # every fired vector within ylens is non-zero; rows past ylens are zero
    norms = np.asarray(jnp.abs(h_cif).sum(axis=-1))
    assert (norms[0, :U] > 0).all()
    assert (norms[1, : U - 2] > 0).all()
    assert np.allclose(norms[1, U - 2:], 0.0)


@pytest.mark.parametrize("seed,B,T,D,U", [
    (0, 3, 40, 8, 7), (1, 2, 64, 16, 12), (2, 4, 25, 4, 25),
])
def test_cif_dense_matches_scan(seed, B, T, D, U):
    """Closed-form CIF (cumsum + cummin + matmul) vs the scan oracle:
    same integration AND same gradients w.r.t. alpha, xs, beta."""
    from liteasr_tpu.nets.paraformer import cif_dense, cif_scan

    rng = np.random.default_rng(seed)
    xs = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    alpha = jnp.asarray(rng.uniform(0.05, 0.95, size=(B, T)), jnp.float32)
    # mask a suffix like the predictor does
    xlens = jnp.asarray(rng.integers(T // 2, T + 1, size=B), jnp.int32)
    alpha = jnp.where(jnp.arange(T)[None, :] >= xlens[:, None], 0.0, alpha)
    ulens = jnp.asarray(rng.integers(1, U + 1, size=B), jnp.float32)
    beta = alpha.sum(axis=1) / ulens - 1e-4

    out_s = cif_scan(alpha, xs, beta, U)
    out_d = cif_dense(alpha, xs, beta, U)
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_s), rtol=2e-4, atol=2e-4)

    def loss_s(a, x, b):
        return (cif_scan(a, x, b, U) ** 2).sum()

    def loss_d(a, x, b):
        return (cif_dense(a, x, b, U) ** 2).sum()

    gs = jax.grad(loss_s, argnums=(0, 1, 2))(alpha, xs, beta)
    gd = jax.grad(loss_d, argnums=(0, 1, 2))(alpha, xs, beta)
    for a, b in zip(gs, gd):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-3)


def test_cif_dense_degenerate_beta():
    """beta <= 0 (all-zero alpha) must not produce NaN/inf."""
    from liteasr_tpu.nets.paraformer import cif_dense

    B, T, D, U = 2, 10, 4, 5
    alpha = jnp.zeros((B, T), jnp.float32)
    xs = jnp.ones((B, T, D), jnp.float32)
    beta = alpha.sum(axis=1) / 3.0 - 1e-4  # negative
    out = cif_dense(alpha, xs, beta, U)
    assert np.isfinite(np.asarray(out)).all()


@pytest.fixture(scope="module")
def tiny_paraformer():
    cfg = compose([
        "task=asr", "model=Paraformer", "criterion=paraformer_loss",
        "optimizer=my_adam", "task.vocab=/x/v.txt",
        "model.input_dim=16", "model.vocab_size=12",
        "model.enc_layers=1", "model.dec_layers=1",
        "model.enc_dim=32", "model.enc_ff_dim=64",
        "model.dec_dim=32", "model.dec_ff_dim=64",
        "model.enc_attn_heads=2", "model.dec_attn_heads=2",
        "criterion.vocab_size=12",
    ])
    model = models.build_model(cfg.model, None)
    B, T, U = 2, 32, 5
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(B, T, 16)), jnp.float32)
    xlens = jnp.array([T, T - 10], jnp.int32)
    ys = jnp.asarray(rng.integers(1, 11, size=(B, U)), jnp.int32)
    ys = ys.at[1, 3:].set(-1)
    ylens = jnp.array([U, 3], jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        xs, xlens, ys, ylens, train=False)
    crit = criterions.build_criterion(cfg.criterion, None)
    batch = {"xs": xs, "xlens": xlens, "ys": ys, "ylens": ylens,
             "valid": jnp.ones(B)}
    return model, variables, crit, batch


def test_glancing_schedule_and_honest_eval(tiny_paraformer):
    """sample_ratio schedule reaches its end value; glance_at_eval=False
    removes ground-truth mixing from the eval forward."""
    model, variables, crit, batch = tiny_paraformer
    sched = model.clone(sample_ratio=0.9, sample_ratio_end=0.0,
                        sample_ratio_decay_steps=100)
    r0 = sched._glance_ratio(True, jnp.asarray(0))
    r50 = sched._glance_ratio(True, jnp.asarray(50))
    r200 = sched._glance_ratio(True, jnp.asarray(200))
    assert float(r0) == pytest.approx(0.9)
    assert float(r50) == pytest.approx(0.45)
    assert float(r200) == pytest.approx(0.0)

    honest = model.clone(glance_at_eval=False)
    assert honest._glance_ratio(False, None) == 0.0
    assert model._glance_ratio(False, None) == pytest.approx(
        model.sample_ratio)

    # eval forwards: honest (ratio 0) differs from reference-parity mixing
    out_ref, _ = model.apply(
        variables, batch["xs"], batch["xlens"], batch["ys"],
        batch["ylens"], train=False)
    out_honest, _ = honest.apply(
        variables, batch["xs"], batch["xlens"], batch["ys"],
        batch["ylens"], train=False)
    assert not np.allclose(np.asarray(out_ref), np.asarray(out_honest))


def test_paraformer_forward_shapes(tiny_paraformer):
    model, variables, _, batch = tiny_paraformer
    hs_attn, sum_alpha = model.apply(
        variables, batch["xs"], batch["xlens"], batch["ys"], batch["ylens"],
        train=False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert hs_attn.shape == (2, 5, 12)
    assert sum_alpha.shape == (2,)


def test_paraformer_loss_and_grads(tiny_paraformer):
    model, variables, crit, batch = tiny_paraformer
    loss, aux = crit(model, variables, batch,
                     rngs={"dropout": jax.random.PRNGKey(1)}, train=True)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(aux["loss_ce"]))
    assert np.isfinite(float(aux["loss_mae"]))

    grads = jax.grad(lambda p: crit(
        model, {"params": p, **{k: v for k, v in variables.items()
                                if k != "params"}}, batch,
        rngs={"dropout": jax.random.PRNGKey(1)}, train=True)[0])(
        variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # the CIF alpha path must receive gradient (MAE term)
    pred_grads = jax.tree.leaves(grads["predictor"])
    assert any(np.abs(np.asarray(g)).max() > 0 for g in pred_grads)


def test_paraformer_decode(tiny_paraformer):
    model, variables, _, batch = tiny_paraformer
    hyp, ulens = model.apply(
        variables, batch["xs"], batch["xlens"], u_max=8, method=model.decode)
    assert hyp.shape == (2, 8)
    assert (np.asarray(ulens) <= 8).all()
