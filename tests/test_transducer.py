"""Transducer model: forward lattice, RNN-T criterion, greedy/beam decode,
one-epoch training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteasr_tpu import criterions, models
from liteasr_tpu.config import compose


@pytest.fixture(scope="module")
def tiny_transducer():
    cfg = compose([
        "task=asr", "model=my_transducer", "criterion=my_rnnt",
        "optimizer=my_adam", "task.vocab=/x/v.txt",
        "model.input_dim=16", "model.vocab_size=12",
        "model.enc_layers=1", "model.dec_layers=1",
        "model.enc_dim=32", "model.enc_ff_dim=64",
        "model.dec_dim=32", "model.dec_units=32", "model.joint_dim=32",
        "model.enc_attn_heads=2",
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
        {"params": jax.random.PRNGKey(0)}, xs, xlens, ys, ylens, train=False)
    crit = criterions.build_criterion(cfg.criterion, None)
    batch = {"xs": xs, "xlens": xlens, "ys": ys, "ylens": ylens,
             "valid": jnp.ones(B)}
    return model, variables, crit, batch


def test_lattice_shape(tiny_transducer):
    model, variables, _, batch = tiny_transducer
    logits = model.apply(variables, batch["xs"], batch["xlens"],
                         batch["ys"], batch["ylens"], train=False)
    B, T, U = 2, 32, 5
    T_sub = ((T - 1) // 2 - 1) // 2
    assert logits.shape == (B, T_sub, U + 1, 12)


def test_rnnt_criterion_loss_and_grads(tiny_transducer):
    model, variables, crit, batch = tiny_transducer
    loss, aux = crit(model, variables, batch,
                     rngs={"dropout": jax.random.PRNGKey(1)}, train=True)
    assert np.isfinite(float(loss))

    grads = jax.grad(lambda p: crit(
        model, {"params": p}, batch,
        rngs={"dropout": jax.random.PRNGKey(1)}, train=True)[0])(
        variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))


def test_transducer_greedy_decode(tiny_transducer):
    from liteasr_tpu.decode import transducer_greedy

    model, variables, _, batch = tiny_transducer
    hyps = transducer_greedy(model, variables, batch["xs"], batch["xlens"])
    assert len(hyps) == 2
    for hyp in hyps:
        assert all(0 < t < 12 for t in hyp)


def test_transducer_beam_decode(tiny_transducer):
    from liteasr_tpu.decode import transducer_beam_search_utt

    model, variables, _, batch = tiny_transducer
    hyp = transducer_beam_search_utt(
        model, variables, batch["xs"][0], beam_size=3)
    assert isinstance(hyp, list)
    assert all(0 < t < 12 for t in hyp)


def test_transducer_training_e2e(tiny_corpus, tmp_path):
    from liteasr_tpu.train import train

    cfg = compose([
        "task=asr", "model=my_transducer", "criterion=my_rnnt",
        "optimizer=my_adam", "optimizer.lr=1e-3",
        f"task.vocab={tiny_corpus / 'vocab.txt'}",
        f"task.train={tiny_corpus / 'train'}",
        f"task.valid={tiny_corpus / 'valid'}",
        f"task.save_dir={tmp_path / 'ckpts'}",
        f"common.run_dir={tmp_path}",
        "model.enc_layers=1", "model.dec_layers=1",
        "model.enc_dim=32", "model.enc_ff_dim=64",
        "model.dec_dim=32", "model.dec_units=32", "model.joint_dim=32",
        "model.enc_attn_heads=2",
        "dataset.batch_size=8", "dataset.pad_time_multiple=64",
        "dataset.pad_label_multiple=8",
        "optimization.max_epoch=1", "optimization.accum_grad=1",
        "optimization.clip_grad_norm=5.0",
    ])
    trainer = train(cfg)
    assert trainer.epoch == 1 and trainer.iter > 0


def test_forget_bias_ones(tiny_transducer):
    """post_init_params sets every LSTM forget-gate bias to 1 and nothing
    else (reference nets/initialization.py:50-55: the f quarter of bias_ih;
    flax's only LSTM bias lives on the h-side gates, so hf.bias = 1 is the
    equivalent edit)."""
    model, variables, _, _ = tiny_transducer
    params = model.post_init_params(variables["params"])
    n_cells = 0
    for name, sub in params["decoder"].items():
        if not name.startswith("rnn_"):
            continue
        n_cells += 1
        cell = sub["cell"]
        assert np.all(np.asarray(cell["hf"]["bias"]) == 1.0)
        for gate in ("hi", "hg", "ho"):
            assert np.all(np.asarray(cell[gate]["bias"]) == 0.0)
    assert n_cells == 1  # dec_layers=1 in the fixture
    # everything outside the LSTM biases is untouched
    same = jax.tree.map(np.array_equal, params["encoder"],
                        variables["params"]["encoder"])
    assert all(jax.tree.leaves(same))
