"""Dynamic chunk training: sampled chunk masks alter the train-time forward
without recompilation; eval stays full-context."""

import jax
import jax.numpy as jnp
import numpy as np

from liteasr_tpu import criterions, models
from liteasr_tpu.config import compose


def test_dynamic_chunk_train_forward():
    cfg = compose([
        "task=asr", "model=U2", "criterion=hybrid_ctc", "optimizer=adam",
        "task.vocab=/x/v.txt",
        "model.input_dim=16", "model.vocab_size=12",
        "model.enc_arch=transformer",
        "model.enc_layers=1", "model.dec_layers=1",
        "model.enc_dim=32", "model.enc_ff_dim=64",
        "model.dec_dim=32", "model.dec_ff_dim=64",
        "model.enc_attn_heads=2", "model.dec_attn_heads=2",
        "model.dynamic_chunk=true", "model.dropout_rate=0.0",
        "criterion.vocab_size=12",
    ])
    model = models.build_model(cfg.model, None)
    rng = np.random.default_rng(0)
    B, T, U = 2, 128, 5
    xs = jnp.asarray(rng.normal(size=(B, T, 16)), jnp.float32)
    xlens = jnp.array([T, T - 30], jnp.int32)
    ys = jnp.asarray(rng.integers(1, 11, size=(B, U)), jnp.int32)
    ylens = jnp.array([U, U], jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, xs, xlens, ys, ylens, train=False)

    def fwd(chunk_seed):
        h, _ = model.apply(
            variables, xs, xlens, ys, ylens, train=True,
            rngs={"dropout": jax.random.PRNGKey(1),
                  "chunk": jax.random.PRNGKey(chunk_seed)})
        return h

    # seed 0: full-context branch or chunked — find two seeds that differ
    outs = [np.asarray(fwd(s)) for s in range(4)]
    assert any(np.abs(outs[0] - o).max() > 1e-6 for o in outs[1:]), \
        "chunk sampling never changed the forward"
    # all finite
    for o in outs:
        assert np.isfinite(o).all()

    # eval forward ignores dynamic chunking entirely
    e1, _ = model.apply(variables, xs, xlens, ys, ylens, train=False)
    e2, _ = model.apply(variables, xs, xlens, ys, ylens, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    crit = criterions.build_criterion(cfg.criterion, None)
    batch = {"xs": xs, "xlens": xlens, "ys": ys, "ylens": ylens,
             "valid": jnp.ones(B)}
    loss, _ = crit(model, variables, batch,
                   rngs={"dropout": jax.random.PRNGKey(1),
                         "chunk": jax.random.PRNGKey(2)}, train=True)
    assert np.isfinite(float(loss))
