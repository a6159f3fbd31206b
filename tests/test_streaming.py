"""Streaming chunked attention: causality check — a frame's encoder output
must not depend on inputs beyond its chunk boundary."""

import jax
import jax.numpy as jnp
import numpy as np

from liteasr_tpu.config import compose
from liteasr_tpu import models


def test_chunked_encoder_is_causal_across_chunks():
    cfg = compose([
        "task=asr", "model=U2", "criterion=hybrid_ctc", "optimizer=adam",
        "task.vocab=/x/v.txt",
        "model.input_dim=16", "model.vocab_size=12",
        "model.enc_layers=2", "model.dec_layers=1",
        "model.enc_dim=32", "model.enc_ff_dim=64",
        "model.dec_dim=32", "model.dec_ff_dim=64",
        "model.enc_attn_heads=2", "model.dec_attn_heads=2",
        "model.enc_arch=transformer",
        "model.static_chunk_size=4",
    ])
    model = models.build_model(cfg.model, None)
    rng = np.random.default_rng(0)
    T = 128
    xs = jnp.asarray(rng.normal(size=(1, T, 16)), jnp.float32)
    xlens = jnp.array([T], jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, xs,
        xlens, jnp.ones((1, 4), jnp.int32), jnp.array([4]), train=False)

    h1, _ = model.apply(variables, xs, xlens, method=model.encode)

    # perturb the LAST quarter of the input; early chunks must be unchanged
    xs2 = xs.at[:, 3 * T // 4:, :].add(10.0)
    h2, _ = model.apply(variables, xs2, xlens, method=model.encode)

    t_sub = h1.shape[1]
    # frames whose chunk ends before the perturbation can possibly leak in
    # through the conv subsampling receptive field (~7 input frames); stay
    # well clear of the boundary
    safe = (3 * T // 4) // 4 - 4
    safe = (safe // 4) * 4  # snap to a chunk boundary
    diff = np.abs(np.asarray(h1 - h2))[0, :safe]
    assert diff.max() < 1e-4, diff.max()
    # and later frames DO change
    assert np.abs(np.asarray(h1 - h2))[0, -1].max() > 1e-3
