"""Multi-chip decoding: the dp-sharded batched pipeline must return the
same hypotheses as an unsharded run, with padded dummy rows discarded
(VERDICT r1 next-round #5; capability match for the reference's decode
pool, liteasr/infer.py:63-94)."""

import jax
import jax.numpy as jnp
import numpy as np

from liteasr_tpu import decode
from liteasr_tpu.config.core import DotDict, _node_to_dict
from liteasr_tpu.models.u2 import U2, U2Config
from liteasr_tpu.parallel.mesh import batch_sharding, get_mesh


def _tiny_u2(vocab=12):
    cfg = DotDict(_node_to_dict(U2Config))
    cfg.update(dict(
        input_dim=8, vocab_size=vocab, enc_layers=1, dec_layers=1,
        enc_dim=16, enc_ff_dim=32, dec_dim=16, dec_ff_dim=32,
        enc_attn_heads=2, dec_attn_heads=2, dropout_rate=0.0))
    for k in list(cfg):
        if isinstance(cfg[k], str) and cfg[k].startswith("${"):
            cfg[k] = 0.0
    return U2.build_model(cfg, None)


def test_dp_sharded_decode_matches_unsharded():
    model = _tiny_u2()
    B, T = 3, 24
    rng = np.random.default_rng(0)
    xs = np.asarray(rng.normal(size=(B, T, 8)), np.float32)
    xlens = np.array([T, T - 6, T - 10], np.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(xs),
        jnp.asarray(xlens), jnp.ones((B, 4), jnp.int32),
        jnp.full((B,), 4, jnp.int32), train=False)

    plain = decode.decode_batch(
        model, variables, jnp.asarray(xs), jnp.asarray(xlens),
        beam_size=3, mode="attention_rescore")

    # pad rows to the 8-device dp degree and shard
    mesh = get_mesh(dp=8, tp=1, sp=1)
    rows = 8
    xs_p = np.zeros((rows, T, 8), np.float32)
    xs_p[:B] = xs
    xlens_p = np.full(rows, 7, np.int32)
    xlens_p[:B] = xlens
    sh = batch_sharding(mesh)
    hyps = decode.decode_batch(
        model, variables,
        jax.device_put(jnp.asarray(xs_p), sh),
        jax.device_put(jnp.asarray(xlens_p), sh),
        beam_size=3, mode="attention_rescore")

    assert hyps[:B] == plain
