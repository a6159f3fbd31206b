"""KV-cached attention beam search == full-recompute beam search
(VERDICT r1 next-round #8; re-design of the reference step cache,
liteasr/nets/transformer_layer.py:40-47)."""

import jax
import jax.numpy as jnp
import numpy as np

from liteasr_tpu.decode import attention_beam_search
from liteasr_tpu.config.core import DotDict, _node_to_dict
from liteasr_tpu.models.u2 import U2, U2Config


def _tiny_u2(vocab=12, dec_layers=2):
    cfg = DotDict(_node_to_dict(U2Config))
    cfg.update(dict(
        input_dim=8, vocab_size=vocab, enc_layers=1, dec_layers=dec_layers,
        enc_dim=16, enc_ff_dim=32, dec_dim=16, dec_ff_dim=32,
        enc_attn_heads=2, dec_attn_heads=2, dropout_rate=0.0))
    for k in list(cfg):
        if isinstance(cfg[k], str) and cfg[k].startswith("${"):
            cfg[k] = 0.0
    return U2.build_model(cfg, None)


def test_cached_beam_search_matches_recompute():
    model = _tiny_u2()
    B, T = 2, 28
    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32)
    xlens = jnp.array([T, T - 9], jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, xs, xlens,
        jnp.ones((B, 4), jnp.int32), jnp.full((B,), 4, jnp.int32),
        train=False)

    h_enc, enc_mask = model.apply(variables, xs, xlens, method=model.encode)

    ref_hyp, ref_len = jax.jit(
        lambda v, h, m: attention_beam_search(
            model, v, h, m, beam_size=4, use_cache=False)
    )(variables, h_enc, enc_mask)
    new_hyp, new_len = jax.jit(
        lambda v, h, m: attention_beam_search(
            model, v, h, m, beam_size=4, use_cache=True)
    )(variables, h_enc, enc_mask)

    np.testing.assert_array_equal(np.asarray(ref_len), np.asarray(new_len))
    # tokens must agree within each hypothesis' valid length
    for b in range(B):
        n = int(ref_len[b])
        np.testing.assert_array_equal(
            np.asarray(ref_hyp)[b, :n], np.asarray(new_hyp)[b, :n])
