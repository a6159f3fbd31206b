"""AOT export roundtrip: serialized StableHLO decode/forward programs
reproduce the live pipelines exactly (TPU-native counterpart of the
reference's TorchScript hook, liteasr/models/__init__.py:34-39)."""

import jax
import jax.numpy as jnp
import numpy as np

from liteasr_tpu.config.core import DotDict, _node_to_dict
from liteasr_tpu.decode import _get_pipeline
from liteasr_tpu.export import export_decode, export_forward, load_exported
from liteasr_tpu.models.u2 import U2, U2Config


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


def _init(model, B, T, U):
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32)
    xlens = jnp.array([T, T - 11], jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, xs, xlens,
        jnp.ones((B, U), jnp.int32), jnp.full((B,), U, jnp.int32),
        train=False)
    return variables, xs, xlens


def test_export_decode_roundtrip():
    model = _tiny_u2()
    B, T = 2, 32
    variables, xs, xlens = _init(model, B, T, 4)

    blob = export_decode(model, variables, mode="attention_rescore",
                         beam_size=3, ctc_weight=0.5, batch=B, frames=T,
                         feat_dim=8)
    assert isinstance(blob, bytes) and len(blob) > 0

    live = _get_pipeline(model, "attention_rescore", 3, 0.5)
    want = live(variables, xs, xlens)
    got = load_exported(blob)(variables, xs, xlens)

    for w, g in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_export_forward_roundtrip():
    model = _tiny_u2()
    B, T, U = 2, 32, 4
    variables, xs, xlens = _init(model, B, T, U)
    ys = jnp.ones((B, U), jnp.int32)
    ylens = jnp.full((B,), U, jnp.int32)

    blob = export_forward(model, variables, batch=B, frames=T, feat_dim=8,
                          label_len=U)
    h_attn, h_ctc = model.apply(variables, xs, xlens, ys, ylens, train=False)
    g_attn, g_ctc = load_exported(blob)(variables, xs, xlens, ys, ylens)
    np.testing.assert_allclose(np.asarray(h_attn), np.asarray(g_attn),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_ctc), np.asarray(g_ctc),
                               rtol=1e-6, atol=1e-6)
