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


def test_export_cli(tiny_corpus, tmp_path):
    """python -m liteasr_tpu.export --config-dir <run>: builds the model
    from the persisted run config (probing input_dim from the test set like
    liteasr-infer), loads the checkpoint, writes artifact + manifest."""
    import json
    import os

    import flax.serialization as fser
    import numpy as np

    from liteasr_tpu.config import compose
    from liteasr_tpu.config.core import to_yaml
    from liteasr_tpu.export import load_exported, main as export_main

    cfg = compose([
        "task=asr", "model=my_U2", "criterion=my_hybrid_ctc",
        "optimizer=my_noam",
        f"task.vocab={tiny_corpus / 'vocab.txt'}",
        f"task.train={tiny_corpus / 'train'}",
        f"task.valid={tiny_corpus / 'valid'}",
        f"task.test=[{tiny_corpus / 'test'}]",
        f"task.save_dir={tmp_path / 'ckpts'}",
        f"common.run_dir={tmp_path}",
        "model.enc_layers=1", "model.dec_layers=1", "model.enc_dim=32",
        "model.enc_ff_dim=64", "model.dec_dim=32", "model.dec_ff_dim=64",
        "model.enc_attn_heads=2", "model.dec_attn_heads=2",
    ])
    (tmp_path / "config.yaml").write_text(to_yaml(cfg))

    # a checkpoint without training: init params at the corpus feat dim
    import jax
    import jax.numpy as jnp

    from liteasr_tpu import tasks

    task = tasks.setup_task(cfg.task)
    task.load_dataset("test", list(task.cfg.test), cfg.dataset, None)
    mcfg = dict(cfg.model)
    mcfg["input_dim"] = task.feat_dim
    model = task.build_model(mcfg)
    B, T, U = 2, 64, 6
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((B, T, task.feat_dim), jnp.float32),
        jnp.full((B,), T, jnp.int32), jnp.ones((B, U), jnp.int32),
        jnp.full((B,), U, jnp.int32), train=False)
    os.makedirs(tmp_path / "ckpts", exist_ok=True)
    with open(tmp_path / "ckpts" / "model.ep.1.msgpack", "wb") as f:
        f.write(fser.to_bytes(variables))

    out = export_main([
        "--config-dir", str(tmp_path),
        "inference.ckpt_name=1", "inference.model_avg=false",
        "export.mode=ctc_greedy", "export.batch=2", "export.frames=64",
        f"export.out={tmp_path / 'a.shlo'}"])
    assert os.path.getsize(out) > 1000
    manifest = json.loads(open(out + ".json").read())
    assert manifest["mode"] == "ctc_greedy"

    run = load_exported(open(out, "rb").read())
    xs = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 64, task.feat_dim)), jnp.float32)
    hyps = run(variables, xs, jnp.asarray([64, 50], jnp.int32))
    assert jax.tree.leaves(hyps)[0].shape[0] == 2
