"""wav2vec 2.0: forward, contrastive loss, gradients, pretrain task e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteasr_tpu import criterions, models
from liteasr_tpu.config import compose

SMALL = [
    "model.encoder_layers=1", "model.encoder_embed_dim=32",
    "model.encoder_ffn_embed_dim=64", "model.encoder_attention_heads=2",
    "model.conv_feature_layers=[(32, 10, 5), (32, 8, 4), (32, 4, 2)]",
    "model.latent_vars=8", "model.latent_groups=2",
    "model.num_negatives=4", "model.mask_length=3", "model.mask_prob=0.5",
    "model.conv_pos=4", "model.conv_pos_groups=2",
]


@pytest.fixture(scope="module")
def tiny_w2v():
    cfg = compose([
        "task=pretrain", "model=wav2vec2", "criterion=wav2vec",
        "optimizer=my_adam", "task.train=/x", "task.valid=/x",
        *SMALL,
    ])
    model = models.build_model(cfg.model, None)
    rng = np.random.default_rng(0)
    B, T = 2, 2000
    xs = jnp.asarray(rng.normal(size=(B, T)) * 0.1, jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, xs, train=False)
    crit = criterions.build_criterion(cfg.criterion, None)
    batch = {"xs": xs, "valid": jnp.ones(B)}
    return model, variables, crit, batch


def test_w2v_forward_shapes(tiny_w2v):
    model, variables, _, batch = tiny_w2v
    logits, mask = model.apply(
        variables, batch["xs"], train=False)
    N1, B, F = logits.shape
    assert N1 == 5  # num_negatives + 1
    assert B == 2
    assert mask.shape == (B, F)
    assert bool(mask.any())


def test_w2v_loss_and_grads(tiny_w2v):
    model, variables, crit, batch = tiny_w2v
    rngs = {k: jax.random.PRNGKey(i)
            for i, k in enumerate(("dropout", "mask", "negatives", "gumbel"))}
    loss, aux = crit(model, variables, batch, rngs=rngs, train=True)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(aux["accuracy"]) <= 1.0

    grads = jax.grad(lambda p: crit(
        model, {"params": p}, batch, rngs=rngs, train=True)[0])(
        variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    # the quantizer codebook must receive gradient through the ST estimator
    q = jax.tree.leaves(grads["quantizer"])
    assert any(np.abs(np.asarray(g)).max() > 0 for g in q)


@pytest.fixture(scope="session")
def wav_corpus(tmp_path_factory):
    from liteasr_tpu.data import kaldi_io

    root = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(7)
    for split, n in (("train", 6), ("valid", 2)):
        d = root / split
        d.mkdir()
        lines = []
        for i in range(n):
            length = int(rng.integers(1800, 2600))
            p = str(d / f"u{i}.wav")
            kaldi_io.write_wav(
                p, (rng.normal(size=length) * 0.05).astype(np.float32))
            lines.append(f"{split}u{i} {p}")
        (d / "wav.scp").write_text("\n".join(lines) + "\n")
    return root


def test_pretrain_e2e(wav_corpus, tmp_path):
    from liteasr_tpu.train import train

    cfg = compose([
        "task=pretrain", "model=wav2vec2", "criterion=wav2vec",
        "optimizer=my_adam", "optimizer.lr=1e-4",
        f"task.train={wav_corpus / 'train'}",
        f"task.valid={wav_corpus / 'valid'}",
        f"task.save_dir={tmp_path / 'ckpts'}",
        f"common.run_dir={tmp_path}",
        "optimization.max_epoch=1", "optimization.accum_grad=1",
        "optimization.clip_grad_norm=5.0",
        *SMALL,
    ])
    trainer = train(cfg)
    assert trainer.epoch == 1 and trainer.iter > 0
