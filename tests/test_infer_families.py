"""infer CLI end-to-end for the transducer and paraformer families
(exercises the per-family decode dispatch)."""

import pytest

from liteasr_tpu.config import compose
from liteasr_tpu.train import train


def _train_one(tiny_corpus, tmp_path, model_overrides):
    cfg = compose([
        *model_overrides,
        f"task.vocab={tiny_corpus / 'vocab.txt'}",
        f"task.train={tiny_corpus / 'train'}",
        f"task.valid={tiny_corpus / 'valid'}",
        f"task.test=[{tiny_corpus / 'test'}]",
        f"task.save_dir={tmp_path / 'ckpts'}",
        f"common.run_dir={tmp_path}",
        "dataset.batch_size=8", "dataset.pad_time_multiple=64",
        "dataset.pad_label_multiple=8",
        "optimization.max_epoch=1", "optimization.accum_grad=1",
        "optimization.clip_grad_norm=5.0",
        "postprocess.workflow=[]",
    ])
    from liteasr_tpu.train import setup_logging

    setup_logging(str(tmp_path))
    train(cfg)


def _infer(tmp_path, extra=()):
    from liteasr_tpu.infer import main as infer_main

    results = infer_main([
        "--config-dir", str(tmp_path),
        "inference.ckpt_name=1", "inference.model_avg=false",
        "inference.batch_size=4", "inference.beam_size=3", *extra,
    ])
    assert len(results) == 1
    err, length = results[0]
    assert length > 0


@pytest.mark.parametrize("overrides", [
    pytest.param([
        "task=asr", "model=my_transducer", "criterion=my_rnnt",
        "optimizer=my_adam", "optimizer.lr=1e-3",
        "model.enc_layers=1", "model.dec_layers=1",
        "model.enc_dim=32", "model.enc_ff_dim=64",
        "model.dec_dim=32", "model.dec_units=32", "model.joint_dim=32",
        "model.enc_attn_heads=2",
    ], id="transducer"),
    pytest.param([
        "task=asr", "model=Paraformer", "criterion=paraformer_loss",
        "optimizer=my_adam", "optimizer.lr=1e-3",
        "model.enc_layers=1", "model.dec_layers=1",
        "model.enc_dim=32", "model.enc_ff_dim=64",
        "model.dec_dim=32", "model.dec_ff_dim=64",
        "model.enc_attn_heads=2", "model.dec_attn_heads=2",
    ], id="paraformer"),
])
def test_infer_family(tiny_corpus, tmp_path, overrides):
    _train_one(tiny_corpus, tmp_path, overrides)
    _infer(tmp_path)
