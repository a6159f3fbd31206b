"""Mid-training resume: params/optimizer/counters restored, training continues."""

import jax
import numpy as np

from liteasr_tpu.config import compose
from liteasr_tpu.train import train


def _cfg(tiny_corpus, tmp_path, extra=()):
    return compose([
        "task=asr", "model=my_U2", "criterion=my_hybrid_ctc",
        "optimizer=my_noam",
        f"task.vocab={tiny_corpus / 'vocab.txt'}",
        f"task.train={tiny_corpus / 'train'}",
        f"task.valid={tiny_corpus / 'valid'}",
        f"task.save_dir={tmp_path / 'ckpts'}",
        f"common.run_dir={tmp_path}",
        "model.enc_arch=transformer",
        "model.enc_layers=1", "model.dec_layers=1",
        "model.enc_dim=32", "model.enc_ff_dim=64",
        "model.dec_dim=32", "model.dec_ff_dim=64",
        "model.enc_attn_heads=2", "model.dec_attn_heads=2",
        "dataset.batch_size=8", "dataset.pad_time_multiple=64",
        "dataset.pad_label_multiple=8",
        "optimization.accum_grad=1", "optimization.clip_grad_norm=5.0",
        "optimizer.factor=0.1", "optimizer.model_dim=32",
        "postprocess.workflow=[]",
        *extra,
    ])


def test_resume_continues_counters_and_params(tiny_corpus, tmp_path):
    t1 = train(_cfg(tiny_corpus, tmp_path,
                    extra=["optimization.max_epoch=1"]))
    assert (tmp_path / "ckpts" / "train_state.msgpack").exists()
    iter1 = t1.iter
    p1 = jax.device_get(t1.state.params)

    t2 = train(_cfg(tiny_corpus, tmp_path, extra=[
        "optimization.max_epoch=2", "common.resume=auto"]))
    # resumed from epoch 1, trained one more epoch
    assert t2.epoch == 2
    assert t2.iter > iter1
    p2 = jax.device_get(t2.state.params)
    diffs = [np.abs(a - b).max()
             for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2))]
    assert max(diffs) > 0  # training actually continued
