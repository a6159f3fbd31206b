"""Tensor parallelism: dp x tp training must numerically match dp-only."""

import jax
import jax.numpy as jnp
import numpy as np

from liteasr_tpu.config import compose
from liteasr_tpu.train import train
from liteasr_tpu.parallel import mesh as mesh_lib


def _cfg(tiny_corpus, tmp_path, dp, tp, tag):
    return compose([
        "task=asr", "model=my_U2", "criterion=my_hybrid_ctc",
        "optimizer=my_noam",
        f"task.vocab={tiny_corpus / 'vocab.txt'}",
        f"task.train={tiny_corpus / 'train'}",
        f"task.valid={tiny_corpus / 'valid'}",
        f"task.save_dir={tmp_path / ('ckpts_' + tag)}",
        f"common.run_dir={tmp_path}",
        # transformer arch: no BatchNorm, so different batch paddings across
        # layouts cannot perturb running stats — runs stay bit-comparable
        "model.enc_arch=transformer",
        "model.enc_layers=1", "model.dec_layers=1",
        "model.enc_dim=32", "model.enc_ff_dim=64",
        "model.dec_dim=32", "model.dec_ff_dim=64",
        "model.enc_attn_heads=2", "model.dec_attn_heads=2",
        "model.dropout_rate=0.0",
        "dataset.batch_size=8", "dataset.pad_time_multiple=64",
        "dataset.pad_label_multiple=8",
        "optimization.max_epoch=1", "optimization.accum_grad=1",
        "optimization.clip_grad_norm=5.0",
        "optimizer.factor=0.1", "optimizer.model_dim=32",
        "postprocess.workflow=[]",  # keep runs bit-comparable
        f"distributed.dp={dp}", f"distributed.tp={tp}",
        "common.trigger=[]",
    ])


def test_param_specs_rules():
    from jax.sharding import PartitionSpec as P

    from liteasr_tpu.parallel.sharding import param_specs

    params = {
        "encoder": {
            "layer_0": {
                "feed_forward": {"fc1": {"kernel": np.zeros((8, 16)),
                                         "bias": np.zeros(16)},
                                 "fc2": {"kernel": np.zeros((16, 8)),
                                         "bias": np.zeros(8)}},
                "self_attn": {"linear_q": {"kernel": np.zeros((8, 8)),
                                           "bias": np.zeros(8)},
                              "linear_o": {"kernel": np.zeros((8, 8)),
                                           "bias": np.zeros(8)},
                              "pos_bias_u": np.zeros((2, 4))},
                "self_attn_norm": {"ln": {"scale": np.zeros(8),
                                          "bias": np.zeros(8)}},
            }
        }
    }
    specs = param_specs(params)
    enc = specs["encoder"]["layer_0"]
    assert enc["feed_forward"]["fc1"]["kernel"] == P(None, "tp")
    assert enc["feed_forward"]["fc1"]["bias"] == P("tp")
    assert enc["feed_forward"]["fc2"]["kernel"] == P("tp", None)
    assert enc["feed_forward"]["fc2"]["bias"] == P()
    assert enc["self_attn"]["linear_q"]["kernel"] == P(None, "tp")
    assert enc["self_attn"]["linear_o"]["kernel"] == P("tp", None)
    assert enc["self_attn"]["pos_bias_u"] == P("tp", None)
    assert enc["self_attn_norm"]["ln"]["scale"] == P()


def test_dp_tp_matches_dp_only(tiny_corpus, tmp_path):
    mesh_lib._MESH = None
    t1 = train(_cfg(tiny_corpus, tmp_path, dp=8, tp=1, tag="dp"))
    loss_dp = np.asarray(jax.device_get(t1._loss_accum)).mean()

    mesh_lib._MESH = None
    t2 = train(_cfg(tiny_corpus, tmp_path, dp=4, tp=2, tag="tp"))
    loss_tp = np.asarray(jax.device_get(t2._loss_accum)).mean()
    mesh_lib._MESH = None

    np.testing.assert_allclose(loss_dp, loss_tp, rtol=1e-4, atol=1e-4)

    # params after one epoch must match across layouts
    p1 = jax.device_get(t1.state.params)
    p2 = jax.device_get(t2.state.params)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_dp_sp_matches_dp_only(tiny_corpus, tmp_path):
    """Sequence parallelism (time-axis sharding) must match dp-only."""
    mesh_lib._MESH = None
    t1 = train(_cfg(tiny_corpus, tmp_path, dp=8, tp=1, tag="dp2"))
    loss_dp = np.asarray(jax.device_get(t1._loss_accum)).mean()

    mesh_lib._MESH = None
    cfg = _cfg(tiny_corpus, tmp_path, dp=4, tp=1, tag="sp")
    cfg.distributed.sp = 2
    t2 = train(cfg)
    loss_sp = np.asarray(jax.device_get(t2._loss_accum)).mean()
    mesh_lib._MESH = None

    np.testing.assert_allclose(loss_dp, loss_sp, rtol=1e-4, atol=1e-4)
    p1 = jax.device_get(t1.state.params)
    p2 = jax.device_get(t2.state.params)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
