"""Config engine: composition, interpolation, overrides."""

from liteasr_tpu.config import compose
from liteasr_tpu.config.core import resolve


def test_compose_groups_and_overrides():
    cfg = compose([
        "task=asr", "model=my_U2", "criterion=my_hybrid_ctc",
        "optimizer=my_noam", "task.vocab=/x/v.txt",
        "optimization.max_epoch=3", "model.enc_layers=2",
    ])
    assert cfg.model.name == "U2"
    assert cfg.model.enc_layers == 2
    assert cfg.criterion.ctc_weight == 0.3
    assert cfg.optimizer.warmup == 25000
    assert cfg.optimization.max_epoch == 3
    assert cfg.task.vocab == "/x/v.txt"


def test_interpolation_cascade():
    cfg = compose([
        "task=asr", "model=my_U2", "criterion=my_hybrid_ctc",
        "optimizer=my_noam", "task.vocab=/x/v.txt",
    ])
    # II("model.dropout_rate") cascade (reference u2.py:49-66)
    assert cfg.model.enc_dropout_rate == cfg.model.dropout_rate == 0.1
    assert cfg.model.dec_self_attn_dropout_rate == 0.1
    # inference.ckpt_path <- task.save_dir
    assert cfg.inference.ckpt_path == cfg.task.save_dir


def test_resolve_partial_string():
    tree = {"a": {"b": "run"}, "c": "${a.b}/train.log"}
    assert resolve(tree)["c"] == "run/train.log"


def test_registered_group_without_yaml():
    cfg = compose([
        "task=asr", "model=U2", "criterion=hybrid_ctc", "optimizer=adam",
        "task.vocab=/x/v.txt",
    ])
    assert cfg.model.enc_layers == 12
    assert cfg.optimizer.lr == 1e-3
