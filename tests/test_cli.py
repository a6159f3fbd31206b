"""CLI smoke: the installed console surface via subprocess (argv parsing,
logging setup, config persistence)."""

import subprocess
import sys


def test_train_cli_subprocess(tiny_corpus, tmp_path):
    cmd = [
        sys.executable, "-m", "liteasr_tpu.train",
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
        "optimization.max_epoch=1",
        "postprocess.workflow=[]",
    ]
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", ""))
    # force CPU despite the sitecustomize plugin: strip the axon path
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env["PYTHONPATH"].split(os.pathsep) if "axon" not in p)
    # 420 s flaked when concurrent TPU-host processes loaded the single
    # core; the subprocess itself needs ~2 min unloaded
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         timeout=1200)
    assert out.returncode == 0, out.stderr[-2000:]
    assert (tmp_path / "train.log").exists()
    assert (tmp_path / "config.yaml").exists()
    assert list((tmp_path / "ckpts").glob("model.ep.*.msgpack"))
