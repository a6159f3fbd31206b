"""ASR training directly from wav.scp with the on-device fbank front-end
(capability the reference does not have — it requires precomputed feats)."""

import numpy as np
import pytest

from liteasr_tpu.config import compose
from liteasr_tpu.train import train


@pytest.fixture(scope="module")
def wav_asr_corpus(tmp_path_factory):
    from liteasr_tpu.data import kaldi_io

    root = tmp_path_factory.mktemp("wav_asr")
    rng = np.random.default_rng(3)
    tokens = ["<unk>"] + [chr(ord("a") + i) for i in range(26)]
    (root / "vocab.txt").write_text(
        "".join(f"{t} {i+1}\n" for i, t in enumerate(tokens)))
    for split, n in (("train", 8), ("valid", 3)):
        d = root / split
        d.mkdir()
        scp, text = [], []
        for i in range(n):
            u = f"{split}{i}"
            length = int(rng.integers(3000, 6000))
            p = str(d / f"{u}.wav")
            kaldi_io.write_wav(
                p, (rng.normal(size=length) * 0.05).astype(np.float32))
            scp.append(f"{u} {p}")
            w = "".join(chr(ord("a") + int(c))
                        for c in rng.integers(0, 26, 4))
            text.append(f"{u} {w}")
        (d / "wav.scp").write_text("\n".join(scp) + "\n")
        (d / "text").write_text("\n".join(text) + "\n")
    return root


def test_wav_scp_training_with_fbank(wav_asr_corpus, tmp_path):
    cfg = compose([
        "task=asr", "model=my_U2", "criterion=my_hybrid_ctc",
        "optimizer=my_adam", "optimizer.lr=1e-3",
        f"task.vocab={wav_asr_corpus / 'vocab.txt'}",
        f"task.train={wav_asr_corpus / 'train'}",
        f"task.valid={wav_asr_corpus / 'valid'}",
        f"task.save_dir={tmp_path / 'ckpts'}",
        f"common.run_dir={tmp_path}",
        "model.enc_arch=transformer",
        "model.enc_layers=1", "model.dec_layers=1",
        "model.enc_dim=32", "model.enc_ff_dim=64",
        "model.dec_dim=32", "model.dec_ff_dim=64",
        "model.enc_attn_heads=2", "model.dec_attn_heads=2",
        "dataset.fbank=true", "dataset.num_mel_bins=20",
        "dataset.batch_size=8",
        "dataset.pad_time_multiple=2048",  # samples, not frames
        "dataset.pad_label_multiple=8",
        "dataset.max_len_in=8000", "dataset.max_len_out=16",
        "optimization.max_epoch=1", "optimization.accum_grad=1",
        "optimization.clip_grad_norm=5.0",
        "postprocess.workflow=[]",
    ])
    trainer = train(cfg)
    assert trainer.epoch == 1 and trainer.iter > 0
    assert trainer.task.feat_dim == 20
