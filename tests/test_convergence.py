"""Learnability: overfit a tiny synthetic corpus, then decode it back.

This is the end-to-end correctness guard for the whole stack: data layer ->
conformer/transformer encoder -> hybrid loss -> optimizer -> compiled
decoders. With learnable features every decode mode reaches ~0% error
(verified 0/70 for all four modes at 300 epochs; the test uses fewer epochs
and a tolerant threshold to stay fast).
"""

import numpy as np
import pytest

from liteasr_tpu.config import compose
from liteasr_tpu.train import train


@pytest.fixture(scope="module")
def learnable_corpus(tmp_path_factory):
    from liteasr_tpu.data import kaldi_io

    root = tmp_path_factory.mktemp("learnable")
    rng = np.random.default_rng(42)
    tokens = ["<unk>"] + [chr(ord("a") + i) for i in range(26)]
    (root / "vocab.txt").write_text(
        "".join(f"{t} {i+1}\n" for i, t in enumerate(tokens)))
    d = root / "train"
    d.mkdir()
    mats, texts, frames = {}, [], []
    for i in range(16):
        u = f"u{i}"
        w = "".join(chr(ord("a") + int(c))
                    for c in rng.integers(0, 26, int(rng.integers(3, 7))))
        t = 16 * (len(w) + 2)
        feat = np.zeros((t, 16), np.float32)
        for j, ch in enumerate(w):
            k = ord(ch) - 97
            feat[16 * (j + 1):16 * (j + 2), :] = \
                np.eye(16)[k % 16][None, :] * 2.0
            feat[16 * (j + 1):16 * (j + 2), k // 16] += 3.0
        feat += rng.normal(size=feat.shape).astype(np.float32) * 0.05
        mats[u] = feat
        texts.append(f"{u} {w}")
        frames.append(f"{u} {t}")
    kaldi_io.save_ark(str(d / "feats.ark"), mats,
                      scp_path=str(d / "feats.scp"))
    (d / "utt2num_frames").write_text("\n".join(frames) + "\n")
    (d / "text").write_text("\n".join(texts) + "\n")
    return root


def test_overfit_and_decode(learnable_corpus, tmp_path):
    import jax.numpy as jnp

    from liteasr_tpu import decode
    from liteasr_tpu.utils.score import levenshtein

    cfg = compose([
        "task=asr", "model=my_U2", "criterion=my_hybrid_ctc",
        "optimizer=my_adam", "optimizer.lr=2e-3",
        f"task.vocab={learnable_corpus / 'vocab.txt'}",
        f"task.train={learnable_corpus / 'train'}",
        f"task.valid={learnable_corpus / 'train'}",
        f"task.save_dir={tmp_path / 'ckpts'}",
        f"common.run_dir={tmp_path}",
        "model.enc_arch=transformer", "model.enc_layers=2",
        "model.dec_layers=2", "model.enc_dim=64", "model.enc_ff_dim=128",
        "model.dec_dim=64", "model.dec_ff_dim=128",
        "model.enc_attn_heads=2", "model.dec_attn_heads=2",
        "model.dropout_rate=0.0",
        "dataset.batch_size=16", "dataset.pad_time_multiple=64",
        "dataset.pad_label_multiple=8",
        "optimization.max_epoch=250", "optimization.accum_grad=1",
        "optimization.clip_grad_norm=5.0",
        "postprocess.workflow=[]", "common.trigger=[]",
    ])
    trainer = train(cfg)

    task = trainer.task
    variables = {"params": trainer.state.params}
    if trainer.state.batch_stats:
        variables["batch_stats"] = trainer.state.batch_stats
    data = task.dataset("train").data

    for mode in ("ctc_greedy", "attention_rescore"):
        tot_err = tot_len = 0
        for lo in range(0, len(data), 8):
            chunk = data[lo:lo + 8]
            T = ((max(a.xlen for a in chunk) + 63) // 64) * 64
            xs = np.zeros((len(chunk), T, 16), np.float32)
            xl = np.zeros(len(chunk), np.int32)
            for i, a in enumerate(chunk):
                xs[i, : a.xlen] = a.x
                xl[i] = a.xlen
            hyps = decode.decode_batch(
                trainer.model, variables, jnp.asarray(xs), jnp.asarray(xl),
                beam_size=5, mode=mode)
            for a, h in zip(chunk, hyps):
                ref = "".join(task.vocab.convert(t) for t in a.tokenids)
                hyp = task.ids_to_text(h)
                tot_err += levenshtein(ref, hyp)
                tot_len += len(ref)
        err_rate = tot_err / max(tot_len, 1)
        assert err_rate <= 0.05, f"{mode}: {err_rate:.2%}"
