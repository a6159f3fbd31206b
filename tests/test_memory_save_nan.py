"""memory_save batch dumping, compressed-matrix read, NaN-skip optimizer."""

import struct

import jax.numpy as jnp
import numpy as np
import optax

from liteasr_tpu.config.core import DotDict
from liteasr_tpu.data import kaldi_io
from liteasr_tpu.data.dataset import AudioFileDataset
from liteasr_tpu.data.vocab import Vocab
from liteasr_tpu.optims import build_optimizer
from liteasr_tpu.trainer import build_tx


def test_memory_save_roundtrip(tiny_corpus):
    """Prior pass dumps batches as hex shards; a later pass lazily loads them
    (reference asr_dataset.py:79-95,139-142)."""
    vocab = Vocab(str(tiny_corpus / "vocab.txt"))
    cfg = DotDict(batch_count="seq", batch_size=4, min_batch_size=1,
                  max_len_in=800, max_len_out=150,
                  pad_time_multiple=16, pad_label_multiple=4)

    # prior process: builds + dumps
    ds_prior = AudioFileDataset(
        split="train", data_dir=str(tiny_corpus / "train"), delimiter=None,
        dataset_cfg=cfg, postprocess_cfg=None, vocab=vocab,
        memory_save=True)
    assert (tiny_corpus / "train" / ".dump").is_dir()
    n_batches = len(ds_prior)
    assert n_batches > 0

    # other process: loads lazily from the dump
    ds_other = AudioFileDataset(
        split="train", data_dir=str(tiny_corpus / "train"), delimiter=None,
        dataset_cfg=cfg, postprocess_cfg=None, vocab=vocab,
        memory_save=True)
    assert len(ds_other) == n_batches
    batch = ds_other[0]
    assert isinstance(batch, list) and batch[0].xlen > 0
    collated = ds_other.collator(batch)
    assert collated["xs"].shape[0] >= len(batch)

    import shutil

    shutil.rmtree(tiny_corpus / "train" / ".dump")


def test_compressed_matrix_read(tmp_path):
    """Construct a Kaldi 'CM' (format 1) entry per spec and decode it."""
    rows, cols = 12, 5
    rng = np.random.default_rng(0)
    mat = rng.normal(size=(rows, cols)).astype(np.float32)

    min_value = float(mat.min())
    value_range = float(mat.max() - mat.min()) or 1.0

    def to_u16(v):
        return np.clip((v - min_value) / value_range * 65535, 0, 65535
                       ).astype("<u2")

    headers = []
    data_cols = []
    for c in range(cols):
        col = np.sort(mat[:, c])
        p0, p25, p75, p100 = (col[0], col[rows // 4], col[(3 * rows) // 4],
                              col[-1])
        # ensure strict ordering for invertibility
        p25 = max(p25, p0 + 1e-5)
        p75 = max(p75, p25 + 1e-5)
        p100 = max(p100, p75 + 1e-5)
        headers.append(to_u16(np.array([p0, p25, p75, p100])))
        d = np.empty(rows, np.uint8)
        for r in range(rows):
            v = mat[r, c]
            if v <= p25:
                d[r] = np.clip((v - p0) / (p25 - p0) * 64, 0, 64)
            elif v <= p75:
                d[r] = np.clip(64 + (v - p25) / (p75 - p25) * 128, 64, 192)
            else:
                d[r] = np.clip(192 + (v - p75) / (p100 - p75) * 63, 192, 255)
        data_cols.append(d)

    path = tmp_path / "cm.ark"
    with open(path, "wb") as f:
        f.write(b"utt1 \x00BCM ")
        f.write(struct.pack("<ffii", min_value, value_range, rows, cols))
        for h in headers:
            f.write(np.asarray(h).tobytes())
        for d in data_cols:
            f.write(d.tobytes())

    out = dict(kaldi_io.load_ark(str(path)))["utt1"]
    assert out.shape == (rows, cols)
    # 8-bit quantization: coarse but monotone reconstruction
    np.testing.assert_allclose(out, mat, atol=0.15 * value_range)


def test_nan_grads_skip_update():
    """apply_if_finite inside the accumulating tx must skip non-finite steps
    (reference NaN-skip, trainer.py:152-169)."""
    optimizer = build_optimizer(
        DotDict(name="adam", lr=0.1, beta1=0.9, beta2=0.999, eps=1e-8,
                weight_decay=0.0, amsgrad=False), None)
    tx = build_tx(optimizer, DotDict(accum_grad=1, clip_grad_norm=1.0))
    params = {"w": jnp.ones(3)}
    state = tx.init(params)

    bad = {"w": jnp.array([jnp.nan, 1.0, 1.0])}
    updates, state = tx.update(bad, state, params)
    new_params = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(new_params["w"]),
                                  np.asarray(params["w"]))

    good = {"w": jnp.ones(3)}
    updates, state = tx.update(good, state, params)
    new_params = optax.apply_updates(params, updates)
    assert np.abs(np.asarray(new_params["w"]) - 1.0).max() > 0


def test_ckpt_avg_ignores_train_state_files(tmp_path):
    """Averaging must only consider model.ep.*.msgpack, not the train_state
    files that now live in the same save_dir."""
    import time

    import jax.numpy as jnp

    from liteasr_tpu import checkpoint

    for ep, val in ((1, 1.0), (2, 3.0)):
        checkpoint.save_params(
            str(tmp_path / f"model.ep.{ep}.msgpack"),
            {"params": {"w": jnp.full((2,), val)}})
        time.sleep(0.01)
    # interloper files with newer mtimes
    (tmp_path / "train_state.msgpack").write_bytes(b"xx")
    (tmp_path / "train_state.msgpack.meta").write_text("{}")

    cfg = DotDict(ckpt_path=str(tmp_path), ckpt_name=2, model_avg=True,
                  avg_num=2, avg_policy=None)
    avg = checkpoint.load_ckpt(cfg)
    np.testing.assert_allclose(np.asarray(avg["params"]["w"]), [2.0, 2.0])


def test_avg_spread_guard(tmp_path, caplog):
    """N-best averaging warns when the selected checkpoints' valid losses
    oscillate (averaging across basins can score worse than the single
    best — the Paraformer 10-best regression, BENCHMARKS.md)."""
    import logging

    from liteasr_tpu import checkpoint

    # unit: tight set is quiet, oscillating set trips
    assert not checkpoint.check_avg_spread([1.00, 1.02, 0.99])
    assert checkpoint.check_avg_spread([1.0, 2.5, 1.1])
    assert not checkpoint.check_avg_spread([float("nan"), 1.0])  # degenerate

    # integration: load_ckpt with an N-best policy over an oscillating log
    for ep, val in ((1, 1.0), (2, 2.0), (3, 3.0)):
        checkpoint.save_params(
            str(tmp_path / f"model.ep.{ep}.msgpack"),
            {"params": {"w": jnp.full((2,), val)}})
    log = tmp_path / "train.log"
    log.write_text("".join(f"... valid loss: {v}\n" for v in (0.5, 2.0, 0.6)))
    caplog.clear()  # the unit-level trip above already logged once
    cfg = DotDict(ckpt_path=str(tmp_path), ckpt_name=3, model_avg=True,
                  avg_num=2, avg_policy=str(log))
    with caplog.at_level(logging.WARNING, logger="liteasr_tpu.checkpoint"):
        avg = checkpoint.load_ckpt(cfg)
    # picks epochs 1 (0.5) and 3 (0.6): tight pair -> NO warning
    np.testing.assert_allclose(np.asarray(avg["params"]["w"]), [2.0, 2.0])
    assert not any("oscillating" in r.message for r in caplog.records)

    cfg = DotDict(ckpt_path=str(tmp_path), ckpt_name=3, model_avg=True,
                  avg_num=3, avg_policy=str(log))
    with caplog.at_level(logging.WARNING, logger="liteasr_tpu.checkpoint"):
        checkpoint.load_ckpt(cfg)
    assert any("oscillating" in r.message for r in caplog.records)


def test_nbest_aligns_by_epoch_when_save_interval_coarser(tmp_path):
    """N-best selection must key valid losses by the epoch in each
    checkpoint's filename, not by list position: with save_model every 4
    epochs and valid every epoch, the positional zip scored model.ep.8 with
    epoch 2's loss and averaged wildly distant checkpoints (the round-3
    Paraformer 97.6% decode regression — the model itself decoded at 1.3%)."""
    from liteasr_tpu import checkpoint

    # saves at epochs 4, 8, 12; valid after every epoch 1..12, with the
    # loss IMPROVING monotonically (later epochs are better)
    for ep, val in ((4, 4.0), (8, 8.0), (12, 12.0)):
        checkpoint.save_params(
            str(tmp_path / f"model.ep.{ep}.msgpack"),
            {"params": {"w": jnp.full((2,), val)}})
    log = tmp_path / "train.log"
    log.write_text("".join(
        f"[ts][INFO][liteasr_tpu.trainer:476][valid] - {ep * 100} / inf "
        f"iters, {ep} / 12 epochs - valid loss: {13.0 - ep:.2f}\n"
        for ep in range(1, 13)))

    cfg = DotDict(ckpt_path=str(tmp_path), ckpt_name=12, model_avg=True,
                  avg_num=2, avg_policy=str(log))
    avg = checkpoint.load_ckpt(cfg)
    # best two epochs are 12 (loss 1.0) and 8 (loss 5.0) -> mean 10.0;
    # a positional zip would have scored ep4<-loss(ep1) etc. and picked 4+8
    np.testing.assert_allclose(np.asarray(avg["params"]["w"]), [10.0, 10.0])

    # parse_valid_history keeps resume-duplicated epochs in file order
    with open(log, "a") as f:
        f.write("[ts][INFO] - 1250 / inf iters, 12 / 12 epochs - "
                "valid loss: 0.5\n")
    hist = checkpoint.parse_valid_history(str(log))
    assert hist[-1] == (12, 0.5)
    assert checkpoint._loss_for_epoch(hist, 12) == 0.5
