"""Batchified datasets + fixed-shape collators.

Reference: liteasr/dataset/asr_dataset.py:24-155 and
liteasr/dataset/pretrain_dataset.py:16-70. A dataset item IS a whole
minibatch (list of Audio); the collator turns it into padded numpy arrays.

TPU-native difference: the collator pads the time/label axes up to bucket
multiples and the batch axis up to a multiple of the data-parallel degree, so
XLA sees a small bounded set of shapes (no recompilation storm) and every
batch divides evenly across the ``dp`` mesh axis. Padded rows carry
``valid=0`` and contribute zero loss.
"""

import logging
import math
import pickle
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from liteasr_tpu.data.audio import Audio
from liteasr_tpu.data.batchify import FrameBatch, SeqBatch, Wav2VecBatch
from liteasr_tpu.data.sheet import AudioSheet, TextSheet
from liteasr_tpu.data.transform import PostProcess
from liteasr_tpu.utils.misc import dec2hex, round_up

logger = logging.getLogger(__name__)

IGNORE = -1

# The conv front-end halves time twice with 3x3/stride-2 convs:
# T' = ((L-1)//2 - 1)//2 (nets/subsampling.py, u2.py get_pred_len). The
# smallest L with T' >= 1 is 7.
MIN_SUBSAMPLE_FRAMES = 7
assert ((MIN_SUBSAMPLE_FRAMES - 1) // 2 - 1) // 2 >= 1
assert ((MIN_SUBSAMPLE_FRAMES - 2) // 2 - 1) // 2 < 1


def dummy_min_xlen(raw_wave: bool) -> int:
    """Smallest xlen a weight-0 dummy row may carry so every stage of the
    frontend still emits >= 1 frame (zero-frame rows break CTC/encoder
    shapes). Derived from the actual fbank frame geometry + the conv
    subsampling formula — NOT hard-coded — so a frontend stride change
    shifts this value automatically (tests/test_geometry.py pins the
    contract)."""
    if not raw_wave:
        return MIN_SUBSAMPLE_FRAMES
    from liteasr_tpu.ops import fbank

    # enough samples for MIN_SUBSAMPLE_FRAMES fbank frames
    from inspect import signature

    sig = signature(fbank.log_mel_fbank).parameters
    frame_length = sig["frame_length"].default
    frame_shift = sig["frame_shift"].default
    n = frame_length + (MIN_SUBSAMPLE_FRAMES - 1) * frame_shift
    assert fbank.num_frames(n, frame_length, frame_shift) \
        >= MIN_SUBSAMPLE_FRAMES
    return n


def ladder_up(n: int, multiple: int, ratio: float = 1.25) -> int:
    """Smallest rung >= n on a fixed geometric ladder of ``multiple``s.

    Rungs are ``multiple * ceil(ratio^k)`` — independent of which samples
    share a batch, so the SET of padded shapes a dataset can produce is
    O(log max_len) instead of one per distinct per-batch maximum. Epoch
    reshuffles then never surface a brand-new shape mid-run (each fresh
    shape costs a full XLA compile — 30-60 min through a remote-compile
    tunnel).
    """
    rung = multiple
    while rung < n:
        rung = max(rung + multiple,
                   round_up(int(math.ceil(rung * ratio)), multiple))
    return rung


def collate_batch(
    samples: List[Audio],
    train: bool,
    postprocess: Optional[PostProcess] = None,
    pad_time_multiple: int = 128,
    pad_label_multiple: int = 16,
    batch_multiple: int = 1,
    feat_dim: Optional[int] = None,
    num_shards: int = 1,
    shard_index: int = 0,
    raw_wave: bool = False,
    bucket_ladder: bool = False,
) -> Dict[str, np.ndarray]:
    """Pad a list of utterances into one fixed-shape batch dict.

    Multi-host lockstep: every host sees the SAME sample list and computes the
    same global padded shape from the (cheap) length metadata, then
    materializes only its own row shard — feature I/O happens only for local
    rows. This replaces the reference's DistributedSampler batch sharding
    (trainer.py:48-53) which would give ranks different shapes.

    ``bucket_ladder=True`` (dataset.bucket_ladder) pads T and U up to a
    fixed geometric ladder instead of the per-batch multiple — see
    :func:`ladder_up`. Costs a few percent of padding compute; bounds the
    number of compiled graphs.
    """
    # global padded geometry, from metadata only
    B = len(samples)
    Bp = round_up(B, batch_multiple * num_shards)
    if bucket_ladder:
        T = ladder_up(max(s.xlen for s in samples), pad_time_multiple)
        U = ladder_up(max(max(s.ylen for s in samples), 1),
                      pad_label_multiple)
    else:
        T = round_up(max(s.xlen for s in samples), pad_time_multiple)
        U = max(1, round_up(max(max(s.ylen for s in samples), 1),
                            pad_label_multiple))

    rows = Bp // num_shards
    lo = shard_index * rows
    local = [samples[i] if i < B else None for i in range(lo, lo + rows)]

    if raw_wave:
        out_x = np.zeros((rows, T), dtype=np.float32)
    else:
        D = feat_dim
        if D is None:
            probe = next(s for s in samples if s is not None)
            D = probe.x.shape[-1]
        out_x = np.zeros((rows, T, D), dtype=np.float32)
    out_y = np.full((rows, U), IGNORE, dtype=np.int32)
    out_xlen = np.full(rows, min(dummy_min_xlen(raw_wave), T),
                       dtype=np.int32)
    out_ylen = np.zeros(rows, dtype=np.int32)
    valid = np.zeros(rows, dtype=np.float32)

    for i, sample in enumerate(local):
        if sample is None:
            continue
        x = sample.x
        if not raw_wave and train and postprocess is not None:
            x = postprocess(x)
        x = np.asarray(x, dtype=np.float32)
        y = sample.y if sample.y is not None else np.zeros(0, dtype=np.int32)
        out_x[i, : x.shape[0]] = x
        out_y[i, : y.shape[0]] = y
        out_xlen[i] = sample.xlen
        out_ylen[i] = sample.ylen
        valid[i] = 1.0

    return {
        "xs": out_x,
        "xlens": out_xlen,
        "ys": out_y,
        "ylens": out_ylen,
        "valid": valid,
    }


class AudioFileDataset:
    """Feature/transcript dataset with length-sorted batchify.

    Mirrors liteasr/dataset/asr_dataset.py:24-155, including the
    ``memory_save`` pickle-dump staging of batches into hex-sharded dirs.
    """

    def __init__(
        self,
        split: str,
        data_dir: str,
        delimiter: Optional[str],
        dataset_cfg,
        postprocess_cfg,
        vocab,
        keep_raw: bool = False,
        memory_save: bool = False,
    ):
        self.split = split
        self.data: List[Audio] = []
        self.batchify_policy = None
        self.dataset_cfg = dataset_cfg
        self.dump_path = Path(data_dir, ".dump")
        # host-side transforms only when the device pipeline is off
        self.postprocess = (
            PostProcess(postprocess_cfg)
            if postprocess_cfg is not None
            and not postprocess_cfg.get("on_device", False) else None)
        # the trainer sets these: rows divisible by the per-host dp degree,
        # and this host's row shard
        self.batch_multiple = 1
        self.num_shards = 1
        self.shard_index = 0

        _is_prior = memory_save and not self.dump_path.is_dir()
        _is_other = memory_save and self.dump_path.is_dir()

        _as = AudioSheet(data_dir)
        _ts = TextSheet(data_dir, vocab=vocab, delimiter=delimiter)
        assert len(_as) == len(_ts)

        from liteasr_tpu.utils.progress_bar import ProgressBar

        pb = ProgressBar(total=len(_as), title="loaded data") \
            if len(_as) >= 5000 else None
        for audio_info, text_info in zip(_as, _ts):
            uttid, fd, start, shape = audio_info
            uttid_t, tokenids, text = text_info
            assert uttid_t == uttid
            self.data.append(
                Audio(fd, start, shape, tokenids, text if keep_raw else None))
            if pb:
                pb.update(len(self.data))
            if _is_other:
                break

        # on-the-fly fbank: items are raw waveforms, features computed on
        # device (ops/fbank.py); feat_dim is the mel-bin count
        self.fbank = bool(dataset_cfg.get("fbank", False)) if dataset_cfg \
            else False
        self.num_mel_bins = int(dataset_cfg.get("num_mel_bins", 80)) \
            if dataset_cfg else 80
        if self.fbank:
            assert self.data[0].start is not None, (
                "dataset.fbank=true expects wav.scp waveforms, "
                f"but {data_dir} provides precomputed features")
            self.feat_dim = self.num_mel_bins
        else:
            self.feat_dim = self.data[0].x.shape[-1]

        if not memory_save or _is_prior:
            if dataset_cfg is not None and dataset_cfg.get("batch_size"):
                self.batchify(dataset_cfg)

        if _is_prior:
            self.dump_path.mkdir(parents=True)
            for i, batch_indices in enumerate(self.batchify_policy):
                prefix, infix, suffix = dec2hex(i)
                (self.dump_path / prefix / infix).mkdir(
                    parents=True, exist_ok=True)
                with (self.dump_path / prefix / infix /
                      f"{suffix}.batch").open("wb") as f:
                    pickle.dump([self.data[idx] for idx in batch_indices], f)

        if memory_save:
            self.data = []
            self.batchify_policy = None

    def batchify(self, dataset_cfg):
        if dataset_cfg.batch_count == "seq":
            policy_cls = SeqBatch
        elif dataset_cfg.batch_count == "frame":
            policy_cls = FrameBatch
        else:
            raise ValueError(f"unsupported strategy {dataset_cfg.batch_count}")
        self.batchify_policy = policy_cls(dataset_cfg)
        indices, _ = zip(*sorted(
            enumerate(self.data), key=lambda d: d[1].xlen, reverse=True))
        self.batchify_policy.batchify(indices, self.data)

    @property
    def train(self) -> bool:
        return self.split == "train"

    def collator(self, samples: List[Audio]) -> Dict[str, np.ndarray]:
        cfg = self.dataset_cfg
        return collate_batch(
            samples,
            train=self.train,
            postprocess=self.postprocess,
            pad_time_multiple=cfg.get("pad_time_multiple", 128) if cfg else 128,
            pad_label_multiple=cfg.get("pad_label_multiple", 16) if cfg else 16,
            batch_multiple=self.batch_multiple,
            feat_dim=self.feat_dim,
            num_shards=self.num_shards,
            shard_index=self.shard_index,
            raw_wave=self.fbank,
            bucket_ladder=bool(cfg.get("bucket_ladder", False)) if cfg
            else False,
        )

    def __getitem__(self, index):
        if self.batchify_policy is not None:
            return [self.data[idx] for idx in self.batchify_policy[index]]
        if self.data:
            return self.data[index]
        prefix, infix, suffix = dec2hex(index)
        with (self.dump_path / prefix / infix / f"{suffix}.batch").open("rb") as f:
            return pickle.load(f)

    def __len__(self):
        if self.batchify_policy is not None:
            return len(self.batchify_policy)
        if self.data:
            return len(self.data)
        count = 0
        for prefix in self.dump_path.iterdir():
            for infix in prefix.iterdir():
                count += len(list(infix.iterdir()))
        return count


class RawAudioFileDataset:
    """Raw-waveform dataset for wav2vec2 pretraining
    (liteasr/dataset/pretrain_dataset.py:16-70)."""

    def __init__(self, data_dir: str, dataset_cfg, postprocess_cfg=None,
                 crop_frames: int = 250000):
        self.data: List[Audio] = []
        self.batchify_policy = None
        self.dataset_cfg = dataset_cfg
        self.crop_frames = crop_frames
        # the trainer sets these (same contract as AudioFileDataset)
        self.batch_multiple = 1
        self.num_shards = 1
        self.shard_index = 0
        self.split = "train"

        for uttid, fd, start, shape in AudioSheet(data_dir):
            self.data.append(Audio(fd, start, shape, None, None))

        self.feat_dim = 1
        self.batchify(dataset_cfg)

    def batchify(self, dataset_cfg):
        self.batchify_policy = Wav2VecBatch(dataset_cfg)
        indices, _ = zip(*sorted(
            enumerate(self.data), key=lambda d: d[1].xlen, reverse=True))
        self.batchify_policy.batchify(indices, self.data)

    def collator(self, samples: List[Audio]) -> Dict[str, np.ndarray]:
        # crop the batch to its shortest utterance (<= crop_frames), like the
        # reference collator (pretrain_dataset.py:51-56). Multi-host lockstep
        # mirrors collate_batch: every host derives the same global geometry
        # from length metadata, then materializes only its own row shard —
        # without this, every process would feed identical rows and the
        # assembled global batch would duplicate each sample (the reference's
        # DistributedSampler semantics, liteasr/trainer.py:48-53).
        crop = min(min(s.xlen for s in samples), self.crop_frames)
        # bucket the shapes XLA sees: crop quantized down, rows padded up
        # (weight-0 dummy rows) — otherwise every batch compiles separately
        cm = int(self.dataset_cfg.get("crop_multiple", 8000)) \
            if self.dataset_cfg else 8000
        bm = int(self.dataset_cfg.get("pad_batch_multiple", 4)) \
            if self.dataset_cfg else 4
        if cm > 1:
            crop = max((crop // cm) * cm, min(cm, crop))
        B = len(samples)
        Bp = round_up(B, max(bm, 1) * self.batch_multiple * self.num_shards)
        rows = Bp // self.num_shards
        lo = self.shard_index * rows

        out = np.zeros((rows, crop), dtype=np.float32)
        # dummy rows get xlens 0 so the span mask (and the code-usage
        # statistics it weights) stays off them, not just the loss
        xlens = np.zeros(rows, dtype=np.int32)
        valid = np.zeros(rows, dtype=np.float32)
        for i in range(rows):
            j = lo + i
            if j >= B:
                continue  # padded dummy row: valid/xlens stay 0
            out[i] = samples[j].x[:crop]
            xlens[i] = crop
            valid[i] = 1.0
        return {"xs": out, "xlens": xlens, "valid": valid}

    def __getitem__(self, index):
        if self.batchify_policy is None:
            return self.data[index]
        return [self.data[idx] for idx in self.batchify_policy[index]]

    def __len__(self):
        if self.batchify_policy is None:
            return len(self.data)
        return len(self.batchify_policy)
