"""Length-sorted greedy bucketing into variable-size minibatches.

Reference: liteasr/utils/batchify.py:12-182 (SeqBatch shrinks batch size by a
max_len_in/out factor; FrameBatch caps total in/out/inout frames; Wav2VecBatch
caps min_frame * count). Because samples arrive sorted descending by length,
each minibatch is nearly length-homogeneous — exactly what the TPU's
bucketed-padding pipeline wants (few distinct padded shapes, little waste).
"""

import logging
from typing import List

logger = logging.getLogger(__name__)


class BatchifyPolicy:
    def __init__(self, dataset_cfg):
        self._num = 0
        self.data: List[List[int]] = []
        self.minibatch: List[int] = []
        self.dataset_cfg = dataset_cfg
        self.sample = None

    @property
    def empty(self) -> bool:
        return len(self.minibatch) == 0

    @property
    def full(self) -> bool:
        raise NotImplementedError

    def push(self, idx: int):
        raise NotImplementedError

    def pop(self):
        self.data.append(self.minibatch)
        self._num += len(self.minibatch)
        self.minibatch = []

    def refresh(self):
        raise NotImplementedError

    def batchify(self, indices, samples):
        assert len(indices) == len(samples), f"{len(samples)}"
        self.refresh()
        for idx in indices:
            self.sample = samples[idx]
            if self.full:
                self.pop()
                self.refresh()
            self.push(idx)
        if not self.empty:
            self.pop()
            self.refresh()

    def __getitem__(self, index):
        return self.data[index]

    def __len__(self):
        return len(self.data)


class SeqBatch(BatchifyPolicy):
    """Dynamic batch size = batch_size / (1 + max(ilen/max_len_in,
    olen/max_len_out)) (liteasr/utils/batchify.py:76-113)."""

    @property
    def full(self):
        return len(self.minibatch) == self.dynamic_batch_size

    def push(self, idx):
        if self.empty:
            self.minibatch.append(idx)
            self.refresh()
        else:
            self.minibatch.append(idx)

    def refresh(self):
        cfg = self.dataset_cfg
        if self.empty:
            self.factor = 0
            self.dynamic_batch_size = cfg.batch_size
            self.max_ilen = 0
            self.max_olen = 0
        else:
            self.max_ilen = self.sample.xlen
            self.max_olen = self.sample.ylen
            self.factor = max(
                int(self.max_ilen / cfg.max_len_in),
                int(self.max_olen / cfg.max_len_out),
            )
            self.dynamic_batch_size = max(
                cfg.min_batch_size or 1,
                int(cfg.batch_size / (1 + self.factor)),
            )


class FrameBatch(BatchifyPolicy):
    """Caps max_ilen/olen * batch to max_frame_in/out/inout
    (liteasr/utils/batchify.py:115-159)."""

    @property
    def full(self):
        cfg = self.dataset_cfg
        max_ilen = max(self.max_ilen, self.sample.xlen)
        max_olen = max(self.max_olen, self.sample.ylen)
        exp_size = len(self.minibatch) + 1
        if cfg.max_frame_in and max_ilen * exp_size > cfg.max_frame_in:
            return True
        if cfg.max_frame_out and max_olen * exp_size > cfg.max_frame_out:
            return True
        if cfg.max_frame_inout and \
                (max_ilen + max_olen) * exp_size > cfg.max_frame_inout:
            return True
        return False

    def push(self, idx):
        self.minibatch.append(idx)
        self.refresh()

    def refresh(self):
        if self.empty:
            self.max_ilen = 0
            self.max_olen = 0
        else:
            self.max_ilen = max(self.max_ilen, self.sample.xlen)
            self.max_olen = max(self.max_olen, self.sample.ylen)


class Wav2VecBatch(BatchifyPolicy):
    """(count+1) * min_frame <= 1.4M samples (liteasr/utils/batchify.py:162-182)."""

    max_batch_frame: int = 1400000
    crop_frames: int = 250000

    @property
    def full(self) -> bool:
        min_frame = min(self.min_frame, self.sample.xlen)
        return (len(self.minibatch) + 1) * min_frame > self.max_batch_frame

    def push(self, idx: int):
        self.minibatch.append(idx)
        self.refresh()

    def refresh(self):
        if self.empty:
            self.min_frame = self.crop_frames
        else:
            self.min_frame = min(self.min_frame, self.sample.xlen)
