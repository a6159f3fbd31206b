"""Multi-host lockstep collation: per-host shards must (a) agree on the
global padded geometry computed from metadata alone and (b) concatenate to
exactly the single-host batch."""

import numpy as np

from liteasr_tpu.data.audio import Audio
from liteasr_tpu.data import kaldi_io
from liteasr_tpu.data.dataset import collate_batch


def _samples(tmp_path, rng, n=6):
    mats = {f"u{i}": rng.normal(size=(10 + 3 * i, 8)).astype(np.float32)
            for i in range(n)}
    kaldi_io.save_ark(str(tmp_path / "x.ark"), mats,
                      scp_path=str(tmp_path / "x.scp"))
    scp = kaldi_io.load_scp(str(tmp_path / "x.scp"))
    out = []
    for i in range(n):
        key = f"u{i}"
        out.append(Audio(scp[key], None, mats[key].shape[0],
                         tuple(range(1, 2 + i)), None))
    return out


def test_shards_concatenate_to_global_batch(tmp_path, rng):
    samples = _samples(tmp_path, rng)

    # single-host equivalent of (2 hosts x batch_multiple 2): the global
    # batch rounds up to batch_multiple * num_shards rows
    full = collate_batch(samples, train=False, pad_time_multiple=16,
                         pad_label_multiple=4, batch_multiple=4)
    shard0 = collate_batch(samples, train=False, pad_time_multiple=16,
                           pad_label_multiple=4, batch_multiple=2,
                           num_shards=2, shard_index=0)
    shard1 = collate_batch(samples, train=False, pad_time_multiple=16,
                           pad_label_multiple=4, batch_multiple=2,
                           num_shards=2, shard_index=1)

    for key in full:
        merged = np.concatenate([shard0[key], shard1[key]], axis=0)
        np.testing.assert_array_equal(merged, full[key], err_msg=key)

    # identical padded geometry on both shards
    assert shard0["xs"].shape == shard1["xs"].shape
