"""Host-side data layer: Kaldi manifests, vocab, batching, prefetching."""

from liteasr_tpu.data.dataset import AudioFileDataset, RawAudioFileDataset  # noqa: F401
