"""On-device log-mel filterbank front-end (+ per-utterance CMVN).

The reference consumes Kaldi-precomputed features (feats.scp); raw waveforms
only feed wav2vec2. This op computes Kaldi-style log-mel fbank on device —
framing/windowing as reshapes, the DFT power spectrum via ``jnp.fft.rfft``
(XLA TPU FFT), and the mel projection as one MXU matmul — so ASR can train
straight from wav.scp with features fused into the jitted step.
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def mel_filterbank(num_bins: int, n_fft: int, sample_rate: int,
                   low_freq: float = 20.0,
                   high_freq: Optional[float] = None) -> np.ndarray:
    """(n_fft//2+1, num_bins) triangular mel filter matrix (HTK mel scale)."""
    high_freq = high_freq or sample_rate / 2.0

    def hz_to_mel(hz):
        return 1127.0 * np.log(1.0 + np.asarray(hz) / 700.0)

    def mel_to_hz(mel):
        return 700.0 * (np.exp(np.asarray(mel) / 1127.0) - 1.0)

    mel_pts = np.linspace(hz_to_mel(low_freq), hz_to_mel(high_freq),
                          num_bins + 2)
    hz_pts = mel_to_hz(mel_pts)
    bins = np.floor((n_fft + 1) * hz_pts / sample_rate).astype(int)

    fb = np.zeros((n_fft // 2 + 1, num_bins), dtype=np.float32)
    for m in range(num_bins):
        lo, ctr, hi = bins[m], bins[m + 1], bins[m + 2]
        for k in range(lo, ctr):
            if ctr > lo:
                fb[k, m] = (k - lo) / (ctr - lo)
        for k in range(ctr, hi):
            if hi > ctr:
                fb[k, m] = (hi - k) / (hi - ctr)
    return fb


def num_frames(num_samples: int, frame_length: int = 400,
               frame_shift: int = 160) -> int:
    if num_samples < frame_length:
        return 0
    return 1 + (num_samples - frame_length) // frame_shift


@functools.partial(jax.jit, static_argnames=(
    "num_mel_bins", "frame_length", "frame_shift", "n_fft", "sample_rate",
    "preemph", "cmvn"))
def log_mel_fbank(
    waveform: jnp.ndarray,
    wave_lens: jnp.ndarray,
    num_mel_bins: int = 80,
    frame_length: int = 400,
    frame_shift: int = 160,
    n_fft: int = 512,
    sample_rate: int = 16000,
    preemph: float = 0.97,
    cmvn: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:param waveform: (B, S) float in [-1, 1]
    :param wave_lens: (B,) valid samples
    :return: (feats (B, T, num_mel_bins), feat_lens (B,))
    """
    B, S = waveform.shape
    T = num_frames(S, frame_length, frame_shift)

    # frame: (B, T, frame_length) via strided gather
    starts = jnp.arange(T) * frame_shift
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]  # (T, L)
    frames = waveform[:, idx]  # (B, T, L)

    # per-frame DC removal + preemphasis + povey window (Kaldi defaults)
    frames = frames - frames.mean(axis=-1, keepdims=True)
    pre = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - preemph * pre
    n = jnp.arange(frame_length, dtype=jnp.float32)
    hann = 0.5 - 0.5 * jnp.cos(2.0 * math.pi * n / (frame_length - 1))
    povey = hann ** 0.85
    frames = frames * povey[None, None, :]

    # power spectrum -> mel -> log
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.abs(spec) ** 2  # (B, T, n_fft//2+1)
    fb = jnp.asarray(mel_filterbank(num_mel_bins, n_fft, sample_rate))
    mel = jnp.einsum("btf,fm->btm", power, fb,
                     preferred_element_type=jnp.float32)
    feats = jnp.log(jnp.maximum(mel, 1e-10))

    feat_lens = jnp.where(
        wave_lens >= frame_length,
        1 + (wave_lens - frame_length) // frame_shift, 0).astype(jnp.int32)

    if cmvn:
        valid = (jnp.arange(T)[None, :] < feat_lens[:, None])[..., None]
        denom = jnp.maximum(feat_lens, 1).astype(jnp.float32)[:, None, None]
        mean = (feats * valid).sum(axis=1, keepdims=True) / denom
        var = (((feats - mean) ** 2) * valid).sum(axis=1, keepdims=True) / denom
        feats = (feats - mean) * jax.lax.rsqrt(var + 1e-8)
        feats = feats * valid

    return feats, feat_lens
