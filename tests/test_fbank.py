"""On-device fbank vs a straightforward numpy STFT reference."""

import math

import jax.numpy as jnp
import numpy as np

from liteasr_tpu.ops.fbank import log_mel_fbank, mel_filterbank, num_frames


def numpy_fbank(wave, num_mel_bins=23, frame_length=400, frame_shift=160,
                n_fft=512, sr=16000, preemph=0.97):
    T = num_frames(len(wave), frame_length, frame_shift)
    fb = mel_filterbank(num_mel_bins, n_fft, sr)
    n = np.arange(frame_length)
    povey = (0.5 - 0.5 * np.cos(2 * math.pi * n / (frame_length - 1))) ** 0.85
    out = np.zeros((T, num_mel_bins), np.float32)
    for t in range(T):
        fr = wave[t * frame_shift: t * frame_shift + frame_length].copy()
        fr = fr - fr.mean()
        fr = fr - preemph * np.concatenate([[fr[0]], fr[:-1]])
        fr = fr * povey
        spec = np.abs(np.fft.rfft(fr, n_fft)) ** 2
        out[t] = np.log(np.maximum(spec @ fb, 1e-10))
    return out


def test_fbank_matches_numpy(rng):
    wave = (rng.normal(size=4000) * 0.1).astype(np.float32)
    feats, lens = log_mel_fbank(
        jnp.asarray(wave)[None], jnp.array([4000]), num_mel_bins=23,
        cmvn=False)
    ref = numpy_fbank(wave)
    assert int(lens[0]) == ref.shape[0]
    np.testing.assert_allclose(
        np.asarray(feats)[0, : ref.shape[0]], ref, rtol=1e-3, atol=1e-3)


def test_fbank_cmvn_and_lengths(rng):
    B, S = 3, 6400
    waves = (rng.normal(size=(B, S)) * 0.1).astype(np.float32)
    lens = np.array([6400, 4000, 300], np.int32)  # last one: too short
    feats, flens = log_mel_fbank(
        jnp.asarray(waves), jnp.asarray(lens), num_mel_bins=16, cmvn=True)
    flens = np.asarray(flens)
    assert flens[0] > flens[1] > 0
    assert flens[2] == 0
    f = np.asarray(feats)
    # CMVN: per-utt valid-frame stats ~ (0, 1)
    v0 = f[0, : flens[0]]
    np.testing.assert_allclose(v0.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(v0.var(axis=0), 1.0, atol=1e-2)
    # padded frames zeroed
    assert np.allclose(f[1, flens[1]:], 0.0)
