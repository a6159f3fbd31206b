"""Synthetic phone-like ASR corpus generator (Kaldi format).

Purpose: a convergence-at-scale proof of the flagship U2 conformer recipe
(VERDICT r1 next-round #1). No real speech exists in the image, so we
synthesize a corpus whose generative process is hard enough that WER is
meaningful: the mapping characters -> acoustics has

* per-character prototype *trajectories* (3 anchor vectors interpolated over
  a random duration), not single static templates, so the model must align;
* duration jitter (Poisson) — no fixed frames-per-token;
* coarticulation — a moving-average smoother blends adjacent characters;
* confusable character pairs — several prototypes are deliberately close,
  so the acoustics alone leave residual ambiguity (non-zero error floor);
* speaker/channel effects — per-utterance gain, a smooth additive channel
  vector, and white noise;
* a word lexicon with Zipf-ish usage — gives the attention decoder LM-like
  structure to exploit (rescoring should beat pure CTC).

Output layout per split (reference manifest format, liteasr/dataclass/
sheet.py): feats.ark + feats.scp + utt2num_frames + text, plus vocab.txt at
the corpus root (char-level tokens, delimiter=None).

Usage:
    python tools/make_synth_corpus.py --out /data/synth \
        --train-utts 20000 --valid-utts 500 --test-utts 500 --seed 0
"""

import argparse
import os
import sys

import numpy as np

FEAT_DIM = 80
ALPHABET = "abcdefghijklmnopqrstuvwxyz"
SPACE = "<space>"


def _smooth_vector(rng, dim, scale=1.0):
    """A random vector with smooth structure across mel-like bins."""
    v = rng.normal(size=dim)
    k = np.hanning(9)
    k /= k.sum()
    v = np.convolve(v, k, mode="same")
    return scale * v / max(np.std(v), 1e-6)


def build_phone_inventory(rng, n_confusable_pairs=6):
    """3 anchor vectors per symbol; some pairs made deliberately close."""
    symbols = list(ALPHABET) + [SPACE]
    anchors = {
        s: np.stack([_smooth_vector(rng, FEAT_DIM, scale=1.6)
                     for _ in range(3)])
        for s in symbols
    }
    # space is quiet: compress toward zero
    anchors[SPACE] *= 0.25
    # confusable pairs: b's anchors = a's + small perturbation
    letters = list(ALPHABET)
    rng.shuffle(letters)
    pairs = [(letters[2 * i], letters[2 * i + 1])
             for i in range(n_confusable_pairs)]
    for a, b in pairs:
        anchors[b] = anchors[a] + 0.35 * np.stack(
            [_smooth_vector(rng, FEAT_DIM) for _ in range(3)])
    return anchors, pairs


def build_lexicon(rng, n_words=500):
    words = set()
    while len(words) < n_words:
        length = min(2 + rng.poisson(2.4), 9)
        words.add("".join(rng.choice(list(ALPHABET), size=length)))
    words = sorted(words)
    # Zipf-ish usage frequencies
    freq = 1.0 / np.arange(1, len(words) + 1) ** 0.9
    rng.shuffle(freq)
    return words, freq / freq.sum()


def render_utterance(rng, sentence_words, anchors, noise_sigma=0.35):
    """Render a word sequence into (frames, FEAT_DIM) features."""
    symbols = []
    for i, w in enumerate(sentence_words):
        if i > 0:
            symbols.append(SPACE)
        symbols.extend(w)

    chunks = []
    for s in symbols:
        dur = 3 + rng.poisson(3.0)  # 3..~12 frames per symbol
        a = anchors[s]
        # piecewise-linear trajectory through the 3 anchors
        t = np.linspace(0.0, 2.0, dur)
        lo = np.clip(t.astype(int), 0, 1)
        frac = (t - lo)[:, None]
        chunks.append((1 - frac) * a[lo] + frac * a[lo + 1])
    sil = 0.1 * rng.normal(size=(int(rng.integers(4, 12)), FEAT_DIM))
    frames = np.concatenate([sil, *chunks,
                             0.1 * rng.normal(size=(int(rng.integers(4, 12)),
                                                    FEAT_DIM))])

    # coarticulation: moving average over time
    k = np.array([0.2, 0.6, 0.2])
    frames = np.apply_along_axis(
        lambda col: np.convolve(col, k, mode="same"), 0, frames)

    # speaker/channel effects + noise
    gain = 1.0 + 0.12 * rng.normal()
    channel = _smooth_vector(rng, FEAT_DIM, scale=0.4)
    frames = gain * frames + channel + noise_sigma * rng.normal(
        size=frames.shape)
    return frames.astype(np.float32)


def make_split(root, name, n_utt, rng, anchors, words, word_p, writer_mod,
               noise_sigma=0.35):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    texts, frames_lines = [], []
    ark = os.path.join(d, "feats.ark")
    scp = os.path.join(d, "feats.scp")
    with writer_mod.WriteHelper(f"ark,scp:{ark},{scp}") as w:
        for i in range(n_utt):
            uttid = f"{name}_{i:06d}"
            n_words = int(np.clip(2 + rng.poisson(3.5), 2, 10))
            sent = list(rng.choice(words, size=n_words, p=word_p))
            feats = render_utterance(rng, sent, anchors, noise_sigma)
            w(uttid, feats)
            # char-level path (task.delimiter=None) reads a single
            # concatenated token stream: words are separated by silence in
            # the acoustics but not in the labels (sheet.py TextSheet)
            texts.append(f"{uttid} {''.join(sent)}")
            frames_lines.append(f"{uttid} {feats.shape[0]}")
            if (i + 1) % 2000 == 0:
                print(f"  {name}: {i + 1}/{n_utt}", flush=True)
    with open(os.path.join(d, "text"), "w") as f:
        f.write("\n".join(texts) + "\n")
    with open(os.path.join(d, "utt2num_frames"), "w") as f:
        f.write("\n".join(frames_lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train-utts", type=int, default=20000)
    ap.add_argument("--valid-utts", type=int, default=500)
    ap.add_argument("--test-utts", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise-sigma", type=float, default=0.35)
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from liteasr_tpu.data import kaldi_helpers

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)

    anchors, confusable = build_phone_inventory(rng)
    words, word_p = build_lexicon(rng)
    print(f"confusable pairs: {confusable}")

    # char-level vocab (delimiter=None in the task config): ids from 1;
    # <blank>=0 and <sos/eos>=V-1 are added by Vocab itself
    tokens = ["<unk>"] + list(ALPHABET) + [SPACE]
    with open(os.path.join(args.out, "vocab.txt"), "w") as f:
        f.write("".join(f"{t} {i + 1}\n" for i, t in enumerate(tokens)))

    for name, n in (("train", args.train_utts), ("valid", args.valid_utts),
                    ("test", args.test_utts)):
        print(f"rendering {name} ({n} utts)...", flush=True)
        make_split(args.out, name, n, rng, anchors, words, word_p,
                   kaldi_helpers, noise_sigma=args.noise_sigma)
    print("done:", args.out)


if __name__ == "__main__":
    main()
