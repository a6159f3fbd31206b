"""Kaldi ark/scp/wav I/O round trips + sheet parsing."""

import numpy as np

from liteasr_tpu.data import kaldi_io
from liteasr_tpu.data.sheet import AudioSheet, TextSheet
from liteasr_tpu.data.vocab import Vocab


def test_ark_scp_roundtrip(tmp_path, rng):
    mats = {f"utt{i}": rng.normal(size=(10 + i, 8)).astype(np.float32)
            for i in range(5)}
    ark = str(tmp_path / "a.ark")
    scp = str(tmp_path / "a.scp")
    kaldi_io.save_ark(ark, mats, scp_path=scp)

    # by scp offsets
    for key, rx in kaldi_io.load_scp(scp).items():
        np.testing.assert_allclose(kaldi_io.load_mat(rx), mats[key])

    # sequential ark iteration
    read = dict(kaldi_io.load_ark(ark))
    assert set(read) == set(mats)
    for k in mats:
        np.testing.assert_allclose(read[k], mats[k])


def test_float64_matrix(tmp_path, rng):
    mats = {"u0": rng.normal(size=(7, 3)).astype(np.float64)}
    ark = str(tmp_path / "d.ark")
    kaldi_io.save_ark(ark, mats)
    out = dict(kaldi_io.load_ark(ark))["u0"]
    np.testing.assert_allclose(out, mats["u0"].astype(np.float32), rtol=1e-6)


def test_wav_roundtrip(tmp_path, rng):
    samples = (rng.normal(size=16000) * 0.1).astype(np.float32)
    path = str(tmp_path / "x.wav")
    kaldi_io.write_wav(path, samples, 16000)
    out, rate = kaldi_io.read_wav(path)
    assert rate == 16000
    np.testing.assert_allclose(out, samples, atol=1e-4)


def test_wav_pipe(tmp_path, rng):
    samples = (rng.normal(size=8000) * 0.1).astype(np.float32)
    path = str(tmp_path / "x.wav")
    kaldi_io.write_wav(path, samples, 16000)
    out, rate = kaldi_io.read_wav(f"cat {path} |")
    np.testing.assert_allclose(out, samples, atol=1e-4)


def test_vocab(tmp_path):
    (tmp_path / "v.txt").write_text("<unk> 1\na 2\nb 3\n<space> 4\n")
    v = Vocab(str(tmp_path / "v.txt"))
    assert len(v) == 6  # blank + 4 + sos/eos
    assert v["a"] == 2 and v[2] == "a"
    assert v["zzz"] == v["<unk>"]
    assert v.lookup("ab") == (2, 3)
    assert v.convert(0) == "" and v.convert(4) == " "
    assert v.valid


def test_sheets(tiny_corpus):
    v = Vocab(str(tiny_corpus / "vocab.txt"))
    audio = list(AudioSheet(str(tiny_corpus / "train")))
    text = list(TextSheet(str(tiny_corpus / "train"), vocab=v))
    assert len(audio) == len(text) == 12
    for (uid_a, rx, start, frames), (uid_t, tokenids, raw) in zip(audio, text):
        assert uid_a == uid_t
        assert start is None
        mat = kaldi_io.load_mat(rx)
        assert mat.shape[0] == frames
        assert len(tokenids) == len(raw)


def test_wav_scp_sheet(tmp_path, rng):
    d = tmp_path / "wavdata"
    d.mkdir()
    lens = [16000, 8000]
    lines = []
    for i, n in enumerate(lens):
        p = str(d / f"u{i}.wav")
        kaldi_io.write_wav(p, (rng.normal(size=n) * 0.05).astype(np.float32))
        lines.append(f"u{i} {p}")
    (d / "wav.scp").write_text("\n".join(lines) + "\n")
    rows = list(AudioSheet(str(d)))
    assert [r[3] for r in rows] == lens
    assert all(r[2] == 0 for r in rows)


def test_segments_sheet(tmp_path, rng):
    """wav.scp + segments: utterances are 16 kHz slices of recordings
    (reference sheet.py:67-78)."""
    from liteasr_tpu.data.audio import Audio

    d = tmp_path / "segdata"
    d.mkdir()
    wav_path = str(d / "rec0.wav")
    samples = (rng.normal(size=32000) * 0.05).astype(np.float32)  # 2 s
    kaldi_io.write_wav(wav_path, samples)
    (d / "wav.scp").write_text(f"rec0 {wav_path}\n")
    (d / "segments").write_text(
        "utt0 rec0 0.00 0.50\n"
        "utt1 rec0 0.50 1.25\n"
        "utt2 rec0 1.25 2.00\n")
    rows = list(AudioSheet(str(d)))
    assert [r[0] for r in rows] == ["utt0", "utt1", "utt2"]
    starts = [r[2] for r in rows]
    lens = [r[3] for r in rows]
    assert starts == [0, 8000, 20000]
    assert lens == [7999, 11999, 11999]
    # lazy slice read matches the source samples
    a = Audio(rows[1][1], starts[1], lens[1], None, None)
    np.testing.assert_allclose(a.x, samples[8000:8000 + 11999], atol=1e-4)


def test_read_write_helpers(tmp_path, rng):
    """High-level Kaldi IO (reference highlevel.py ReadHelper/WriteHelper)."""
    from liteasr_tpu.data.kaldi_helpers import ReadHelper, WriteHelper

    mats = {f"u{i}": rng.normal(size=(6 + i, 5)).astype(np.float32)
            for i in range(3)}
    ark = str(tmp_path / "h.ark")
    scp = str(tmp_path / "h.scp")
    with WriteHelper(f"ark,scp:{ark},{scp}") as w:
        for key, mat in mats.items():
            w(key, mat)

    got = dict(ReadHelper(f"ark:{ark}"))
    assert set(got) == set(mats)
    for k in mats:
        np.testing.assert_allclose(got[k], mats[k])

    got_scp = dict(ReadHelper(f"scp:{scp}"))
    for k in mats:
        np.testing.assert_allclose(got_scp[k], mats[k])
