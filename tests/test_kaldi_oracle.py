"""Golden-file parity tests for kaldi_io against the reference's vendored
kaldiio (pure Python, used as a read/write ORACLE only — nothing is copied).

Covers the VERDICT r1 kaldiio long tail: compressed-matrix formats 1/2/3,
ark range rxspecifiers, text-mode arks, and float/24-bit wav decoding.
"""

import struct
import sys
import types

import numpy as np
import pytest

from liteasr_tpu.data import kaldi_io


def _ref_matio():
    """Import the reference's vendored kaldiio.matio without executing
    liteasr/__init__.py (which drags in torch model registries)."""
    base = "/root/reference/liteasr"
    for name, path in (("liteasr", base), ("liteasr.utils", base + "/utils"),
                       ("liteasr.utils.kaldiio", base + "/utils/kaldiio")):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod
    import importlib

    return importlib.import_module("liteasr.utils.kaldiio.matio")


matio = _ref_matio()


@pytest.fixture
def mat():
    return np.random.default_rng(0).normal(
        size=(37, 13)).astype(np.float32) * 3.0


@pytest.mark.parametrize("method,fmt", [(2, "CM"), (3, "CM2"), (5, "CM3")])
def test_read_reference_compressed(tmp_path, mat, method, fmt):
    """The reference writes each compressed format; our reader must decode
    bit-identically to the reference's own reader."""
    ark = str(tmp_path / "c.ark")
    scp = str(tmp_path / "c.scp")
    matio.save_ark(ark, {"u1": mat}, scp=scp, compression_method=method)

    ref = dict(matio.load_ark(ark))["u1"]
    ours_ark = dict(kaldi_io.load_ark(ark))["u1"]
    np.testing.assert_array_equal(np.asarray(ref, np.float32), ours_ark)

    rx = kaldi_io.load_scp(scp)["u1"]
    ours_scp = kaldi_io.load_mat(rx)
    np.testing.assert_array_equal(np.asarray(ref, np.float32), ours_scp)

    # quantization keeps values close to the original
    tol = 0.05 if fmt != "CM3" else 0.2
    assert np.abs(ours_ark - mat).max() < tol * np.abs(mat).max() + 0.05


@pytest.mark.parametrize("method", [1, 2, 3, 5])
def test_reference_reads_our_compressed(tmp_path, mat, method):
    """Cross direction: files we write must decode identically under the
    reference reader."""
    ark = str(tmp_path / "m.ark")
    kaldi_io.save_ark(ark, {"u1": mat}, compression_method=method)
    ref = np.asarray(dict(matio.load_ark(ark))["u1"], np.float32)
    ours = dict(kaldi_io.load_ark(ark))["u1"]
    np.testing.assert_array_equal(ref, ours)


def test_range_rxspecifier(tmp_path, mat):
    ark = str(tmp_path / "r.ark")
    scp = str(tmp_path / "r.scp")
    kaldi_io.save_ark(ark, {"u1": mat}, scp_path=scp)
    rx = kaldi_io.load_scp(scp)["u1"]

    ref = np.asarray(matio.load_mat(rx + "[3:7]"), np.float32)
    ours = kaldi_io.load_mat(rx + "[3:7]")
    np.testing.assert_array_equal(ref, ours)
    np.testing.assert_array_equal(ours, mat[3:8])

    ref2 = np.asarray(matio.load_mat(rx + "[0:9,2:5]"), np.float32)
    ours2 = kaldi_io.load_mat(rx + "[0:9,2:5]")
    np.testing.assert_array_equal(ref2, ours2)
    np.testing.assert_array_equal(ours2, mat[0:10, 2:6])


def test_text_mode_ark(tmp_path):
    mat = np.array([[1.5, -2.0], [0.25, 4.0], [3.0, 0.0]], np.float32)
    ark = str(tmp_path / "t.ark")
    matio.save_ark(ark, {"u1": mat}, text=True)
    ours = dict(kaldi_io.load_ark(ark))["u1"]
    np.testing.assert_allclose(ours, mat, rtol=1e-6)


def _write_riff(path, fmt_tag, width_bytes, payload, rate=16000, channels=1):
    data_size = len(payload)
    with open(path, "wb") as f:
        f.write(struct.pack("<4sI4s", b"RIFF", 36 + data_size, b"WAVE"))
        f.write(struct.pack("<4sIHHIIHH", b"fmt ", 16, fmt_tag, channels,
                            rate, rate * width_bytes * channels,
                            width_bytes * channels, width_bytes * 8))
        f.write(struct.pack("<4sI", b"data", data_size))
        f.write(payload)


def test_float_wav(tmp_path):
    samples = (np.sin(np.linspace(0, 20, 1600)) * 0.5).astype(np.float32)
    p = str(tmp_path / "f32.wav")
    _write_riff(p, fmt_tag=3, width_bytes=4, payload=samples.tobytes())
    out, rate = kaldi_io.read_wav(p)
    assert rate == 16000
    np.testing.assert_allclose(out, samples, atol=1e-7)


def test_24bit_wav(tmp_path):
    rng = np.random.default_rng(1)
    ints = rng.integers(-(2 ** 23), 2 ** 23 - 1, size=800).astype(np.int32)
    raw = bytearray()
    for v in ints:
        raw += int(v & 0xFFFFFF).to_bytes(3, "little")
    p = str(tmp_path / "p24.wav")
    _write_riff(p, fmt_tag=1, width_bytes=3, payload=bytes(raw))
    out, rate = kaldi_io.read_wav(p)
    np.testing.assert_allclose(
        out, ints.astype(np.float32) / (2 ** 31) * 256.0, atol=1e-9)
