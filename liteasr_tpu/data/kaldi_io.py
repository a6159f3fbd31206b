"""Pure-numpy Kaldi ark/scp/wav reader-writer.

Covers the subset of the reference's vendored kaldiio that the framework
actually exercises (liteasr/utils/kaldiio/matio.py: `load_mat` :225,
`_parse_arkpath` :244 incl. pipe commands, binary float/double matrices,
compressed matrices :460-556, `save_ark` :643; utils.py `open_like_kaldi`
:162 for `command |` pipes), plus 16-bit PCM wav reading used by
dataclass/audio_data.py:31.

Formats:
* scp line:  ``<uttid> <path>[:<byte-offset>]``
* binary ark entry: ``<uttid> \\0B<token>...`` where token is ``FM`` (float32
  matrix), ``DM`` (float64), ``FV``/``DV`` (vectors), or ``CM`` (compressed
  matrix, format 1).
"""

from __future__ import annotations

import io
import os
import struct
import subprocess
import wave
from typing import Dict, Iterator, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------- low level

def _read_token(f) -> str:
    tok = b""
    while True:
        c = f.read(1)
        if c in (b" ", b""):
            break
        tok += c
    return tok.decode()


def _expect_basic_int(f) -> int:
    size = f.read(1)
    assert size == b"\x04", f"unexpected int size byte {size!r}"
    return struct.unpack("<i", f.read(4))[0]


def _write_basic_int(f, v: int) -> None:
    f.write(b"\x04" + struct.pack("<i", v))


def open_like_kaldi(rxspec: str, mode: str = "rb"):
    """Open a path or a trailing-'|' pipe command like Kaldi rxfilenames."""
    rxspec = rxspec.strip()
    if rxspec.endswith("|"):
        proc = subprocess.Popen(rxspec[:-1], shell=True, stdout=subprocess.PIPE)
        return io.BytesIO(proc.stdout.read())
    return open(rxspec, mode)


# ------------------------------------------------------------- matrix read

def _read_compressed_matrix(f) -> np.ndarray:
    """Kaldi CompressedMatrix format 1 ('CM')."""
    # GlobalHeader: min_value, range (float32), num_rows, num_cols (int32)
    min_value, value_range, num_rows, num_cols = struct.unpack("<ffii", f.read(16))

    # per-column headers: 4 uint16 percentiles
    headers = np.frombuffer(f.read(8 * num_cols), dtype="<u2").reshape(num_cols, 4)
    data = np.frombuffer(f.read(num_rows * num_cols), dtype=np.uint8)
    data = data.reshape(num_cols, num_rows)

    def uint16_to_float(u):
        return min_value + value_range * (u.astype(np.float32) / 65535.0)

    p0 = uint16_to_float(headers[:, 0])[:, None]
    p25 = uint16_to_float(headers[:, 1])[:, None]
    p75 = uint16_to_float(headers[:, 2])[:, None]
    p100 = uint16_to_float(headers[:, 3])[:, None]

    d = data.astype(np.float32)
    out = np.empty((num_cols, num_rows), dtype=np.float32)
    lo = d <= 64
    hi = d > 192
    mid = ~(lo | hi)
    out = np.where(lo, p0 + (p25 - p0) * (d / 64.0), out)
    out = np.where(mid, p25 + (p75 - p25) * ((d - 64.0) / 128.0), out)
    out = np.where(hi, p75 + (p100 - p75) * ((d - 192.0) / 63.0), out)
    return np.ascontiguousarray(out.T)


def read_kaldi(f) -> np.ndarray:
    """Read one object at the current position (after any key)."""
    binary = f.read(2)
    if binary != b"\x00B":
        raise ValueError("only binary Kaldi data is supported "
                         f"(got header {binary!r})")
    token = _read_token(f)
    if token in ("FM", "DM"):
        rows = _expect_basic_int(f)
        cols = _expect_basic_int(f)
        dtype = "<f4" if token == "FM" else "<f8"
        count = rows * cols
        mat = np.frombuffer(f.read(count * np.dtype(dtype).itemsize), dtype=dtype)
        return mat.reshape(rows, cols).astype(np.float32, copy=False)
    if token in ("FV", "DV"):
        dim = _expect_basic_int(f)
        dtype = "<f4" if token == "FV" else "<f8"
        vec = np.frombuffer(f.read(dim * np.dtype(dtype).itemsize), dtype=dtype)
        return vec.astype(np.float32, copy=False)
    if token == "CM":
        return _read_compressed_matrix(f)
    raise ValueError(f"unsupported Kaldi token {token!r}")


def load_mat(ark_path: str) -> np.ndarray:
    """Load one matrix from ``path:offset`` (feats.scp entry) or a bare ark
    path positioned at its first entry's data."""
    path, _, offset = ark_path.rpartition(":")
    if path and offset.isdigit():
        if not path.endswith("|"):  # plain file: try the C++ fast path
            try:
                from liteasr_tpu import native

                mat = native.load_fm(path, int(offset))
                if mat is not None:
                    return mat
            except Exception:
                pass
        with open_like_kaldi(path) as f:
            f.seek(int(offset))
            return read_kaldi(f)
    with open_like_kaldi(ark_path) as f:
        # bare ark: skip the key of the first entry
        _read_token(f)
        return read_kaldi(f)


def load_ark(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    with open_like_kaldi(path) as f:
        while True:
            key = _read_token(f)
            if not key:
                break
            yield key, read_kaldi(f)


def load_scp(path: str) -> Dict[str, str]:
    out = {}
    with open(path) as f:
        for line in f:
            key, _, rx = line.strip().partition(" ")
            out[key] = rx.strip()
    return out


# ------------------------------------------------------------ matrix write

def write_mat(f, mat: np.ndarray) -> int:
    """Write one binary float matrix; returns the data byte offset."""
    f.write(b"\x00B")
    offset = f.tell() - 2
    mat = np.asarray(mat)
    token = b"DM " if mat.dtype == np.float64 else b"FM "
    f.write(token)
    mat = mat.astype("<f8" if token == b"DM " else "<f4", copy=False)
    _write_basic_int(f, mat.shape[0])
    _write_basic_int(f, mat.shape[1])
    f.write(mat.tobytes())
    return offset


def save_ark(
    ark_path: str,
    dict_mats: Dict[str, np.ndarray],
    scp_path: Optional[str] = None,
    append: bool = False,
) -> None:
    """Write matrices to a binary ark (+ optional scp with offsets).

    Mirrors kaldiio.save_ark (liteasr/utils/kaldiio/matio.py:643).
    """
    mode = "ab" if append else "wb"
    scp_f = open(scp_path, "a" if append else "w") if scp_path else None
    with open(ark_path, mode) as f:
        for key, mat in dict_mats.items():
            f.write(key.encode() + b" ")
            offset = write_mat(f, mat)
            if scp_f:
                scp_f.write(f"{key} {os.path.abspath(ark_path)}:{offset}\n")
    if scp_f:
        scp_f.close()


# -------------------------------------------------------------------- wav

def read_wav(path_or_cmd: str) -> Tuple[np.ndarray, int]:
    """Read a (possibly piped) wav file -> (float samples in [-1, 1], rate)."""
    f = open_like_kaldi(path_or_cmd)
    try:
        with wave.open(f, "rb") as w:
            rate = w.getframerate()
            n = w.getnframes()
            width = w.getsampwidth()
            channels = w.getnchannels()
            raw = w.readframes(n)
    finally:
        f.close()
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported wav sample width {width}")
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples, rate


def write_wav(path: str, samples: np.ndarray, rate: int = 16000) -> None:
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
