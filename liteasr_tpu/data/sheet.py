"""Kaldi-style manifest parsing (reference: liteasr/dataclass/sheet.py:19-123).

``AudioSheet`` yields ``(uttid, rxspec, start, num_frames)``:
* ``feats.scp`` + ``utt2num_frames``: precomputed features (start=None)
* ``wav.scp`` + ``segments``: utterance slices of 16 kHz recordings
* bare ``wav.scp``: whole recordings (lengths probed by reading the wav)

``TextSheet`` yields ``(uttid, tokenids, text)``; char-level when
``delimiter`` is None.
"""

import os
from typing import Optional

from liteasr_tpu.data import kaldi_io
from liteasr_tpu.data.vocab import Vocab


def _count_lines(path: Optional[str]) -> int:
    if path is None:
        return 0
    with open(path, "r") as f:
        return sum(1 for _ in f)


class AudioSheet:
    def __init__(self, data_dir: str):
        entries = os.listdir(data_dir)
        if "feats.scp" in entries:
            self.scp = os.path.join(data_dir, "feats.scp")
            assert "utt2num_frames" in entries, \
                f"feats.scp without utt2num_frames in {data_dir}"
            self.shape = os.path.join(data_dir, "utt2num_frames")
            self.segments = None
            self.lines = _count_lines(self.scp)
        elif "wav.scp" in entries:
            self.scp = os.path.join(data_dir, "wav.scp")
            self.shape = None
            seg = os.path.join(data_dir, "segments")
            self.segments = seg if "segments" in entries else None
            self.lines = max(_count_lines(self.scp), _count_lines(self.segments))
        else:
            raise FileNotFoundError(f"wav.scp not found in {data_dir}")

    def __iter__(self):
        if self.scp.endswith("feats.scp"):
            with open(self.scp) as fscp, open(self.shape) as fshp:
                for scp_line, shp_line in zip(fscp, fshp):
                    scp_entry = scp_line.strip().split(None, 1)
                    shp_entry = shp_line.strip().split(None, 1)
                    if len(scp_entry) != 2 or len(shp_entry) != 2:
                        raise ValueError(
                            f"Invalid line found:\n>\t{scp_line}\n>\t{shp_line}")
                    uttid, rxspec = scp_entry
                    uttid_, frames = shp_entry
                    assert uttid == uttid_, f"{uttid} != {uttid_}"
                    yield uttid, rxspec, None, int(frames)
        elif self.segments is not None:
            fds = {}
            with open(self.scp) as fscp:
                for line in fscp:
                    entry = line.strip().split(None, 1)
                    if len(entry) != 2:
                        raise ValueError(f"Invalid line is found:\n>   {line}")
                    fds[entry[0]] = entry[1]
            with open(self.segments) as fseg:
                for line in fseg:
                    entry = line.strip().split()
                    if len(entry) != 4:
                        raise ValueError(f"Invalid line is found:\n>   {line}")
                    uttid, wavid, start, end = entry
                    start = round(float(start) * 16000)
                    end = round(float(end) * 16000)
                    yield uttid, fds[wavid], start, end - start - 1
        else:
            with open(self.scp) as fscp:
                for line in fscp:
                    entry = line.strip().split(None, 1)
                    if len(entry) != 2:
                        raise ValueError(f"Invalid line is found:\n>   {line}")
                    uttid, rxspec = entry
                    samples, _ = kaldi_io.read_wav(rxspec)
                    yield uttid, rxspec, 0, len(samples)

    def __len__(self):
        return self.lines


class TextSheet:
    def __init__(self, data_dir: str, vocab: Vocab,
                 delimiter: Optional[str] = None):
        self.text = os.path.join(data_dir, "text")
        self.vocab = vocab
        self.delimiter = delimiter
        self.lines = _count_lines(self.text)

    def __iter__(self):
        with open(self.text) as ftxt:
            for line in ftxt:
                uttid, text = line.strip().split(maxsplit=1)
                tokens = text.split(self.delimiter)
                if self.delimiter is None:
                    tokenids = self.vocab.lookup(tokens[0])
                else:
                    tokenids = self.vocab.lookup(tokens)
                yield uttid, tokenids, text

    def __len__(self):
        return self.lines
