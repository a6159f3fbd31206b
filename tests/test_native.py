"""C++ native host kernels vs the pure-Python references."""

import numpy as np
import pytest

from liteasr_tpu import native
from liteasr_tpu.data import kaldi_io
from liteasr_tpu.utils.score import _levenshtein_py, levenshtein


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_levenshtein_matches_python(lib, rng):
    cases = [
        ("kitten", "sitting"),
        ("", "abc"),
        ("abc", ""),
        ("same", "same"),
        ("日本語テスト", "日本語のテスト"),
        ([1, 2, 3, 4], [1, 3, 4, 5]),
    ]
    for _ in range(20):
        n, m = rng.integers(0, 30, size=2)
        a = "".join(chr(97 + int(c)) for c in rng.integers(0, 5, n))
        b = "".join(chr(97 + int(c)) for c in rng.integers(0, 5, m))
        cases.append((a, b))
    for a, b in cases:
        assert native.levenshtein(a, b) == _levenshtein_py(a, b)
        assert levenshtein(a, b) == _levenshtein_py(a, b)


def test_native_fm_read_matches_python(lib, tmp_path, rng):
    mats = {f"u{i}": rng.normal(size=(5 + i, 7)).astype(np.float32)
            for i in range(4)}
    ark = str(tmp_path / "n.ark")
    scp = str(tmp_path / "n.scp")
    kaldi_io.save_ark(ark, mats, scp_path=scp)
    for key, rx in kaldi_io.load_scp(scp).items():
        path, _, off = rx.rpartition(":")
        out = native.load_fm(path, int(off))
        assert out is not None
        np.testing.assert_allclose(out, mats[key])
        # and the integrated load_mat path
        np.testing.assert_allclose(kaldi_io.load_mat(rx), mats[key])
