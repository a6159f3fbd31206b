"""Test config: force CPU backend with 8 virtual devices so pjit/psum tests
run without TPU hardware (SURVEY.md §4)."""

import os

# NOTE: must be a hard assignment — the environment's sitecustomize pins
# JAX_PLATFORMS to the TPU plugin, and setdefault would keep it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the env's sitecustomize registers the TPU plugin before conftest runs;
# jax.config.update is the reliable way to pin the CPU backend afterwards
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """Synthetic Kaldi-format corpus: feats.scp + utt2num_frames + text + vocab."""
    root = tmp_path_factory.mktemp("corpus")
    from liteasr_tpu.data import kaldi_io

    rng = np.random.default_rng(42)
    vocab_path = root / "vocab.txt"
    tokens = ["<unk>"] + [chr(ord("a") + i) for i in range(26)] + ["<space>"]
    vocab_path.write_text(
        "".join(f"{t} {i + 1}\n" for i, t in enumerate(tokens)))

    def make_split(name, n_utt, min_t=20, max_t=60):
        d = root / name
        d.mkdir()
        mats, texts, frames = {}, [], []
        for i in range(n_utt):
            t = int(rng.integers(min_t, max_t))
            uttid = f"{name}_utt{i:03d}"
            mats[uttid] = rng.normal(size=(t, 16)).astype(np.float32)
            length = int(rng.integers(3, 8))
            word = "".join(
                chr(ord("a") + int(c)) for c in rng.integers(0, 26, length))
            texts.append(f"{uttid} {word}")
            frames.append(f"{uttid} {t}")
        kaldi_io.save_ark(str(d / "feats.ark"), mats,
                          scp_path=str(d / "feats.scp"))
        (d / "utt2num_frames").write_text("\n".join(frames) + "\n")
        (d / "text").write_text("\n".join(texts) + "\n")
        return d

    make_split("train", 12)
    make_split("valid", 4)
    make_split("test", 4)
    return root
