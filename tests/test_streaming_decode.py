"""Streaming chunked decode == offline chunked forward, bit-for-bit-ish.

The offline chunk-trained encoder (static_chunk_size mask, including the
legacy rel_shift wrap for in-chunk lookahead) is the ground truth; the
streaming runtime (liteasr_tpu/streaming.py) must reproduce its hidden
states and its CTC hypotheses exactly.
"""

import jax
import numpy as np
import pytest

from liteasr_tpu import decode, models
from liteasr_tpu.config import compose
from liteasr_tpu.nets.subsampling import subsampled_length
from liteasr_tpu.streaming import streaming_decode

CHUNK_SUB = 8  # emitted subsampled frames per streaming step
N_CHUNKS = 4
T_PAD = 4 * N_CHUNKS * CHUNK_SUB + 4  # offline length with T' == capacity


def _build(use_rel: bool, static_chunk: int = 4):
    cfg = compose([
        "task=asr", "model=U2", "criterion=hybrid_ctc", "optimizer=adam",
        "task.vocab=/x/v.txt",
        "model.input_dim=16", "model.vocab_size=12",
        "model.enc_layers=2", "model.dec_layers=1",
        "model.enc_dim=32", "model.enc_ff_dim=64",
        "model.dec_dim=32", "model.dec_ff_dim=64",
        "model.enc_attn_heads=2", "model.dec_attn_heads=2",
        "model.enc_arch=transformer",
        f"model.use_rel={'true' if use_rel else 'false'}",
        f"model.static_chunk_size={static_chunk}",
    ])
    model = models.build_model(cfg.model, None)
    rng = np.random.default_rng(3)
    B = 2
    xs = rng.normal(size=(B, T_PAD, 16)).astype(np.float32)
    xlens = np.array([T_PAD, T_PAD - 37], np.int32)
    xs[1, xlens[1]:] = 0.0  # offline pipelines mask padding; match bytes
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, xs, np.asarray(xlens),
        np.ones((B, 4), np.int32), np.array([4, 4]), train=False)
    return model, variables, xs, xlens


@pytest.mark.parametrize("use_rel", [True, False])
def test_streaming_matches_offline_encoder(use_rel):
    model, variables, xs, xlens = _build(use_rel)
    h_off, _ = model.apply(variables, xs, np.asarray(xlens),
                           method=model.encode)
    hyps, h_stream = streaming_decode(
        model, variables, xs, xlens, chunk_sub=CHUNK_SUB,
        n_chunks=N_CHUNKS, collect_enc=True)
    h_off = np.asarray(h_off)
    h_stream = np.asarray(h_stream)
    assert h_off.shape == h_stream.shape
    # compare only each row's valid frames (padding rows differ: offline
    # computes garbage under mask, streaming computes different garbage)
    for b, l in enumerate(np.asarray(xlens)):
        ls = subsampled_length(int(l))
        np.testing.assert_allclose(
            h_stream[b, :ls], h_off[b, :ls], rtol=1e-4, atol=1e-5)

    off_hyps = decode.decode_batch(
        model, variables, np.asarray(xs), np.asarray(xlens, np.int32),
        mode="ctc_greedy")
    assert hyps == off_hyps


def test_streaming_prefix_beam_matches_offline():
    model, variables, xs, xlens = _build(use_rel=True)
    h_off, enc_mask = model.apply(variables, xs, np.asarray(xlens),
                                  method=model.encode)
    logits = model.apply(variables, h_off, method=model.ctc_logits)
    logp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=-1)
    enc_lens = np.array([subsampled_length(int(l)) for l in xlens], np.int32)
    prefixes, plens, _ = decode.ctc_prefix_beam_search(
        jax.numpy.asarray(logp), jax.numpy.asarray(enc_lens), beam_size=5)
    off = [np.asarray(prefixes)[b, 0, : int(np.asarray(plens)[b, 0])].tolist()
           for b in range(xs.shape[0])]

    hyps = streaming_decode(
        model, variables, xs, xlens, chunk_sub=CHUNK_SUB, n_chunks=N_CHUNKS,
        mode="ctc_prefix_beam_search", beam_size=5)
    assert hyps == off


def test_streaming_chunk_multiple_of_stage():
    """chunk_sub must be a multiple of static_chunk_size."""
    model, variables, xs, xlens = _build(use_rel=True, static_chunk=3)
    with pytest.raises(AssertionError):
        streaming_decode(model, variables, xs, xlens, chunk_sub=8)
