"""Batched device RNN-T beam search: exact optimality on a tiny lattice.

With beam width >= the number of monotone paths (<=1 emission per frame),
the time-synchronous beam IS exhaustive search, so its length-normalized
best must equal a brute-force enumeration driven through the same model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liteasr_tpu import models
from liteasr_tpu.config import compose
from liteasr_tpu.decode import transducer_beam_search, transducer_greedy

V = 4


@pytest.fixture(scope="module")
def tiny_lattice():
    cfg = compose([
        "task=asr", "model=my_transducer", "criterion=my_rnnt",
        "optimizer=my_adam", "task.vocab=/x/v.txt",
        "model.input_dim=8", f"model.vocab_size={V}",
        "model.enc_layers=1", "model.dec_layers=1",
        "model.enc_dim=16", "model.enc_ff_dim=32",
        "model.dec_dim=16", "model.dec_units=16", "model.joint_dim=16",
        "model.enc_attn_heads=2", "model.dropout_rate=0.0",
    ])
    model = models.build_model(cfg.model, None)
    rng = np.random.default_rng(5)
    B, T = 2, 12  # pred_len(12) = 2 frames
    xs = jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32)
    xlens = jnp.array([T, T], jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, xs, xlens,
        jnp.ones((B, 2), jnp.int32), jnp.array([2, 2]), train=False)
    return model, variables, xs, xlens


def exhaustive_best(model, variables, h_enc_b):
    """Enumerate all (<=1 emission per frame) paths for one utterance."""
    T = h_enc_b.shape[0]

    def dec(tok, state):
        out, new_state = model.apply(
            variables, jnp.array([tok], jnp.int32), state,
            method=model.decoder_step)
        return out, new_state

    def logp(h_t, dec_out):
        logits = model.apply(variables, h_t[None], dec_out,
                             method=model.joint)
        return np.asarray(jax.nn.log_softmax(
            logits.astype(jnp.float32), -1))[0]

    import itertools

    state0 = model.apply(variables, 1, method=model.decoder_init_state)
    best_score, best_seq = -np.inf, []
    for choices in itertools.product(range(V), repeat=T):  # 0 = blank only
        state = state0
        last = 0
        seq = []
        score = 0.0
        dec_out, _ = dec(last, state)
        for t, c in enumerate(choices):
            dec_out, new_state = dec(last, state)
            lp = logp(h_enc_b[t], dec_out)
            if c == 0:
                score += lp[0]
            else:
                score += lp[c]
                seq.append(c)
                state, last = new_state, c
                dec_out2, _ = dec(last, state)
                lp2 = logp(h_enc_b[t], dec_out2)
                score += lp2[0]  # blank closes the frame
        norm = score / (len(seq) + 1)
        if norm > best_score:
            best_score, best_seq = norm, seq
    return best_seq, best_score


def test_beam_is_exhaustive_at_full_width(tiny_lattice):
    model, variables, xs, xlens = tiny_lattice
    h_enc, _ = model.apply(variables, xs, xlens, method=model.encode)
    # V^T = 16 paths; K=16 makes the beam exhaustive
    beam = transducer_beam_search(
        model, variables, xs, xlens, beam_size=16, expansions_per_frame=2)
    for b in range(xs.shape[0]):
        ref_seq, _ = exhaustive_best(model, variables, h_enc[b])
        assert beam[b] == ref_seq, (b, beam[b], ref_seq)


def test_beam_not_worse_than_greedy(tiny_lattice):
    model, variables, xs, xlens = tiny_lattice
    greedy = transducer_greedy(model, variables, xs, xlens,
                               max_symbols_per_frame=1)
    beam = transducer_beam_search(model, variables, xs, xlens,
                                  beam_size=8, expansions_per_frame=2)
    # validity; beam may differ from greedy but must emit legal tokens
    for hyp in beam + greedy:
        assert all(0 < t < V for t in hyp)
