"""Decoder correctness: the batched compiled CTC prefix beam search must
reproduce the reference's python-dict algorithm (liteasr/models/u2.py:221-267),
which is re-implemented here as a slow oracle."""

import math
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from liteasr_tpu.decode import ctc_greedy, ctc_prefix_beam_search


def log_add(args):
    if all(a == -float("inf") for a in args):
        return -float("inf")
    a_max = max(args)
    return a_max + math.log(sum(math.exp(a - a_max) for a in args))


def oracle_prefix_beam(logp: np.ndarray, beam_size: int):
    """Per-frame dict-based prefix beam search (reference semantics)."""
    cur_hyps = [(tuple(), (0.0, -float("inf")))]
    for t in range(logp.shape[0]):
        row = logp[t]
        next_hyps = defaultdict(lambda: (-float("inf"), -float("inf")))
        top = np.argsort(-row)[:beam_size]
        for s in top:
            s = int(s)
            ps = float(row[s])
            for prefix, (pb, pnb) in cur_hyps:
                last = prefix[-1] if prefix else None
                if s == 0:
                    n_pb, n_pnb = next_hyps[prefix]
                    next_hyps[prefix] = (
                        log_add([n_pb, pb + ps, pnb + ps]), n_pnb)
                elif s == last:
                    n_pb, n_pnb = next_hyps[prefix]
                    next_hyps[prefix] = (n_pb, log_add([n_pnb, pnb + ps]))
                    n_prefix = prefix + (s,)
                    n_pb, n_pnb = next_hyps[n_prefix]
                    next_hyps[n_prefix] = (n_pb, log_add([n_pnb, pb + ps]))
                else:
                    n_prefix = prefix + (s,)
                    n_pb, n_pnb = next_hyps[n_prefix]
                    next_hyps[n_prefix] = (
                        n_pb, log_add([n_pnb, pb + ps, pnb + ps]))
        cur_hyps = sorted(next_hyps.items(),
                          key=lambda x: log_add(list(x[1])),
                          reverse=True)[:beam_size]
    return [(h[0], log_add(list(h[1]))) for h in cur_hyps]


def test_prefix_beam_matches_oracle(rng):
    B, T, V, K = 3, 12, 6, 4
    logits = rng.normal(size=(B, T, V)).astype(np.float32) * 2.0
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    enc_lens = np.array([T, T - 3, T - 6], dtype=np.int32)

    prefixes, plens, scores = ctc_prefix_beam_search(
        jnp.asarray(logp), jnp.asarray(enc_lens), beam_size=K)
    prefixes, plens, scores = map(np.asarray, (prefixes, plens, scores))

    for b in range(B):
        oracle = oracle_prefix_beam(logp[b, :enc_lens[b]], K)
        got = [(tuple(prefixes[b, k][: plens[b, k]].tolist()),
                float(scores[b, k])) for k in range(K)]
        for (o_pre, o_score), (g_pre, g_score) in zip(oracle, got):
            assert o_pre == g_pre, f"batch {b}: {o_pre} != {g_pre}"
            np.testing.assert_allclose(o_score, g_score, rtol=1e-4, atol=1e-4)


def test_prefix_beam_peaked_posteriors(rng):
    """A sharply peaked posterior must decode to its collapsed argmax path."""
    B, T, V, K = 1, 10, 5, 4
    path = [1, 1, 0, 2, 2, 0, 3, 0, 1, 1]  # collapse -> 1 2 3 1
    logits = np.full((B, T, V), -8.0, np.float32)
    for t, s in enumerate(path):
        logits[0, t, s] = 8.0
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    prefixes, plens, scores = ctc_prefix_beam_search(
        jnp.asarray(logp), jnp.array([T]), beam_size=K)
    best = np.asarray(prefixes)[0, 0][: int(np.asarray(plens)[0, 0])]
    assert best.tolist() == [1, 2, 3, 1]


def test_ctc_greedy(rng):
    B, T, V = 2, 8, 5
    path = np.array([
        [1, 1, 0, 2, 0, 3, 3, 0],
        [0, 4, 4, 0, 4, 0, 0, 0],
    ])
    logits = np.full((B, T, V), -8.0, np.float32)
    for b in range(B):
        for t in range(T):
            logits[b, t, path[b, t]] = 8.0
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    ids, keep = ctc_greedy(logp, jnp.array([T, 5]))
    ids, keep = np.asarray(ids), np.asarray(keep)
    assert ids[0][keep[0]].tolist() == [1, 2, 3]
    assert ids[1][keep[1]].tolist() == [4, 4]  # enc_len=5 cuts the tail
