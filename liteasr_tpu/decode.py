"""Batched decoding as compiled loops.

Reference algorithms: liteasr/models/u2.py —
* attention beam search :164-219 (per-step topk^2 merge, eos end flags)
* CTC prefix beam search :221-267 (python dict of prefix hypotheses per frame)
* attention rescoring :269-317 (decoder-rescore the CTC n-best, ctc weight 0.5)

TPU-native redesign: everything is fixed-shape and jittable.
* CTC prefix beam search keeps a beam of K prefixes as dense (K, Lmax) token
  arrays. The reference's dict merge becomes: expand K*(P+1) candidates per
  frame, identify equal prefixes by a pair of 32-bit rolling hashes, sort +
  segment-logsumexp to merge duplicates, then top-K. One ``lax.scan`` over
  frames, ``vmap`` over the batch — the whole test set decodes in a few
  device batches instead of the reference's multiprocessing.Pool.
* Attention beam search carries (B, K, Lmax) hypotheses through a scan; each
  step recomputes the decoder over the fixed-length prefix (static shapes beat
  a python KV-cache on TPU at these lengths).
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from liteasr_tpu.parallel.mesh import to_host

NEG_INF = -1e30

_H1_MULT = np.uint32(1000003)
_H2_MULT = np.uint32(69069)


def _logadd(a, b):
    return jnp.logaddexp(a, b)


def _hash_extend(h1, h2, tok):
    t = tok.astype(jnp.uint32) + jnp.uint32(1)
    return h1 * _H1_MULT + t, h2 * _H2_MULT + t


def _segment_logsumexp(scores, segment_ids, num_segments):
    seg_max = jax.ops.segment_max(
        scores, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(seg_max <= NEG_INF, 0.0, seg_max)
    shifted = jnp.exp(scores - seg_max[segment_ids])
    shifted = jnp.where(scores <= NEG_INF, 0.0, shifted)
    seg_sum = jax.ops.segment_sum(
        shifted, segment_ids, num_segments=num_segments)
    out = seg_max + jnp.log(jnp.maximum(seg_sum, 1e-38))
    return jnp.where(seg_sum <= 0.0, NEG_INF, out)


# --------------------------------------------------------------------------
# CTC prefix beam search
# --------------------------------------------------------------------------

def _ctc_prefix_step(state, inputs, beam_size: int, blank: int, max_len: int):
    """One frame of prefix beam search for ONE utterance (vmapped over B)."""
    prefixes, plens, last, h1, h2, pb, pnb = state
    logp_t, active = inputs  # (V,), scalar bool
    K = beam_size
    P = beam_size  # top-P tokens considered per frame (reference u2.py:230)

    ps, toks = jax.lax.top_k(logp_t, P)  # (P,)

    # ---- stay candidates (K): prefix unchanged
    blank_in = toks == blank  # (P,)
    ps_blank = jnp.max(jnp.where(blank_in, ps, NEG_INF))
    stay_pb = _logadd(pb + ps_blank, pnb + ps_blank)  # (K,)
    rep_in = toks[None, :] == last[:, None]  # (K, P)
    ps_rep = jnp.max(jnp.where(rep_in, ps[None, :], NEG_INF), axis=1)  # (K,)
    stay_pnb = pnb + ps_rep

    # ---- extend candidates (K, P): prefix + tok
    is_blank_tok = toks == blank  # (P,)
    is_rep = rep_in  # (K, P) tok == last -> comes from pb only
    ext_pnb = jnp.where(
        is_rep,
        pb[:, None] + ps[None, :],
        _logadd(pb[:, None] + ps[None, :], pnb[:, None] + ps[None, :]),
    )
    ext_pnb = jnp.where(is_blank_tok[None, :], NEG_INF, ext_pnb)
    ext_pnb = jnp.where(plens[:, None] >= max_len, NEG_INF, ext_pnb)
    eh1, eh2 = _hash_extend(h1[:, None], h2[:, None],
                            jnp.broadcast_to(toks[None, :], (K, P)))
    # dead extend candidates must not hash-collide with anything real
    dead = ext_pnb <= NEG_INF
    salt = (jnp.arange(K * P, dtype=jnp.uint32).reshape(K, P)
            + jnp.uint32(0xA5A50000))
    eh1 = jnp.where(dead, salt, eh1)
    eh2 = jnp.where(dead, salt * _H2_MULT, eh2)

    # ---- flatten candidates: N = K + K*P
    N = K + K * P
    cand_h1 = jnp.concatenate([h1, eh1.reshape(-1)])
    cand_h2 = jnp.concatenate([h2, eh2.reshape(-1)])
    cand_pb = jnp.concatenate([stay_pb, jnp.full((K * P,), NEG_INF)])
    cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(-1)])
    cand_parent = jnp.concatenate([
        jnp.arange(K), jnp.repeat(jnp.arange(K), P)])
    cand_tok = jnp.concatenate([
        jnp.full((K,), -1, jnp.int32),
        jnp.broadcast_to(toks[None, :], (K, P)).reshape(-1).astype(jnp.int32)])

    # ---- merge duplicates: sort by (h1, h2), segment-logsumexp
    order = jnp.lexsort((cand_h2, cand_h1))
    s_h1, s_h2 = cand_h1[order], cand_h2[order]
    s_pb, s_pnb = cand_pb[order], cand_pnb[order]
    is_first = jnp.concatenate([
        jnp.array([True]),
        (s_h1[1:] != s_h1[:-1]) | (s_h2[1:] != s_h2[:-1])])
    seg_ids = jnp.cumsum(is_first) - 1  # (N,)
    seg_pb = _segment_logsumexp(s_pb, seg_ids, N)
    seg_pnb = _segment_logsumexp(s_pnb, seg_ids, N)
    # representative candidate = first of each segment
    rep_idx = jax.ops.segment_min(
        jnp.arange(N), seg_ids, num_segments=N)  # (N,) into sorted order
    seg_count = jax.ops.segment_sum(jnp.ones(N, jnp.int32), seg_ids, N)
    seg_valid = seg_count > 0

    seg_score = _logadd(seg_pb, seg_pnb)
    seg_score = jnp.where(seg_valid, seg_score, NEG_INF)
    top_score, top_seg = jax.lax.top_k(seg_score, K)

    sel_sorted = rep_idx[top_seg]  # index into sorted candidates
    sel = order[jnp.clip(sel_sorted, 0, N - 1)]  # index into raw candidates
    sel_parent = cand_parent[sel]
    sel_tok = cand_tok[sel]

    new_pb = seg_pb[top_seg]
    new_pnb = seg_pnb[top_seg]
    new_h1 = cand_h1[sel]
    new_h2 = cand_h2[sel]

    parent_prefix = prefixes[sel_parent]  # (K, Lmax)
    parent_len = plens[sel_parent]
    parent_last = last[sel_parent]
    is_ext = sel_tok >= 0
    pos = jnp.arange(max_len)[None, :]
    new_prefixes = jnp.where(
        (pos == parent_len[:, None]) & is_ext[:, None],
        sel_tok[:, None], parent_prefix)
    new_plens = parent_len + is_ext.astype(parent_len.dtype)
    new_last = jnp.where(is_ext, sel_tok, parent_last)

    new_state = (new_prefixes, new_plens, new_last, new_h1, new_h2,
                 new_pb, new_pnb)
    old_state = (prefixes, plens, last, h1, h2, pb, pnb)
    return jax.tree.map(
        lambda n, o: jnp.where(
            jnp.reshape(active, (1,) * n.ndim), n, o), new_state, old_state)


def ctc_prefix_beam_search(
    ctc_logp: jnp.ndarray,
    enc_lens: jnp.ndarray,
    beam_size: int = 10,
    blank: int = 0,
    max_len: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched prefix beam search over CTC posteriors.

    :param ctc_logp: (B, T', V) log-softmax CTC output
    :param enc_lens: (B,) valid frames
    :return: (prefixes (B, K, Lmax), lens (B, K), scores (B, K)) sorted by
        score descending — the n-best list the attention rescorer consumes.
    """
    B, T, V = ctc_logp.shape
    K = beam_size
    Lmax = max_len or T

    step = partial(_ctc_prefix_step, beam_size=K, blank=blank, max_len=Lmax)
    vstep = jax.vmap(step)

    def scan_body(state, t):
        active = t < enc_lens  # (B,)
        new_state = vstep(state, (ctc_logp[:, t], active))
        return new_state, None

    state = ctc_prefix_beam_init(B, K, Lmax)
    state, _ = jax.lax.scan(scan_body, state, jnp.arange(T))
    return ctc_prefix_beam_finalize(state)


def ctc_prefix_beam_init(B: int, K: int, max_len: int):
    """Fresh prefix-beam carry (also the stream-step carry, streaming.py)."""
    prefixes = jnp.zeros((B, K, max_len), jnp.int32)
    plens = jnp.zeros((B, K), jnp.int32)
    last = jnp.full((B, K), -1, jnp.int32)
    h1 = (jnp.arange(K, dtype=jnp.uint32)[None, :]
          + jnp.uint32(0x5EED0001)) * jnp.uint32(2654435761)
    h1 = jnp.broadcast_to(h1, (B, K))
    h2 = h1 ^ jnp.uint32(0x9E3779B9)
    # only beam 0 (empty prefix) is live initially
    pb = jnp.full((B, K), NEG_INF).at[:, 0].set(0.0)
    pnb = jnp.full((B, K), NEG_INF)
    # beam 0's true empty hash
    h1 = h1.at[:, 0].set(jnp.uint32(17))
    h2 = h2.at[:, 0].set(jnp.uint32(29))
    return (prefixes, plens, last, h1, h2, pb, pnb)


def ctc_prefix_beam_finalize(state):
    """Sort a prefix-beam carry by total score descending."""
    prefixes, plens, last, h1, h2, pb, pnb = state
    scores = _logadd(pb, pnb)
    order = jnp.argsort(-scores, axis=1)
    return (
        jnp.take_along_axis(prefixes, order[:, :, None], axis=1),
        jnp.take_along_axis(plens, order, axis=1),
        jnp.take_along_axis(scores, order, axis=1),
    )


# --------------------------------------------------------------------------
# Attention rescoring (batched over utterances AND hypotheses)
# --------------------------------------------------------------------------

def attention_rescore(
    model,
    variables,
    h_enc: jnp.ndarray,
    enc_mask: jnp.ndarray,
    prefixes: jnp.ndarray,
    plens: jnp.ndarray,
    ctc_scores: jnp.ndarray,
    ctc_weight: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pick the best CTC n-best hypothesis by decoder log-prob + ctc score.

    Reference: liteasr/models/u2.py:269-317 (sos prepend, eos append, sum of
    per-token decoder log-probs + 0.5 * ctc score).
    Returns (best hyp tokens (B, Lmax), best lens (B,)).
    """
    B, K, Lmax = prefixes.shape
    sos = model.sos
    eos = model.eos

    flat = prefixes.reshape(B * K, Lmax)
    flens = plens.reshape(B * K)
    ys_in = jnp.concatenate(
        [jnp.full((B * K, 1), sos, jnp.int32), flat], axis=1)  # (BK, L+1)

    from liteasr_tpu.ops.masks import padding_mask, triangle_mask

    pad = padding_mask(flens + 1, Lmax + 1)
    causal = triangle_mask(Lmax + 1).astype(bool)
    mask = pad[:, None, :] | causal[None]

    mem = jnp.repeat(h_enc, K, axis=0)  # (BK, T', D)
    mem_mask = jnp.repeat(enc_mask, K, axis=0)

    logits = model.apply(
        variables, ys_in, mem, mask, mem_mask,
        method=model.decode_logits)  # (BK, L+1, V)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # sum_j logp[j, y_j] over the hypothesis + logp[len, eos]
    tok_logp = jnp.take_along_axis(
        logp[:, :Lmax], flat[:, :, None], axis=2)[:, :, 0]  # (BK, Lmax)
    pos = jnp.arange(Lmax)[None, :]
    tok_logp = jnp.where(pos < flens[:, None], tok_logp, 0.0)
    att_score = tok_logp.sum(axis=1)
    eos_logp = jnp.take_along_axis(
        logp, flens[:, None, None] * jnp.ones((1, 1, 1), jnp.int32),
        axis=1)[:, 0, eos]
    att_score = att_score + eos_logp

    total = att_score.reshape(B, K) + ctc_weight * ctc_scores
    # dead beams (score=-inf) must never win
    total = jnp.where(ctc_scores <= NEG_INF / 2, -jnp.inf, total)
    best = jnp.argmax(total, axis=1)  # (B,)
    best_hyp = jnp.take_along_axis(
        prefixes, best[:, None, None], axis=1)[:, 0]
    best_len = jnp.take_along_axis(plens, best[:, None], axis=1)[:, 0]
    return best_hyp, best_len


# --------------------------------------------------------------------------
# Attention beam search
# --------------------------------------------------------------------------

def attention_beam_search(
    model,
    variables,
    h_enc: jnp.ndarray,
    enc_mask: jnp.ndarray,
    beam_size: int = 10,
    max_decode_len: Optional[int] = None,
    use_cache: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched attention beam search (reference u2.py:164-219).

    ``use_cache=True`` (default) carries per-layer decoder K/V through the
    scan and primes the source K/V once, so each step costs O(L) decoder
    FLOPs instead of the O(L^2) full-prefix recompute — the TPU re-design of
    the reference's python step cache (transformer_layer.py:40-47). The
    recompute path is kept for equivalence testing.

    Returns (best tokens (B, L), lens (B,)) — tokens exclude sos/eos.
    """
    B, T, _ = h_enc.shape
    K = beam_size
    L = max_decode_len or T
    sos, eos = model.sos, model.eos

    hyps = jnp.full((B, K, L + 1), eos, jnp.int32).at[:, :, 0].set(sos)
    scores = jnp.full((B, K), -jnp.inf).at[:, 0].set(0.0)
    end_flag = jnp.zeros((B, K), bool)

    mem = jnp.repeat(h_enc, K, axis=0)
    mem_mask = jnp.repeat(enc_mask, K, axis=0)

    from liteasr_tpu.ops.masks import triangle_mask

    causal = triangle_mask(L + 1).astype(bool)[None]  # (1, L+1, L+1)
    init_scores = jnp.concatenate(
        [jnp.zeros((1,)), jnp.full((K - 1,), -jnp.inf)])

    if use_cache:
        src_kv = model.apply(variables, mem, method=model.decode_prime)
        n_head, d_k = src_kv[0][0].shape[2], src_kv[0][0].shape[3]
        cache_dtype = src_kv[0][0].dtype
        self_caches = [
            {"k": jnp.zeros((B * K, L + 1, n_head, d_k), cache_dtype),
             "v": jnp.zeros((B * K, L + 1, n_head, d_k), cache_dtype)}
            for _ in range(len(src_kv))
        ]

    def merge(hyps, scores, end_flag, logp_i, i):
        """Shared top-k^2 beam merge; returns new state + source beams."""
        score_topk, index_topk = jax.lax.top_k(logp_i, K)  # (BK, K)
        score_topk = score_topk.reshape(B, K, K)
        index_topk = index_topk.reshape(B, K, K)
        # finished beams: only candidate is (eos, +0)
        score_topk = jnp.where(
            end_flag[:, :, None], init_scores[None, None, :], score_topk)
        index_topk = jnp.where(end_flag[:, :, None], eos, index_topk)

        comb = (scores[:, :, None] + score_topk).reshape(B, K * K)
        new_scores, idx = jax.lax.top_k(comb, K)  # (B, K)
        src_beam = idx // K

        new_tok = jnp.take_along_axis(
            index_topk.reshape(B, K * K), idx, axis=1)  # (B, K)
        new_hyps = jnp.take_along_axis(
            hyps, src_beam[:, :, None], axis=1)  # (B, K, L+1)
        pos = jnp.arange(L + 1)[None, None, :]
        new_hyps = jnp.where(pos == i, new_tok[:, :, None], new_hyps)
        new_end = new_tok == eos
        return new_hyps, new_scores, new_end, src_beam

    def step_recompute(carry, i):
        hyps, scores, end_flag = carry
        flat = hyps.reshape(B * K, L + 1)
        logits = model.apply(
            variables, flat, mem, causal, mem_mask,
            method=model.decode_logits)  # (BK, L+1, V)
        logp_i = jax.nn.log_softmax(
            jnp.take_along_axis(
                logits, (i - 1) * jnp.ones((B * K, 1, 1), jnp.int32),
                axis=1)[:, 0].astype(jnp.float32), axis=-1)  # (BK, V)
        new_hyps, new_scores, new_end, _ = merge(
            hyps, scores, end_flag, logp_i, i)
        return (new_hyps, new_scores, new_end), None

    def step_cached(carry, i):
        hyps, scores, end_flag, caches = carry
        tok = jnp.take_along_axis(
            hyps, jnp.broadcast_to((i - 1)[None, None, None], (B, K, 1)),
            axis=2)[:, :, 0]  # (B, K): token at position i-1
        logits, new_caches = model.apply(
            variables, tok.reshape(B * K), src_kv, caches, i - 1, mem_mask,
            method=model.decode_step)
        logp_i = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        new_hyps, new_scores, new_end, src_beam = merge(
            hyps, scores, end_flag, logp_i, i)

        def regather(c):  # beam-reorder the cache rows along with the hyps
            c_b = c.reshape(B, K, *c.shape[1:])
            idx = src_beam.reshape(B, K, *([1] * (c_b.ndim - 2)))
            c_b = jnp.take_along_axis(c_b, idx, axis=1)
            return c_b.reshape(B * K, *c.shape[1:])

        new_caches = jax.tree.map(regather, new_caches)
        return (new_hyps, new_scores, new_end, new_caches), None

    if use_cache:
        (hyps, scores, end_flag, _), _ = jax.lax.scan(
            step_cached, (hyps, scores, end_flag, self_caches),
            jnp.arange(1, L + 1))
    else:
        (hyps, scores, end_flag), _ = jax.lax.scan(
            step_recompute, (hyps, scores, end_flag), jnp.arange(1, L + 1))

    best = jnp.argmax(scores, axis=1)
    best_hyp = jnp.take_along_axis(hyps, best[:, None, None], axis=1)[:, 0]
    # strip sos; length = position of first eos
    body = best_hyp[:, 1:]
    is_eos = body == eos
    lens = jnp.where(
        is_eos.any(axis=1), jnp.argmax(is_eos, axis=1), body.shape[1])
    return body, lens


# --------------------------------------------------------------------------
# Greedy CTC + host-side helpers
# --------------------------------------------------------------------------

def ctc_greedy(ctc_logp: jnp.ndarray, enc_lens: jnp.ndarray, blank: int = 0):
    """Argmax collapse decode. Returns (tokens (B, T'), mask (B, T'))."""
    ids = jnp.argmax(ctc_logp, axis=-1)  # (B, T')
    prev = jnp.concatenate(
        [jnp.full((ids.shape[0], 1), -1, ids.dtype), ids[:, :-1]], axis=1)
    T = ids.shape[1]
    pos = jnp.arange(T)[None, :]
    keep = (ids != blank) & (ids != prev) & (pos < enc_lens[:, None])
    return ids, keep


def tokens_to_list(tokens: np.ndarray, length: int) -> list:
    return [int(t) for t in np.asarray(tokens)[:int(length)]]


# jitted end-to-end decode pipelines, cached per (model, mode, knobs) —
# without this every model.apply outside jit dispatches op-by-op, which
# dominates decode latency
_PIPELINE_CACHE: dict = {}


def _get_pipeline(model, mode: str, beam_size: int, ctc_weight: float):
    # flax modules are frozen dataclasses: hashable, value-equal keys
    key = (model, mode, beam_size, ctc_weight)
    fn = _PIPELINE_CACHE.get(key)
    if fn is not None:
        return fn

    def pipeline(variables, xs, xlens):
        h_enc, enc_mask = model.apply(
            variables, xs, xlens, method=model.encode)
        enc_lens = model.get_pred_len(xlens)
        ctc_logp = jax.nn.log_softmax(
            model.apply(variables, h_enc,
                        method=model.ctc_logits).astype(jnp.float32), axis=-1)
        if mode == "ctc_greedy":
            return ctc_greedy(ctc_logp, enc_lens)
        prefixes, plens, scores = ctc_prefix_beam_search(
            ctc_logp, enc_lens, beam_size=beam_size)
        if mode == "ctc_prefix_beam_search":
            return prefixes[:, 0], plens[:, 0]
        if mode == "attention":
            return attention_beam_search(
                model, variables, h_enc, enc_mask, beam_size=beam_size)
        assert mode == "attention_rescore", mode
        return attention_rescore(
            model, variables, h_enc, enc_mask, prefixes, plens, scores,
            ctc_weight=ctc_weight)

    fn = jax.jit(pipeline)
    _PIPELINE_CACHE[key] = fn
    return fn


def paraformer_decode(model, variables, xs, xlens):
    """Non-autoregressive CIF + argmax decode (paraformer.py:157-168),
    jitted end-to-end and cached per padded length — the eager
    ``model.apply`` path dispatches op-by-op through the remote tunnel."""
    u_max = max(((xs.shape[1] - 1) // 2 - 1) // 2, 1)  # == get_pred_len(T)
    key = (model, "paraformer_cif", u_max)
    fn = _PIPELINE_CACHE.get(key)
    if fn is None:
        def pipeline(variables, xs, xlens):
            return model.apply(variables, xs, xlens, u_max=u_max,
                               method=model.decode)

        fn = jax.jit(pipeline)
        _PIPELINE_CACHE[key] = fn
    hyp, ulens = fn(variables, xs, xlens)
    hyp, ulens = to_host(hyp), to_host(ulens)
    return [hyp[i, : ulens[i]].tolist() for i in range(hyp.shape[0])]


def decode_batch(model, variables, xs, xlens, beam_size: int = 10,
                 ctc_weight: float = 0.5, mode: str = "attention_rescore"):
    """Decode a padded batch of utterances. Returns list of token-id lists."""
    pipeline = _get_pipeline(model, mode, beam_size, ctc_weight)
    out = pipeline(variables, xs, xlens)

    if mode == "ctc_greedy":
        ids, keep = (to_host(x) for x in out)
        return [ids[b][keep[b]].tolist() for b in range(ids.shape[0])]

    if mode == "attention":
        hyp, lens = (to_host(x) for x in out)
        return [[int(t) for t in hyp[b][:int(lens[b])] if t != model.eos]
                for b in range(hyp.shape[0])]

    best_hyp, best_len = (to_host(x) for x in out)
    return [tokens_to_list(best_hyp[b], best_len[b])
            for b in range(best_hyp.shape[0])]


def decode_utterance(model, variables, x, mode: str = "attention_rescore",
                     beam_size: int = 10, ctc_weight: float = 0.5):
    """Single-utterance decode (trainer inference trigger / ad-hoc use).
    Dispatches on the model family."""
    xs = jnp.asarray(x)
    if xs.ndim == 2:
        xs = xs[None]
    xlens = jnp.array([xs.shape[1]], jnp.int32)
    if hasattr(model, "joint"):  # transducer
        return transducer_beam_search(
            model, variables, xs, xlens, beam_size=beam_size)[0]
    if hasattr(model, "decode"):  # paraformer: CIF + argmax
        # ("predictor" is a setup attribute, invisible on unbound modules;
        # the class-level decode method is the marker)
        t_sub = int(model.get_pred_len(xlens)[0])
        hyp, ulens = model.apply(
            variables, xs, xlens, u_max=max(t_sub, 1), method=model.decode)
        return tokens_to_list(np.asarray(hyp)[0], int(np.asarray(ulens)[0]))
    return decode_batch(model, variables, xs, xlens, beam_size=beam_size,
                        ctc_weight=ctc_weight, mode=mode)[0]


# --------------------------------------------------------------------------
# Transducer decoding
# --------------------------------------------------------------------------

def transducer_greedy(model, variables, xs, xlens,
                      max_symbols_per_frame: int = 3,
                      max_output_len: Optional[int] = None):
    """Batched greedy RNN-T decode as one compiled scan over frames.

    Replaces the reference's python per-frame hypothesis loop
    (liteasr/models/transducer.py:137-206) for the fast path: at each encoder
    frame, up to ``max_symbols_per_frame`` tokens are emitted (statically
    unrolled), the LSTM prediction-network state advancing only on emission.
    Returns a list of token-id lists.
    """
    B = xs.shape[0]
    T_sub = int(model.get_pred_len(jnp.array([xs.shape[1]]))[0])
    Lmax = max_output_len or T_sub * max_symbols_per_frame

    def run(variables, xs, xlens):
        h_enc, _ = model.apply(variables, xs, xlens, method=model.encode)
        enc_lens = model.get_pred_len(xlens)
        T = h_enc.shape[1]
        state0 = model.apply(variables, B, method=model.decoder_init_state)
        last0 = jnp.zeros((B,), jnp.int32)  # blank starts the prediction net
        buf0 = jnp.zeros((B, Lmax), jnp.int32)
        len0 = jnp.zeros((B,), jnp.int32)

        def frame(carry, t):
            state, last, buf, length = carry
            h_t = jax.lax.dynamic_index_in_dim(
                h_enc, t, axis=1, keepdims=False)  # (B, D)
            active0 = t < enc_lens

            for _ in range(max_symbols_per_frame):
                dec_out, new_state = model.apply(
                    variables, last, state, method=model.decoder_step)
                logits = model.apply(
                    variables, h_t, dec_out, method=model.joint)  # (B, V)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                emit = (tok != 0) & active0 & (length < Lmax)
                # on emission: write token, bump length, advance state
                buf = jnp.where(
                    (jnp.arange(Lmax)[None, :] == length[:, None])
                    & emit[:, None], tok[:, None], buf)
                length = length + emit.astype(jnp.int32)
                last = jnp.where(emit, tok, last)
                state = jax.tree.map(
                    lambda n, o: jnp.where(
                        emit.reshape((-1,) + (1,) * (n.ndim - 1)), n, o),
                    new_state, state)
                active0 = active0 & emit  # stop the frame on first blank

            return (state, last, buf, length), None

        (_, _, buf, length), _ = jax.lax.scan(
            frame, (state0, last0, buf0, len0), jnp.arange(T))
        return buf, length

    # B and Lmax are baked into the closure -> must key the cache on them
    key = (model, "transducer_greedy", max_symbols_per_frame, B, Lmax)
    fn = _PIPELINE_CACHE.get(key)
    if fn is None:
        fn = jax.jit(run)
        _PIPELINE_CACHE[key] = fn
    buf, length = fn(variables, xs, xlens)
    buf, length = to_host(buf), to_host(length)
    return [buf[b, : length[b]].tolist() for b in range(B)]


def transducer_beam_search_utt(model, variables, x,
                               beam_size: int = 10,
                               max_symbols_per_frame: int = 5):
    """Reference-semantics transducer beam search for one utterance
    (liteasr/models/transducer.py:137-206): per-frame best-first expansion
    with a prediction-network state cache keyed by the emitted prefix,
    length-normalized final pick. Host loop drives jitted steps."""
    xs = jnp.asarray(x)
    if xs.ndim == 2:
        xs = xs[None]
    xlens = jnp.array([xs.shape[1]], jnp.int32)
    h_enc, _ = model.apply(variables, xs, xlens, method=model.encode)
    T = int(model.get_pred_len(xlens)[0])

    step_fn = jax.jit(lambda tok, state: model.apply(
        variables, tok, state, method=model.decoder_step))
    joint_fn = jax.jit(lambda h, d: jax.nn.log_softmax(
        model.apply(variables, h, d, method=model.joint), axis=-1))

    state0 = model.apply(variables, 1, method=model.decoder_init_state)
    hyps = [{"score": 0.0, "yseq": [0], "state": state0}]
    cache = {}

    for t in range(T):
        h_t = h_enc[:, t]  # (1, D)
        frontier = hyps
        kept = []
        steps = 0
        while len(kept) < beam_size and frontier and steps < 100:
            steps += 1
            best = max(frontier, key=lambda h: h["score"])
            frontier.remove(best)
            key = tuple(best["yseq"])
            if key in cache:
                dec_out, new_state = cache[key]
            else:
                tok = jnp.array([best["yseq"][-1]], jnp.int32)
                dec_out, new_state = step_fn(tok, best["state"])
                cache[key] = (dec_out, new_state)
            logp = np.asarray(joint_fn(h_t, dec_out))[0]  # (V,)
            order = np.argsort(-logp)[: beam_size + 1]
            for k in order:
                k = int(k)
                cand = {
                    "score": best["score"] + float(logp[k]),
                    "yseq": list(best["yseq"]),
                    "state": best["state"],
                }
                if k == 0:
                    kept.append(cand)
                else:
                    cand["yseq"].append(k)
                    cand["state"] = new_state
                    frontier.append(cand)
        if not kept:  # expansion cap hit before any blank: keep the frontier
            kept = frontier if frontier else hyps
        hyps = sorted(kept, key=lambda h: h["score"], reverse=True)[:beam_size]
        cache = {}

    best = max(hyps, key=lambda h: h["score"] / max(len(h["yseq"]), 1))
    return best["yseq"][1:]  # strip leading blank


def transducer_beam_search(model, variables, xs, xlens,
                           beam_size: int = 10,
                           expansions_per_frame: int = 5,
                           max_output_len: Optional[int] = None):
    """Batched time-synchronous RNN-T beam search, fully on device.

    A fixed-shape reformulation of the reference's per-frame best-first
    expansion (liteasr/models/transducer.py:137-206): each frame runs up to
    ``expansions_per_frame`` emission rounds where every beam proposes a
    blank candidate (ends the frame; merged into a top-K finished set) and
    top-K non-blank extensions (advance the prediction network). The
    reference's while-loop expands until ``beam_size`` blanks are
    collected, so label-dense frames may emit several symbols; capping
    emissions at 1/frame (the old default, E=2 rounds) measurably starved
    dense corpora (+4.45pp vs greedy, BENCHMARKS.md round 5) — the default
    now matches ``transducer_greedy``'s ``max_symbols_per_frame=5``.
    Final pick is length-normalized like the reference (:203-205). No
    prefix merging — matching the reference, which also keeps duplicate
    prefixes apart.

    Returns a list of token-id lists.
    """
    B = xs.shape[0]
    K = beam_size
    E = max(1, expansions_per_frame)
    T_sub = int(model.get_pred_len(jnp.array([xs.shape[1]]))[0])
    Lmax = max_output_len or T_sub * E

    def gather_k(tree, idx):
        """Gather (B, K, ...) leaves along axis 1 with idx (B, K)."""
        def g(x):
            ii = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
            return jnp.take_along_axis(x, ii.astype(jnp.int32), axis=1)
        return jax.tree.map(g, tree)

    def run(variables, xs, xlens):
        h_enc, _ = model.apply(variables, xs, xlens, method=model.encode)
        enc_lens = model.get_pred_len(xlens)
        T = h_enc.shape[1]

        state0 = model.apply(variables, B * K, method=model.decoder_init_state)
        lstm0 = jax.tree.map(
            lambda x: x.reshape(B, K, *x.shape[1:]), state0)
        beams = {
            "tokens": jnp.zeros((B, K, Lmax), jnp.int32),
            "lens": jnp.zeros((B, K), jnp.int32),
            "last": jnp.zeros((B, K), jnp.int32),
            "scores": jnp.full((B, K), -jnp.inf).at[:, 0].set(0.0),
            "lstm": lstm0,
        }

        def frame(beams, t):
            h_t = jax.lax.dynamic_index_in_dim(
                h_enc, t, axis=1, keepdims=False)  # (B, D)
            active = (t < enc_lens)[:, None]  # (B, 1)

            fin = dict(beams)
            fin["scores"] = jnp.full((B, K), -jnp.inf)
            cur = beams

            for e in range(E + 1):
                flat_last = cur["last"].reshape(B * K)
                flat_lstm = jax.tree.map(
                    lambda x: x.reshape(B * K, *x.shape[2:]), cur["lstm"])
                dec_out, new_lstm_flat = model.apply(
                    variables, flat_last, flat_lstm,
                    method=model.decoder_step)
                new_lstm = jax.tree.map(
                    lambda x: x.reshape(B, K, *x.shape[1:]), new_lstm_flat)
                logits = model.apply(
                    variables, h_t[:, None, :], dec_out.reshape(B, K, -1),
                    method=model.joint)  # (B, K, V)
                logp = jax.nn.log_softmax(
                    logits.astype(jnp.float32), axis=-1)

                # blank candidates -> finished set (2K -> K merge)
                cand = dict(cur)
                cand["scores"] = cur["scores"] + logp[:, :, 0]
                merged = {
                    key: jnp.concatenate([fin[key], cand[key]], axis=1)
                    if key != "lstm" else jax.tree.map(
                        lambda a, b: jnp.concatenate([a, b], axis=1),
                        fin["lstm"], cand["lstm"])
                    for key in fin
                }
                top_sc, top_idx = jax.lax.top_k(merged["scores"], K)
                fin = gather_k(
                    {k: v for k, v in merged.items()}, top_idx)
                fin["scores"] = top_sc

                if e == E:
                    break

                # non-blank expansions: top-P tokens per beam -> global top-K
                nb = logp.at[:, :, 0].set(-jnp.inf)
                P = min(K, nb.shape[-1] - 1)  # vocab may be tiny in tests
                tok_sc, tok_id = jax.lax.top_k(nb, P)  # (B, K, P)
                comb = (cur["scores"][:, :, None] + tok_sc).reshape(B, K * P)
                new_sc, flat_idx = jax.lax.top_k(comb, K)
                parent = flat_idx // P
                tok = jnp.take_along_axis(
                    tok_id.reshape(B, K * P), flat_idx, axis=1)  # (B, K)

                nxt = gather_k(
                    {"tokens": cur["tokens"], "lens": cur["lens"],
                     "last": cur["last"], "lstm": new_lstm}, parent)
                can_emit = nxt["lens"] < Lmax
                pos = jnp.arange(Lmax)[None, None, :]
                nxt["tokens"] = jnp.where(
                    (pos == nxt["lens"][:, :, None]) & can_emit[:, :, None],
                    tok[:, :, None], nxt["tokens"])
                nxt["lens"] = nxt["lens"] + can_emit.astype(jnp.int32)
                nxt["last"] = jnp.where(can_emit, tok, nxt["last"])
                nxt["scores"] = jnp.where(can_emit, new_sc, -jnp.inf)
                cur = nxt

            # frozen frames carry the incoming beams unchanged
            out = jax.tree.map(
                lambda n, o: jnp.where(
                    active.reshape((B,) + (1,) * (n.ndim - 1)), n, o),
                fin, beams)
            return out, None

        beams, _ = jax.lax.scan(frame, beams, jnp.arange(T))
        # length-normalized best (reference transducer.py:203-205;
        # yseq includes the leading blank -> lens + 1)
        norm = beams["scores"] / jnp.maximum(
            beams["lens"] + 1, 1).astype(jnp.float32)
        best = jnp.argmax(norm, axis=1)
        best_tokens = jnp.take_along_axis(
            beams["tokens"], best[:, None, None], axis=1)[:, 0]
        best_lens = jnp.take_along_axis(
            beams["lens"], best[:, None], axis=1)[:, 0]
        return best_tokens, best_lens

    key = (model, "transducer_beam", K, E, B, Lmax)
    fn = _PIPELINE_CACHE.get(key)
    if fn is None:
        fn = jax.jit(run)
        _PIPELINE_CACHE[key] = fn
    tokens, lens = fn(variables, xs, xlens)
    tokens, lens = to_host(tokens), to_host(lens)
    return [tokens[b, : lens[b]].tolist() for b in range(B)]
