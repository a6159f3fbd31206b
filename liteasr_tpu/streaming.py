"""Chunk-by-chunk streaming inference for chunk-trained U2 encoders.

The reference ships the latent primitives for streaming — the
``triangle_mask(stage=...)`` chunk mask (liteasr/utils/mask.py:30-90) and
the decoder cache design (liteasr/nets/transformer_layer.py:40-47) — but
never wires them into a runtime; its decode is offline-only. This module is
the runtime: a stateful chunked encoder + incremental CTC emission, so a
``static_chunk_size``/``dynamic_chunk``-trained model actually serves with
bounded latency.

TPU-native design: ONE jitted step graph with fully static shapes. The
stream state is a pytree of fixed-capacity buffers — per-layer K/V caches
(written with ``dynamic_update_slice`` at a traced stream offset), the CTC
greedy carry (previous frame id + a fixed-size hypothesis buffer scattered
with out-of-bounds-drop), or the CTC prefix-beam carry (the same tuple
``decode.ctc_prefix_beam_search`` scans over, carried across chunks) — so
every chunk reuses the same compiled executable; nothing recompiles as the
stream grows.

Geometry: the conv front-end (two stride-2 VALID convs, receptive field 7,
stride 4) is streamed by feeding overlapping raw windows
``raw[t*C : t*C + C + 4]`` with ``C = 4*chunk_sub``: every window emits
exactly ``chunk_sub`` brand-new subsampled frames, so window 0 and window t
share one graph. Exactness: with a positional table of static length
``pe_len`` equal to the offline padded T', the chunked rel-pos attention
(nets/attention.py ``_chunk``) reproduces the offline ``rel_shift``
semantics bit-for-bit — including the reference's legacy wrap for in-chunk
lookahead (tests/test_streaming_decode.py asserts parity).
"""

import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from liteasr_tpu.decode import (
    _logadd,
    ctc_prefix_beam_finalize,
    ctc_prefix_beam_init,
    _ctc_prefix_step,
)
from liteasr_tpu.nets.subsampling import subsampled_length
from liteasr_tpu.parallel.mesh import to_host

_STEP_CACHE: dict = {}


def init_stream_state(model, B: int, chunk_sub: int, n_chunks: int,
                      mode: str = "ctc_greedy", beam_size: int = 10):
    """Fresh stream state for ``B`` parallel utterances.

    Capacity is ``n_chunks * chunk_sub`` subsampled frames; every buffer is
    allocated up front so the step function never reshapes.
    """
    L = n_chunks * chunk_sub
    H = model.enc_attn_heads
    Dk = model.enc_dim // H
    caches = [
        {"k": jnp.zeros((B, L, H, Dk), model.dtype),
         "v": jnp.zeros((B, L, H, Dk), model.dtype)}
        for _ in range(model.enc_layers)
    ]
    state = {"caches": caches, "index": jnp.zeros((), jnp.int32)}
    if mode == "ctc_prefix_beam_search":
        state["beam"] = ctc_prefix_beam_init(B, beam_size, L)
    else:
        state["prev"] = jnp.full((B,), -1, jnp.int32)
        state["hyp"] = jnp.zeros((B, L), jnp.int32)
        state["hyp_len"] = jnp.zeros((B,), jnp.int32)
    return state


def _greedy_update(state, ids, valid, blank: int):
    B, c = ids.shape
    Lhyp = state["hyp"].shape[1]
    prev_frames = jnp.concatenate([state["prev"][:, None], ids[:, :-1]],
                                  axis=1)
    keep = (ids != blank) & (ids != prev_frames) & valid
    pos = state["hyp_len"][:, None] + jnp.cumsum(keep, axis=1) - 1
    pos = jnp.where(keep, pos, Lhyp)  # out-of-bounds => dropped
    state["hyp"] = state["hyp"].at[
        jnp.arange(B)[:, None], pos].set(ids, mode="drop")
    state["hyp_len"] = state["hyp_len"] + keep.sum(axis=1).astype(jnp.int32)
    state["prev"] = jnp.where(valid[:, -1], ids[:, -1], state["prev"])
    return state


def _make_step(model, mode: str, beam_size: int, blank: int, pe_len: int):
    from functools import partial

    def step(variables, state, window, sub_xlens, key_lens):
        """window: (B, C+4, F) raw frames; emits chunk_sub new frames.

        ``key_lens`` (valid KEYS, the offline ``[:, :-2:2][:, :-2:2]`` mask
        convention: ceil(xlen/4)) deliberately differs from ``sub_xlens``
        (EMITTED frames, the conv length formula ((xlen-1)//2-1)//2) — the
        last key can straddle the padding boundary and is unmasked offline.
        """
        index = state["index"]
        c_sub = subsampled_length(window.shape[1])
        kv_lens = jnp.minimum(index + c_sub, key_lens)
        h, logits, new_caches = model.apply(
            variables, window, state["caches"], index, kv_lens, pe_len,
            method=model.encode_chunk)
        state = dict(state, caches=new_caches)
        valid = (index + jnp.arange(c_sub))[None, :] < sub_xlens[:, None]
        if mode == "ctc_prefix_beam_search":
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            K = beam_size
            Lmax = state["beam"][0].shape[-1]
            pstep = jax.vmap(partial(_ctc_prefix_step, beam_size=K,
                                     blank=blank, max_len=Lmax))

            def body(bstate, i):
                active = (index + i) < sub_xlens
                return pstep(bstate, (logp[:, i], active)), None

            beam, _ = jax.lax.scan(body, state["beam"], jnp.arange(c_sub))
            state["beam"] = beam
        else:
            ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            state = _greedy_update(state, ids, valid, blank)
        state["index"] = index + c_sub
        return state, h

    return step


def streaming_decode(model, variables, xs, xlens, chunk_sub: int = 16,
                     mode: str = "ctc_greedy", beam_size: int = 10,
                     blank: int = 0, n_chunks: Optional[int] = None,
                     collect_enc: bool = False):
    """Decode a batch chunk-by-chunk; returns hypotheses like decode_batch.

    :param chunk_sub: emitted subsampled frames per step. Must be a
        multiple of the model's ``static_chunk_size`` so a frame's in-chunk
        lookahead never outruns the cache.
    :param n_chunks: stream capacity (defaults to just covering ``xs``).
        The positional table length — and therefore, through the legacy
        rel-shift indexing, the rel-pos attention values — is tied to it;
        offline parity holds when the offline input is padded to
        ``4 * n_chunks * chunk_sub + 4`` raw frames.
    """
    cs = model.static_chunk_size
    if cs > 0:
        assert chunk_sub % cs == 0, (chunk_sub, cs)
    xs = np.asarray(xs, np.float32)
    B, T, F = xs.shape
    C = 4 * chunk_sub
    if n_chunks is None:
        n_chunks = max(1, math.ceil(max(T - 4, 1) / C))
    T_pad = n_chunks * C + 4
    if T_pad > T:
        xs = np.pad(xs, ((0, 0), (0, T_pad - T), (0, 0)))
    L = n_chunks * chunk_sub
    xl = np.asarray(xlens)
    sub_xlens = jnp.minimum(
        jnp.asarray([subsampled_length(int(l)) for l in xl], jnp.int32), L)
    key_lens = jnp.minimum(
        jnp.asarray((xl + 3) // 4, jnp.int32), L)

    # flax modules are frozen dataclasses (value-hashable) — id() could be
    # reused by a later model after GC and alias the cached step
    key = (model, "stream", B, chunk_sub, n_chunks, mode, beam_size,
           blank)
    fn = _STEP_CACHE.get(key)
    if fn is None:
        fn = jax.jit(_make_step(model, mode, beam_size, blank, pe_len=L))
        _STEP_CACHE[key] = fn

    state = init_stream_state(model, B, chunk_sub, n_chunks, mode, beam_size)
    enc_chunks = []
    for t in range(n_chunks):
        window = jnp.asarray(xs[:, t * C: t * C + C + 4])
        state, h = fn(variables, state, window, sub_xlens, key_lens)
        if collect_enc:
            enc_chunks.append(h)

    if mode == "ctc_prefix_beam_search":
        prefixes, plens, _ = ctc_prefix_beam_finalize(state["beam"])
        best, blens = to_host(prefixes[:, 0]), to_host(plens[:, 0])
        hyps = [best[b, : blens[b]].tolist() for b in range(B)]
    else:
        hyp, hyp_len = to_host(state["hyp"]), to_host(state["hyp_len"])
        hyps = [hyp[b, : hyp_len[b]].tolist() for b in range(B)]
    if collect_enc:
        return hyps, jnp.concatenate(enc_chunks, axis=1)
    return hyps
