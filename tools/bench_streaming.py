"""Streaming decode latency: per-chunk step time and streaming RTF.

The number a chunk-trained (`dynamic_chunk` / `static_chunk_size`) model is
for: how long after a chunk of audio arrives is its text available?
Measures the ONE jitted stream step (liteasr_tpu/streaming.py) on a
chunk-trained-geometry U2, hard-synced per chunk (float() host transfer —
block_until_ready returns early through the tunnel, CLAUDE.md).

Reports median/p95 per-chunk latency and streaming RTF
(= step_latency / chunk_audio_seconds). chunk_sub subsampled frames = 4x
raw frames = chunk_sub * 40 ms of audio.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_streaming.py
"""

import os
import time

import numpy as np

B = int(os.environ.get("SB_B", 8))
CHUNK_SUB = int(os.environ.get("SB_CHUNK", 16))  # 16 sub-frames = 640 ms
N_CHUNKS = int(os.environ.get("SB_NCHUNKS", 24))  # ~15 s of audio
MODE = os.environ.get("SB_MODE", "ctc_greedy")


def main():
    import jax
    import jax.numpy as jnp

    from liteasr_tpu.train import enable_compile_cache

    enable_compile_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    from liteasr_tpu.config.core import DotDict, _node_to_dict
    from liteasr_tpu.models.u2 import U2, U2Config
    from liteasr_tpu.streaming import (
        _make_step, init_stream_state, subsampled_length)

    cfg = DotDict(_node_to_dict(U2Config))
    cfg.update(dict(input_dim=80, vocab_size=5000, dropout_rate=0.1,
                    dtype="bfloat16", static_chunk_size=CHUNK_SUB,
                    enc_arch="transformer"))  # conv+BN is not chunk-causal
    if os.environ.get("SB_LAYERS"):  # CPU smoke-test shrink
        n = int(os.environ["SB_LAYERS"])
        cfg.update(dict(enc_layers=n, dec_layers=1, vocab_size=50))
    for k in list(cfg):
        if isinstance(cfg[k], str) and cfg[k].startswith("${"):
            cfg[k] = 0.1
    model = U2.build_model(cfg, None)

    C = 4 * CHUNK_SUB
    T = N_CHUNKS * C + 4
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(B, T, 80)).astype(np.float32)
    xlens = np.full((B,), T, np.int32)
    ys = jnp.ones((B, 8), jnp.int32)
    ylens = jnp.full((B,), 8, jnp.int32)

    variables = jax.jit(lambda k: model.init(
        {"params": k}, jnp.asarray(xs), jnp.asarray(xlens), ys, ylens,
        train=False))(jax.random.PRNGKey(0))

    L = N_CHUNKS * CHUNK_SUB
    sub_xlens = jnp.minimum(
        jnp.asarray([subsampled_length(int(l)) for l in xlens], jnp.int32), L)
    key_lens = jnp.minimum(jnp.asarray((xlens + 3) // 4, jnp.int32), L)
    step = jax.jit(_make_step(model, MODE, 10, 0, pe_len=L))
    state = init_stream_state(model, B, CHUNK_SUB, N_CHUNKS, MODE, 10)

    # warmup chunk 0 (compile)
    w = jnp.asarray(xs[:, :C + 4])
    state, h = step(variables, state, w, sub_xlens, key_lens)
    float(np.asarray(h).ravel()[0])

    lat = []
    for t in range(1, N_CHUNKS):
        w = jnp.asarray(xs[:, t * C: t * C + C + 4])
        t0 = time.perf_counter()
        state, h = step(variables, state, w, sub_xlens, key_lens)
        float(np.asarray(h).ravel()[0])  # hard per-chunk sync
        lat.append(time.perf_counter() - t0)

    lat_ms = np.asarray(lat) * 1e3
    chunk_audio_s = CHUNK_SUB * 4 * 0.01  # 10 ms frame shift
    med = float(np.median(lat_ms))
    print({"mode": MODE, "batch": B, "chunk_sub": CHUNK_SUB,
           "chunk_audio_ms": chunk_audio_s * 1e3,
           "median_chunk_latency_ms": round(med, 2),
           "p95_chunk_latency_ms": round(float(np.percentile(lat_ms, 95)), 2),
           "streaming_rtf": round(med / 1e3 / chunk_audio_s, 4)})


if __name__ == "__main__":
    main()
