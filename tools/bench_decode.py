"""Decode-path benchmarks on real TPU (hard-synced).

Measures, at the flagship U2 operating point (12L/256d conformer + 6L
decoder, bf16):

1. KV-cached vs full-recompute attention beam search on long utterances
   (VERDICT r1 #8 done-criterion: >=60 s audio);
2. the U2 attention-rescore pipeline with the Pallas flash-attention kernel
   on vs off (VERDICT r1 #7 done-criterion: hard-synced A/B).

Prints one JSON line per measurement. Run when the chip is otherwise idle:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_decode.py
"""

import json
import time

import numpy as np


def sync(x):
    """Hard host sync — block_until_ready returns early through the tunnel."""
    return float(np.asarray(x).ravel()[0])


def timeit(fn, warmup=1, iters=3):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from liteasr_tpu import decode
    from liteasr_tpu.config.core import DotDict, _node_to_dict
    from liteasr_tpu.models.u2 import U2, U2Config
    from liteasr_tpu.ops.flash_attention import set_flash_enabled
    from liteasr_tpu.train import enable_compile_cache

    enable_compile_cache()

    vocab = 5000
    cfg = DotDict(_node_to_dict(U2Config))
    cfg.update(dict(input_dim=80, vocab_size=vocab, dropout_rate=0.0,
                    dtype="bfloat16"))
    for k in list(cfg):
        if isinstance(cfg[k], str) and cfg[k].startswith("${"):
            cfg[k] = 0.0
    model = U2.build_model(cfg, None)

    rng = np.random.default_rng(0)
    B, T = 8, 6016  # ~60 s at 10 ms frames, T' = 1503
    xs = jnp.asarray(rng.normal(size=(B, T, 80)), jnp.float32)
    xlens = jnp.full((B,), T, jnp.int32)
    variables = jax.jit(lambda k, x, xl: model.init(
        {"params": k}, x, xl, jnp.ones((B, 8), jnp.int32),
        jnp.full((B,), 8, jnp.int32), train=False))(
        jax.random.PRNGKey(0), xs, xlens)

    h_enc, enc_mask = jax.jit(
        lambda v, x, xl: model.apply(v, x, xl, method=model.encode)
    )(variables, xs, xlens)
    sync(h_enc.sum())
    audio_secs = B * T * 0.01

    # ---- 1. KV-cached vs recompute beam search (long-form) --------------
    MAXLEN = 256  # long-form label budget; recompute cost scales with this
    for use_cache in (False, True):
        fn = jax.jit(lambda v, h, m, c=use_cache: decode.attention_beam_search(
            model, v, h, m, beam_size=10, max_decode_len=MAXLEN,
            use_cache=c)[1])
        dt = timeit(lambda: fn(variables, h_enc, enc_mask))
        print(json.dumps({
            "metric": f"attn_beam_{'cached' if use_cache else 'recompute'}",
            "value": round(dt, 4), "unit": "s/batch",
            "rtf": round(dt / audio_secs, 6),
            "batch": B, "frames": T, "max_decode_len": MAXLEN,
        }), flush=True)

    # ---- 2. rescore pipeline: flash kernel on vs off --------------------
    B2, T2 = 16, 1600  # 16 s utterances, the round-1 benchmark geometry
    xs2 = jnp.asarray(rng.normal(size=(B2, T2, 80)), jnp.float32)
    xlens2 = jnp.full((B2,), T2, jnp.int32)
    audio2 = B2 * T2 * 0.01
    for flash in (False, True):
        set_flash_enabled(flash)
        decode._PIPELINE_CACHE.clear()  # force retrace under the new mode
        fn = decode._get_pipeline(model, "attention_rescore", 10, 0.5)
        dt = timeit(lambda: fn(variables, xs2, xlens2)[1])
        print(json.dumps({
            "metric": f"rescore_flash_{'on' if flash else 'off'}",
            "value": round(dt, 4), "unit": "s/batch",
            "rtf": round(dt / audio2, 6), "batch": B2, "frames": T2,
        }), flush=True)
    set_flash_enabled(False)


if __name__ == "__main__":
    main()
