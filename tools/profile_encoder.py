"""Encoder ablation profile: which sub-block owns the milliseconds?

Times the 12L/256d conformer encoder forward (and fwd+bwd) under ablations:

  base          full conformer, train-mode (dropout 0.1, rel-pos, conv+BN)
  no_dropout    dropout_rate 0 (XLA removes RNG + mask traffic)
  abs_attn      absolute-position MHA (no matrix_bd / rel_shift)
  transformer   no conv module / BatchNorm (enc_arch=transformer)
  eval_mode     train=False (no dropout, BN running stats)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_encoder.py
"""

import os
import time

import numpy as np

B = int(os.environ.get("PROF_B", 32))
T = int(os.environ.get("PROF_T", 800))
D = 80
WARMUP, ITERS = 3, 10


def main():
    import jax
    import jax.numpy as jnp

    from liteasr_tpu.train import enable_compile_cache

    enable_compile_cache()

    from liteasr_tpu.config.core import DotDict, _node_to_dict
    from liteasr_tpu.models.u2 import U2, U2Config

    jax.config.update("jax_default_prng_impl", "rbg")

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    xlens = jnp.asarray(rng.integers(T // 2, T + 1, size=B), jnp.int32)
    ys = jnp.ones((B, 8), jnp.int32)
    ylens = jnp.full((B,), 8, jnp.int32)
    dkey = jax.random.PRNGKey(7)

    def build(**over):
        cfg = DotDict(_node_to_dict(U2Config))
        cfg.update(dict(input_dim=D, vocab_size=100, dropout_rate=0.1,
                        dtype="bfloat16"))
        for k in list(cfg):
            if isinstance(cfg[k], str) and cfg[k].startswith("${"):
                cfg[k] = 0.1
        cfg.update(over)
        model = U2.build_model(cfg, None)
        variables = jax.jit(lambda k: model.init(
            {"params": k}, xs, xlens, ys, ylens, train=False))(
            jax.random.PRNGKey(0))
        return model, variables

    def bench(fn, *args):
        out = None
        for _ in range(WARMUP):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        return (time.perf_counter() - t0) / ITERS * 1e3

    def run(tag, train=True, **over):
        model, variables = build(**over)

        @jax.jit
        def fwd(vs, xs, xlens):
            return model.apply(
                vs, xs, xlens, method=model.encode, rngs={"dropout": dkey},
                train=train,
                mutable=["batch_stats"] if (train and "batch_stats" in vs)
                else False)

        @jax.jit
        def fwd_bwd(vs, xs, xlens):
            def loss(params):
                v = dict(vs, params=params)
                out = model.apply(
                    v, xs, xlens, method=model.encode,
                    rngs={"dropout": dkey}, train=train,
                    mutable=["batch_stats"] if (train and "batch_stats" in vs)
                    else False)
                h = out[0][0] if isinstance(out, tuple) and isinstance(
                    out[0], tuple) else out[0]
                return (h.astype(jnp.float32) ** 2).mean()

            return jax.value_and_grad(loss)(vs["params"])

        f = bench(fwd, variables, xs, xlens)
        fb = bench(fwd_bwd, variables, xs, xlens)
        print(f"{tag:14s} fwd {f:7.2f} ms   fwd+bwd {fb:7.2f} ms", flush=True)

    import sys

    if "--flash-train" in sys.argv:
        from liteasr_tpu.ops.flash_attention import set_flash_train_enabled

        run("xla_base")
        set_flash_train_enabled(True)
        run("flash_train")
        set_flash_train_enabled(None)
        return

    run("base")
    run("no_dropout", dropout_rate=0.0)
    run("abs_attn", use_rel=False)
    run("transformer", enc_arch="transformer")
    run("eval_mode", train=False)


if __name__ == "__main__":
    main()
