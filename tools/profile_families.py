"""Step anatomy for the Paraformer and wav2vec2 train steps (hard syncs).

Answers two round-3 planning questions:
  * where does the Paraformer micro-step go (encoder vs CIF scan vs the
    two decoder passes)?
  * what does a wav2vec2 pretraining step actually cost on-device, so the
    epoch-trigger overhead (valid + checkpoint transfer through the tunnel)
    can be separated from compute?

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_families.py
"""

import time

import numpy as np

WARMUP, ITERS = 3, 10


def bench(fn, sync, *args):
    out = None
    for _ in range(WARMUP):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / ITERS * 1e3  # ms


def sync_tree(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def paraformer_anatomy():
    import jax
    import jax.numpy as jnp

    from liteasr_tpu.config.core import DotDict, _node_to_dict
    from liteasr_tpu.criterions import build_criterion
    from liteasr_tpu.models.paraformer import Paraformer, ParaformerConfig

    B, T, D, U, vocab = 32, 800, 80, 24, 72
    cfg = DotDict(_node_to_dict(ParaformerConfig))
    cfg.update(dict(input_dim=D, vocab_size=vocab, dtype="bfloat16"))
    for k in list(cfg):
        if isinstance(cfg[k], str) and cfg[k].startswith("${"):
            cfg[k] = 0.0
    model = Paraformer.build_model(cfg, None)
    criterion = build_criterion(
        DotDict(name="paraformer_loss", vocab_size=vocab, padding_idx=-1,
                normalize_length=False), None)

    rng = np.random.default_rng(0)
    batch = {
        "xs": jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32),
        "xlens": jnp.asarray(rng.integers(T // 2, T + 1, size=B), jnp.int32),
        "ys": jnp.asarray(rng.integers(1, vocab - 1, size=(B, U)), jnp.int32),
        "ylens": jnp.asarray(rng.integers(U // 2, U + 1, size=B), jnp.int32),
        "valid": jnp.ones((B,), jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k, b: model.init(
        {"params": k}, b["xs"], b["xlens"], b["ys"], b["ylens"],
        train=False))(key, batch)
    dkey = jax.random.PRNGKey(7)

    @jax.jit
    def fwd(vs, b):
        return model.apply(vs, b["xs"], b["xlens"], b["ys"], b["ylens"],
                           train=True, rngs={"dropout": dkey},
                           mutable=["batch_stats"] if "batch_stats" in vs
                           else False)

    def loss_fn(params, vs, b):
        v = dict(vs, params=params)
        return criterion(model, v, b, rngs={"dropout": dkey}, train=True)

    @jax.jit
    def fwd_bwd(vs, b):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            vs["params"], vs, b)
        return loss, grads

    # predictor (CIF) in isolation: same shapes as inside the model (T' frames)
    Tp = ((T - 1) // 2 - 1) // 2
    henc = jnp.asarray(rng.normal(size=(B, Tp, 256)), jnp.bfloat16)
    hlens = jnp.asarray(rng.integers(Tp // 2, Tp + 1, size=B), jnp.int32)
    ylens = batch["ylens"]
    from liteasr_tpu.nets.paraformer import Predictor
    pred = Predictor(dtype=jnp.bfloat16)
    pvars = jax.jit(lambda k: pred.init(k, henc, hlens, ylens, u_max=U))(key)

    @jax.jit
    def cif_fwd(pv):
        return pred.apply(pv, henc, hlens, ylens, u_max=U)

    @jax.jit
    def cif_fwd_bwd(pv):
        def lf(p):
            buf, sa = pred.apply({"params": p}, henc, hlens, ylens, u_max=U)
            return (buf.astype(jnp.float32) ** 2).sum() + sa.sum()
        return jax.value_and_grad(lf)(pv["params"])

    print(f"paraformer model_fwd   {bench(fwd, sync_tree, variables, batch):8.2f} ms", flush=True)
    print(f"paraformer fwd_bwd     {bench(fwd_bwd, sync_tree, variables, batch):8.2f} ms", flush=True)
    print(f"paraformer cif_fwd     {bench(cif_fwd, sync_tree, pvars):8.2f} ms", flush=True)
    print(f"paraformer cif_fwd_bwd {bench(cif_fwd_bwd, sync_tree, pvars):8.2f} ms", flush=True)


def wav2vec2_anatomy():
    import jax
    import jax.numpy as jnp

    from liteasr_tpu.config.core import DotDict, _node_to_dict
    from liteasr_tpu.criterions import build_criterion
    from liteasr_tpu.models.wav2vec2 import Wav2Vec2, Wav2Vec2Config

    B, T = 24, 56000  # the synth_waves operating point
    cfg = DotDict(_node_to_dict(Wav2Vec2Config))
    cfg.update(dict(dtype="bfloat16"))
    for k in list(cfg):
        if isinstance(cfg[k], str) and cfg[k].startswith("${"):
            cfg[k] = 0.0
    model = Wav2Vec2.build_model(cfg, None)
    criterion = build_criterion(
        DotDict(name="wav2vec", diversity_weight=1.0), None)

    rng = np.random.default_rng(0)
    batch = {
        "xs": jnp.asarray(rng.normal(size=(B, T)) * 0.1, jnp.float32),
        "xlens": jnp.asarray(rng.integers(T // 2, T + 1, size=B), jnp.int32),
        "valid": jnp.ones((B,), jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k, b: model.init(
        {"params": k, "mask": k, "gumbel": k, "negatives": k},
        b["xs"], b["xlens"], train=False))(key, batch)
    dkey = jax.random.PRNGKey(7)
    rngs = {"dropout": dkey, "mask": dkey, "gumbel": dkey, "negatives": dkey}

    def loss_fn(params, vs, b):
        v = dict(vs, params=params)
        return criterion(model, v, b, rngs=rngs, train=True)

    @jax.jit
    def fwd_bwd(vs, b):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            vs["params"], vs, b)
        return loss, grads

    @jax.jit
    def fwd(vs, b):
        return model.apply(vs, b["xs"], b["xlens"], train=True, rngs=rngs)

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        variables["params"]))
    print(f"wav2vec2 params        {n_params/1e6:8.2f} M", flush=True)
    print(f"wav2vec2 model_fwd     {bench(fwd, sync_tree, variables, batch):8.2f} ms", flush=True)
    print(f"wav2vec2 fwd_bwd       {bench(fwd_bwd, sync_tree, variables, batch):8.2f} ms", flush=True)


if __name__ == "__main__":
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    from liteasr_tpu.train import enable_compile_cache
    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    paraformer_anatomy()
    wav2vec2_anatomy()
