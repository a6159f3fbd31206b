"""Benchmark: U2 Conformer training throughput at the reference operating
point, on real TPU hardware.

Operating point (BASELINE.md "reference operating points"): U2 with a
12-layer/256-dim/2048-FF/4-head Conformer encoder + 6-layer Transformer
decoder, hybrid CTC/attention loss (ctc 0.3, smoothing 0.1), Noam Adam,
batch 32 utterances x 800 frames x 80-dim fbank, ~40-token labels,
grad-accum 2, clip 5.0. Compute dtype bfloat16 (MXU), params fp32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md). The north-star target from
BASELINE.json is ">=5x per-chip utterances/sec vs the PyTorch reference".
We document the assumed reference point as 25 utt/s per GPU (a typical
ESPnet/WeNet-class conformer-12L training rate on a V100/A100-class chip for
this batch geometry), so vs_baseline = value / (5 * 25).
"""

import json
import time

import numpy as np

ASSUMED_REF_UTT_PER_SEC = 25.0  # per-GPU PyTorch reference (documented guess)
TARGET_MULTIPLIER = 5.0

B, T, D, U = 32, 800, 80, 48
WARMUP, ITERS = 3, 10


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from liteasr_tpu.train import enable_compile_cache

    enable_compile_cache()

    from liteasr_tpu.config.core import DotDict, _node_to_dict
    from liteasr_tpu.criterions import build_criterion
    from liteasr_tpu.models.u2 import U2, U2Config
    from liteasr_tpu.optims import build_optimizer
    from liteasr_tpu.parallel.mesh import (
        batch_sharding, get_mesh, replicated_sharding)
    from liteasr_tpu.trainer import TrainState, build_tx

    jax.config.update("jax_default_prng_impl", "rbg")  # production PRNG

    vocab = 5000
    cfg = DotDict(_node_to_dict(U2Config))
    cfg.update(dict(
        input_dim=D, vocab_size=vocab, dropout_rate=0.1, dtype="bfloat16"))
    for k in list(cfg):
        if isinstance(cfg[k], str) and cfg[k].startswith("${"):
            cfg[k] = 0.1
    model = U2.build_model(cfg, None)

    criterion = build_criterion(
        DotDict(name="hybrid_ctc", vocab_size=vocab, padding_idx=-1,
                smoothing=0.1, normalize_length=False, ctc_weight=0.3), None)
    optimizer = build_optimizer(
        DotDict(name="noam", lr=1e-3, beta1=0.9, beta2=0.98, eps=1e-9,
                weight_decay=0.0, amsgrad=False, model_dim=256, factor=1.0,
                warmup=25000), None)
    tx = build_tx(optimizer, DotDict(accum_grad=1, clip_grad_norm=5.0))

    mesh = get_mesh(dp=-1, tp=1)
    repl, bsh = replicated_sharding(mesh), batch_sharding(mesh)

    rng = np.random.default_rng(0)
    batch = {
        "xs": jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32),
        "xlens": jnp.asarray(
            rng.integers(T // 2, T + 1, size=B), jnp.int32),
        "ys": jnp.asarray(rng.integers(1, vocab - 1, size=(B, U)), jnp.int32),
        "ylens": jnp.asarray(rng.integers(U // 2, U + 1, size=B), jnp.int32),
        "valid": jnp.ones((B,), jnp.float32),
    }

    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k, b: model.init(
        {"params": k}, b["xs"], b["xlens"], b["ys"], b["ylens"],
        train=False))(key, batch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=jax.jit(tx.init)(variables["params"]),
    )
    state = jax.device_put(state, repl)
    batch = jax.device_put(batch, bsh)

    def train_step(state, batch):
        dropout_key = jax.random.fold_in(jax.random.PRNGKey(7), state.step)

        def loss_fn(params):
            vs = {"params": params}
            if state.batch_stats:
                vs["batch_stats"] = state.batch_stats
            loss, aux = criterion(model, vs, batch,
                                  rngs={"dropout": dropout_key}, train=True)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_stats = aux.get("model_state", {}).get(
            "batch_stats", state.batch_stats)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt), loss

    step = jax.jit(train_step, in_shardings=(repl, bsh),
                   out_shardings=(repl, repl), donate_argnums=(0,))

    for _ in range(WARMUP):
        state, loss = step(state, batch)
    float(loss)  # hard host sync: block_until_ready can return early
    # through the remote-execution tunnel, inflating throughput ~16x

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss = step(state, batch)
    float(loss)  # sequential dependency forces all ITERS steps to finish
    dt = time.perf_counter() - t0

    n_chips = len(jax.devices())
    utts_per_sec = B * ITERS / dt / n_chips  # per chip
    baseline = ASSUMED_REF_UTT_PER_SEC * TARGET_MULTIPLIER
    print(json.dumps({
        "metric": "train_utts_per_sec_per_chip",
        "value": round(utts_per_sec, 2),
        "unit": "utt/s",
        "vs_baseline": round(utts_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
