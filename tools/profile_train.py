"""Ablation profile of the U2 train step at the benchmark operating point.

Times each pipeline stage separately (hard host syncs, see CLAUDE.md) so
optimization effort goes where the milliseconds are:

  enc_fwd          encoder apply only, train-mode dropout
  model_fwd        full U2 forward (enc + dec + ctc head)
  fwd_bwd          criterion fwd + grad (no optimizer)
  step_accum1      full train step, plain chained tx
  step_accum2      full train step, accumulate_every_k(k=2)
  step_accum2_flat same, optax.flatten'd optimizer chain

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_train.py
"""

import time

import numpy as np

B, T, D, U = 32, 800, 80, 48
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
    from liteasr_tpu.trainer import TrainState, build_tx

    jax.config.update("jax_default_prng_impl", "rbg")

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

    def sync_tree(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))

    dkey = jax.random.PRNGKey(7)

    # --- encoder forward only ---
    @jax.jit
    def enc_fwd(vs, b):
        out = model.apply(
            vs, b["xs"], b["xlens"], method=model.encode,
            rngs={"dropout": dkey}, train=True,
            mutable=["batch_stats"] if "batch_stats" in vs else False)
        return out

    # --- full model forward ---
    @jax.jit
    def model_fwd(vs, b):
        return model.apply(
            vs, b["xs"], b["xlens"], b["ys"], b["ylens"], train=True,
            rngs={"dropout": dkey},
            mutable=["batch_stats"] if "batch_stats" in vs else False)

    # --- criterion fwd + grad ---
    def loss_fn(params, vs, b):
        v = dict(vs, params=params)
        loss, aux = criterion(model, v, b, rngs={"dropout": dkey}, train=True)
        return loss, aux

    @jax.jit
    def fwd_bwd(vs, b):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            vs["params"], vs, b)
        return loss, grads

    # --- full steps ---
    def make_step(tx, opt_state0):
        def train_step(state, b):
            dropout_key = jax.random.fold_in(dkey, state.step)

            def lf(params):
                v = {"params": params}
                if state.batch_stats:
                    v["batch_stats"] = state.batch_stats
                return criterion(model, v, b,
                                 rngs={"dropout": dropout_key}, train=True)

            (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(
                state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_stats = aux.get("model_state", {}).get(
                "batch_stats", state.batch_stats)
            return TrainState(step=state.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt), loss

        return jax.jit(train_step, donate_argnums=(0,))

    def run_step(step_fn, tx):
        # fresh copies: the step donates its state, so reusing `variables`
        # across run_step calls would hand donated (deleted) buffers back in
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=jax.tree_util.tree_map(
                jnp.array, variables.get("batch_stats", {})),
            opt_state=jax.jit(tx.init)(params))
        holder = {"s": state}

        def call(b):
            holder["s"], loss = step_fn(holder["s"], b)
            return loss

        return bench(call, lambda x: float(x), batch)

    vs = variables
    results = {}

    def record(name, value):
        results[name] = value
        print(f"{name:14s} {value:8.2f} ms", flush=True)

    record("enc_fwd", bench(enc_fwd, sync_tree, vs, batch))
    record("model_fwd", bench(model_fwd, sync_tree, vs, batch))
    record("fwd_bwd", bench(fwd_bwd, sync_tree, vs, batch))

    tx1 = build_tx(optimizer, DotDict(accum_grad=1, clip_grad_norm=5.0))
    record("step_accum1", run_step(make_step(tx1, None), tx1))
    tx2 = build_tx(optimizer, DotDict(accum_grad=2, clip_grad_norm=5.0))
    record("step_accum2", run_step(make_step(tx2, None), tx2))
    txf = build_tx(optimizer, DotDict(accum_grad=2, clip_grad_norm=5.0),
                   flat=True)
    record("step_accum2_flat", run_step(make_step(txf, None), txf))
    print(f"{'bwd-only':14s} {results['fwd_bwd'] - results['model_fwd']:8.2f} ms (derived)")
    print(f"{'optimizer':14s} {results['step_accum1'] - results['fwd_bwd']:8.2f} ms (derived)")
    print(f"{'accum-overhead':14s} {results['step_accum2'] - results['step_accum1']:8.2f} ms (derived)")


if __name__ == "__main__":
    main()
