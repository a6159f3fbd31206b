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

Measurement protocol (defends the recorded number):
  * WARMUP steps first (also absorbs compile-cache hits), hard host sync.
  * REPS repetitions of ITERS steps each, every repetition closed by a
    hard host transfer (``float(loss)`` — ``block_until_ready`` returns
    early through the remote-execution tunnel, ~16x wrong, see CLAUDE.md).
  * The reported value is the MEDIAN repetition: single-core host
    contention (data loaders, CI, a concurrent test suite) shows up as
    spikes in a minority of repetitions and the median rejects them.
  * /proc/loadavg is sampled before the run; if the 1-minute load exceeds
    HOST_LOAD_THRESHOLD the bench WAITS (re-sampling every 30 s, up to
    LOAD_WAIT_MAX_S) for the host to go idle before measuring. Only if the
    load never clears does it proceed, carrying ``host_load_warning`` with
    the observed load — such numbers are suspect and should be re-run.
  * The JSON also reports ``best_rep`` (the fastest repetition). Host/tunnel
    contention can only SLOW a repetition, never speed one up, so best_rep
    is a contention-proof lower bound on the true throughput: a median far
    below best_rep flags a poisoned capture post hoc (see VERDICT r3).
"""

import json
import os
import time

import numpy as np

ASSUMED_REF_UTT_PER_SEC = 25.0  # per-GPU PyTorch reference (documented guess)
TARGET_MULTIPLIER = 5.0

# Geometry is env-overridable for operating-point studies (BENCHMARKS.md
# "Utilization wall"); the driver's official capture uses the defaults.
B = int(os.environ.get("BENCH_B", 32))
T = int(os.environ.get("BENCH_T", 800))
D, U = 80, int(os.environ.get("BENCH_U", 48))
WARMUP, ITERS, REPS = 5, 10, 5
HOST_LOAD_THRESHOLD = 0.5  # 1-min loadavg; this host has a single core
LOAD_WAIT_MAX_S = 600  # wait up to 10 min for a loaded host to go idle


def read_load():
    try:
        return float(open("/proc/loadavg").read().split()[0])
    except OSError:  # non-Linux host
        return None


def wait_for_idle_host():
    """Block (bounded) until the 1-min load clears HOST_LOAD_THRESHOLD.

    BENCH_r03 was poisoned by a concurrent training run (VERDICT r3): the
    median-of-5 protocol cannot reject contention spanning most reps, so the
    bench now refuses to start while the host is busy.  Returns the load
    observed at the moment measurement proceeds.
    """
    import sys

    load = read_load()
    if load is None:
        return None
    deadline = time.time() + LOAD_WAIT_MAX_S
    while load > HOST_LOAD_THRESHOLD and time.time() < deadline:
        print(f"bench: host load {load:.2f} > {HOST_LOAD_THRESHOLD}; "
              "waiting for idle...", file=sys.stderr)
        time.sleep(30)
        load = read_load()
    return load

# peak dense bf16 FLOP/s per chip by device_kind substring (public specs)
PEAK_BF16_FLOPS = {
    "v4": 275e12,
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6 lite": 918e12,
    "v6e": 918e12,
}


def train_step_flops(vocab: int, enc_layers=12, dec_layers=6, d=256,
                     ff=2048, conv_k=15) -> float:
    """Analytic matmul FLOPs for ONE train step at the operating point.

    Counts GEMMs as 2*M*N*K, fwd + bwd as 3x fwd (standard rule: grads wrt
    inputs and weights each cost one fwd-equivalent). Elementwise/LN/softmax
    work is excluded (bandwidth-, not FLOP-bound), so reported MFU is a mild
    UNDERestimate. Documented in BENCHMARKS.md.
    """
    t_sub = ((T - 1) // 2 - 1) // 2  # encoder frames after conv subsampling
    u_dec = U + 1  # sos-prepended decoder length

    # conv2d front-end: two 3x3 stride-2 convs (1->d, d->d) + linear
    t2 = (T - 1) // 2
    sub = 2 * 9 * t2 * (D // 2) * 1 * d \
        + 2 * 9 * t_sub * (D // 4) * d * d \
        + 2 * t_sub * (D // 4) * d * d

    # one conformer layer: 2 macaron FFs (2 GEMMs each), attention
    # (q,k,v,out,pos projections + pos_bias terms), conv module
    # (pointwise d->2d, d->d + depthwise), per frame
    ff_flops = 2 * (2 * d * ff * 2)  # two FF modules, two GEMMs each
    attn_proj = 2 * d * d * 5  # q,k,v,out + rel-pos projection
    conv_mod = 2 * d * (2 * d) + 2 * d * d + 2 * conv_k * d
    enc_frame = ff_flops + attn_proj + conv_mod
    # quadratic attention terms: scores, context, rel-shift matrix_bd
    enc_quad = 3 * 2 * t_sub * t_sub * d

    # decoder layer: self-attn + src-attn (4 GEMM projections each) + FF
    dec_frame = 2 * (2 * d * d * 4) + 2 * d * ff * 2
    dec_quad = 2 * 2 * u_dec * u_dec * d + 2 * 2 * u_dec * t_sub * d

    # output projections: decoder vocab + CTC head
    heads = 2 * u_dec * d * vocab + 2 * t_sub * d * vocab

    fwd = (sub
           + enc_layers * (t_sub * enc_frame + enc_quad)
           + dec_layers * (u_dec * dec_frame + dec_quad)
           + heads)
    return 3.0 * fwd * B


def main():
    # Refuse to start on a busy host (bounded wait) BEFORE this process
    # generates any load of its own.
    wait_for_idle_host()

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
    batch = jax.device_put(batch, bsh)

    def build(fused):
        # accum_grad=2 matches the documented operating point (BASELINE.md);
        # each measured iteration is one micro-batch of B utterances
        tx = build_tx(optimizer, DotDict(accum_grad=2, clip_grad_norm=5.0,
                                         fused_step=fused), flat=True)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=jax.jit(tx.init)(variables["params"]),
        )
        state = jax.device_put(state, repl)

        def train_step(state, batch):
            dropout_key = jax.random.fold_in(
                jax.random.PRNGKey(7), state.step)

            def loss_fn(params):
                vs = {"params": params}
                if state.batch_stats:
                    vs["batch_stats"] = state.batch_stats
                loss, aux = criterion(
                    model, vs, batch, rngs={"dropout": dropout_key},
                    train=True)
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            if hasattr(tx, "apply"):  # FusedTx (optimization.fused_step)
                new_params, new_opt = tx.apply(grads, state.opt_state,
                                               state.params)
            else:
                updates, new_opt = tx.update(grads, state.opt_state,
                                             state.params)
                new_params = optax.apply_updates(state.params, updates)
            new_stats = aux.get("model_state", {}).get(
                "batch_stats", state.batch_stats)
            return TrainState(step=state.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt), loss

        step = jax.jit(train_step, in_shardings=(repl, bsh),
                       out_shardings=(repl, repl), donate_argnums=(0,))
        return tx, state, step

    tx, state, step = build(True)
    try:
        for _ in range(WARMUP):
            state, loss = step(state, batch)
        float(loss)  # hard host sync: block_until_ready can return early
        # through the remote-execution tunnel, inflating throughput ~16x
    except Exception as e:  # scoreboard insurance: never die on the fused
        import sys

        print(f"fused_step failed ({type(e).__name__}: {e}); "
              "falling back to the optax chain", file=sys.stderr)
        tx, state, step = build(False)
        for _ in range(WARMUP):
            state, loss = step(state, batch)
        float(loss)

    # Re-sample right before the timed loop: this process is blocked on the
    # remote tunnel between dispatches (sleeping, not counted in loadavg),
    # so a high reading here means SOMEONE ELSE is using the core.
    host_load = wait_for_idle_host()

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, loss = step(state, batch)
        float(loss)  # sequential dependency forces all ITERS steps finished
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]  # median repetition
    dt_best = min(times)  # contention-proof lower bound (see module doc)

    n_chips = len(jax.devices())
    utts_per_sec = B * ITERS / dt / n_chips  # per chip
    baseline = ASSUMED_REF_UTT_PER_SEC * TARGET_MULTIPLIER

    # MFU: analytic matmul FLOPs / wall clock / peak (see train_step_flops)
    kind = jax.devices()[0].device_kind.lower()
    peak = next((v for k, v in PEAK_BF16_FLOPS.items() if k in kind), None)
    achieved = train_step_flops(vocab) * ITERS / dt / n_chips
    mfu = round(achieved / peak, 4) if peak else None
    out = {
        "metric": "train_utts_per_sec_per_chip",
        "value": round(utts_per_sec, 2),
        "unit": "utt/s",
        "vs_baseline": round(utts_per_sec / baseline, 3),
        "tflops_per_chip": round(achieved / 1e12, 2),
        "mfu": mfu,
        "device_kind": kind,
        "best_rep": round(B * ITERS / dt_best / n_chips, 2),
        "rep_spread_pct": round(
            100.0 * (max(times) - min(times)) / dt, 1),
        # provenance: which round-3 fused paths produced this number
        "fused": {
            "bn_ln_custom_vjp": True,  # model defaults (nets/layers, common)
            "optimizer_fused_step": hasattr(tx, "apply"),
            "flash_train": __import__(
                "liteasr_tpu.ops.flash_attention",
                fromlist=["flash_train_available"]).flash_train_available(),
        },
    }
    if (B, T, U) != (32, 800, 48):  # operating-point study, not the
        out["geometry"] = {"B": B, "T": T, "U": U}  # official capture
    if host_load is not None and host_load > HOST_LOAD_THRESHOLD:
        out["host_load_warning"] = host_load
    print(json.dumps(out))


def _watchdog():
    """Fail loudly instead of hanging forever: the remote-execution tunnel
    can wedge (dispatches never return — observed 2026-08-19/20, never
    self-heals). A silent hang poisons automated captures; after
    BENCH_WATCHDOG_S (default 45 min, generous vs ~8 min healthy runtime
    incl. cold compiles) emit an error JSON line and hard-exit."""
    import threading

    limit = float(os.environ.get("BENCH_WATCHDOG_S", 2700))

    def fire():
        print(json.dumps({
            "metric": "train_utts_per_sec_per_chip", "value": 0.0,
            "unit": "utt/s", "vs_baseline": 0.0,
            "error": f"watchdog: no result after {limit:.0f}s — "
                     "TPU tunnel wedged or compile stuck"}), flush=True)
        os._exit(3)

    t = threading.Timer(limit, fire)
    t.daemon = True
    t.start()


if __name__ == "__main__":
    _watchdog()
    main()
