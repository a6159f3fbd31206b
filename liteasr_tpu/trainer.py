"""Trainer: one compiled train step under a device mesh + a host event loop.

Reference: liteasr/trainer.py:28-227. The PyTorch run loop (per-micro-batch
backward, DDP no_sync, clip, NaN-skip, trigger-decorated events) maps to:

* ONE jitted ``train_step`` containing forward + backward + optimizer update.
  Gradient accumulation is a ``lax.cond`` accumulator (reference no_sync window,
  trainer.py:142-151); clipping is ``optax.clip_by_global_norm``; the NaN-skip
  (trainer.py:152-169) is ``optax.apply_if_finite``.
* Data parallelism: the batch is sharded over the mesh's ``dp`` axis and the
  state is replicated — XLA's GSPMD inserts the gradient psum over ICI
  (replaces DDP/NCCL, liteasr/distributed/).
* The trigger/event system (report/valid/save/inference) is unchanged in
  spirit (liteasr/utils/trigger.py) and runs on host between steps.
"""

import logging
import time
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from liteasr_tpu.data.loader import EpochDataLoader
from liteasr_tpu.parallel import (
    batch_sharding,
    gather_tree,
    get_mesh,
    is_master,
    local_dp_size,
    replicated_sharding,
    shard_batch,
    shard_tree,
)
from liteasr_tpu.utils.trigger import EventManager

logger = logging.getLogger(__name__)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # attempted optimizer steps (post-accum)
    params: Any
    batch_stats: Any
    opt_state: Any


class AccumState(flax.struct.PyTreeNode):
    mini_step: jnp.ndarray  # int32, position inside the accumulation window
    acc: Any                # running grad sum (zeros at window start)
    inner: Any              # inner transformation state


def accumulate_every_k(inner: optax.GradientTransformation,
                       k: int) -> optax.GradientTransformation:
    """Gradient accumulation with a real ``lax.cond`` around the inner chain.

    ``optax.MultiSteps`` runs the full inner update (clip + isfinite + Adam)
    on EVERY micro-step and ``where``-selects the result, costing an extra
    inner-chain's worth of HBM traffic per micro-step (~10 ms/optimizer-step
    for the 45 M-param flagship). Here hold steps only add into the
    accumulator; the inner chain executes on the emitting micro-step alone.
    Update semantics match MultiSteps: the inner chain sees the *mean* of the
    k micro-batch gradients.
    """

    def init(params):
        return AccumState(
            mini_step=jnp.zeros((), jnp.int32),
            acc=jax.tree.map(jnp.zeros_like, params),
            inner=inner.init(params))

    def update(updates, state, params=None, **extra):
        acc = jax.tree.map(jnp.add, state.acc, updates)

        def do_apply(acc, inner_state):
            mean = jax.tree.map(lambda g: g / k, acc)
            u, s = inner.update(mean, inner_state, params, **extra)
            return u, s, jax.tree.map(jnp.zeros_like, acc)

        def hold(acc, inner_state):
            zeros = jax.tree.map(jnp.zeros_like, updates)
            return zeros, inner_state, acc

        u, new_inner, new_acc = jax.lax.cond(
            state.mini_step == k - 1, do_apply, hold, acc, state.inner)
        return u, AccumState(mini_step=(state.mini_step + 1) % k,
                             acc=new_acc, inner=new_inner)

    return optax.GradientTransformation(init, update)


def build_tx(optimizer, optimization_cfg,
             flat: bool = False) -> optax.GradientTransformation:
    """clip -> adam(+schedule), NaN-protected, accumulated over accum_grad.

    ``flat=True`` wraps the chain in ``optax.flatten``: the isfinite check,
    clip, and Adam run on ONE contiguous vector instead of hundreds of
    per-leaf kernels (~350 leaves for the flagship; each transformation
    launches per-leaf ops with fixed overhead). Only valid when the
    optimizer state is replicated — the Trainer enables it iff tp == 1
    (a flat buffer cannot carry per-leaf tensor-parallel shardings).
    """
    clip = float(optimization_cfg.clip_grad_norm or 0.0)
    accum = int(optimization_cfg.accum_grad or 1)

    if flat and optimization_cfg.get("fused_step"):
        from liteasr_tpu.optims.fused_step import FusedTx

        ocfg = optimizer.cfg
        if not ocfg.get("amsgrad"):
            schedule = optimizer.schedule or (
                lambda s: jnp.full((), float(ocfg.lr), jnp.float32))
            return FusedTx(schedule, b1=ocfg.beta1, b2=ocfg.beta2,
                           eps=ocfg.eps, clip=clip,
                           weight_decay=ocfg.get("weight_decay", 0.0),
                           accum=accum)
        logger.warning("fused_step requested but amsgrad has no fused "
                       "path; using the optax chain")

    parts = []
    if clip > 0:
        parts.append(optax.clip_by_global_norm(clip))
    parts.append(optimizer.tx)
    inner = optax.apply_if_finite(
        optax.chain(*parts), max_consecutive_errors=10 ** 8)
    if flat:
        inner = optax.flatten(inner)
    if accum > 1:
        return accumulate_every_k(inner, accum)
    return inner


class Trainer:
    def __init__(self, cfg, task, model, criterion, optimizer):
        self.cfg = cfg
        self.task = task
        self.model = model
        self.criterion = criterion
        self.optimizer = optimizer
        self.iter = 0
        self.loss = 0.0
        self._loss_accum = []
        self._report_time = time.time()
        self._report_utts = 0

        self.mesh = get_mesh(cfg.distributed.dp, cfg.distributed.tp,
                             cfg.distributed.get("sp", 1))
        logger.info("mesh: %s", dict(self.mesh.shape))

        train_set = task.dataset("train")
        valid_set = task.dataset("valid")
        for ds in (train_set, valid_set):
            ds.batch_multiple = local_dp_size(self.mesh)
            ds.num_shards = jax.process_count()
            ds.shard_index = jax.process_index()

        self.train_iter = EpochDataLoader(
            train_set, shuffle=True, seed=cfg.common.seed, prefetch=2,
            num_workers=max(1, cfg.dataset.get("num_workers", 2)))
        self.valid_set = valid_set

        # ---- on-device fbank front-end (ops/fbank.py) ----
        self._fbank_bins = None
        if cfg.dataset.get("fbank", False):
            self._fbank_bins = int(cfg.dataset.get("num_mel_bins", 80))

        # ---- init state (shapes from the first real batch) ----
        impl = cfg.common.get("prng_impl")
        if impl:
            jax.config.update("jax_default_prng_impl", impl)
        rng = jax.random.PRNGKey(cfg.common.seed)
        self._base_dropout_key = jax.random.fold_in(rng, 1)
        init_batch = self._apply_frontend(train_set.collator(train_set[0]))
        variables = criterion.init_variables(model, rng, init_batch)
        # init edits flax initializers cannot express (LSTM forget-bias=1);
        # resume overwrites params wholesale, so this touches fresh inits only
        params = model.post_init_params(variables["params"])
        batch_stats = variables.get("batch_stats", {})
        n_params = sum(x.size for x in jax.tree.leaves(params))
        logger.info("model parameters: %.2fM", n_params / 1e6)

        tp = int(cfg.distributed.tp or 1)
        self.tx = build_tx(optimizer, cfg.optimization, flat=(tp == 1))
        opt_state = jax.jit(self.tx.init)(params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats, opt_state=opt_state)

        repl = replicated_sharding(self.mesh)
        # tensor-parallel param/optimizer sharding over the 'tp' axis
        # (no-op replication when tp == 1); activations follow via GSPMD
        from liteasr_tpu.parallel.sharding import (
            param_specs, state_specs, to_shardings)

        self._state_sharding = TrainState(
            step=repl,
            params=to_shardings(self.mesh, param_specs(params)),
            batch_stats=jax.tree.map(lambda _: repl, batch_stats),
            opt_state=to_shardings(
                self.mesh, state_specs(params, opt_state)),
        )
        self.state = jax.device_put(state, self._state_sharding)
        self._maybe_resume()
        self._emit_run_meta(n_params)

        # ---- on-device SpecAugment (ops/spec_augment.py) ----
        pp = cfg.get("postprocess") or {}
        self._specaug_kwargs = None
        if (pp.get("on_device", False)
                and "spec_aug" in (pp.get("workflow") or [])
                and "xlens" in init_batch
                and init_batch["xs"].ndim == 3):  # features, not raw waves
            sa = pp.get("spec_aug") or {}
            self._specaug_kwargs = dict(
                time_warp=int(sa.get("time_warp", 5)),
                time_warp_mode=str(sa.get("time_warp_mode", "bicubic")),
                freq_mask=int(sa.get("freq_mask", 30)),
                freq_mask_times=int(sa.get("freq_mask_times", 2)),
                time_mask=int(sa.get("time_mask", 40)),
                time_mask_times=int(sa.get("time_mask_times", 2)),
                replace_with_zero=bool(sa.get("replace_with_zero", False)),
            )

        # ---- compiled steps ----
        from liteasr_tpu.parallel.mesh import batch_shardings

        bsh = batch_shardings(self.mesh, init_batch)

        def train_step(state: TrainState, batch):
            step_key = jax.random.fold_in(self._base_dropout_key, state.step)
            rngs = {
                name: jax.random.fold_in(step_key, i)
                for i, name in enumerate(
                    ("dropout", "mask", "negatives", "gumbel", "chunk"))
            }
            batch = self._apply_frontend(batch)
            batch = dict(batch)
            batch["step"] = state.step  # for step-scheduled criterions
            if self._specaug_kwargs is not None:
                from liteasr_tpu.ops.spec_augment import spec_augment

                sa_key = jax.random.fold_in(step_key, 17)
                batch = dict(batch)
                batch["xs"] = spec_augment(
                    sa_key, batch["xs"], batch["xlens"],
                    **self._specaug_kwargs)

            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                loss, aux = self.criterion(
                    self.model, variables, batch, rngs=rngs, train=True)
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            if hasattr(self.tx, "apply"):  # FusedTx: one fused pass
                new_params, new_opt_state = self.tx.apply(
                    grads, state.opt_state, state.params)
            else:
                updates, new_opt_state = self.tx.update(
                    grads, state.opt_state, state.params)
                new_params = optax.apply_updates(state.params, updates)
            new_stats = aux.get("model_state", {}).get(
                "batch_stats", state.batch_stats)
            new_state = TrainState(
                step=state.step + 1, params=new_params,
                batch_stats=new_stats, opt_state=new_opt_state)
            return new_state, loss

        def eval_step(state: TrainState, batch):
            batch = self._apply_frontend(batch)
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            loss, aux = self.criterion(
                self.model, variables, batch, rngs=None, train=False)
            # surface any scalar observability metrics the criterion emits
            # (e.g. wav2vec2 contrastive accuracy) next to the valid loss
            extras = {k: v for k, v in aux.items()
                      if k != "model_state"
                      and hasattr(v, "ndim") and v.ndim == 0}
            return loss, extras

        self._train_step = jax.jit(
            train_step,
            in_shardings=(self._state_sharding, bsh),
            out_shardings=(self._state_sharding, repl),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            eval_step, in_shardings=(self._state_sharding, bsh),
            out_shardings=repl)

        self._add_events()

    def _apply_frontend(self, batch):
        """Raw-waveform batches -> log-mel features (traceable)."""
        if self._fbank_bins is None or batch["xs"].ndim != 2:
            return batch
        from liteasr_tpu.ops.fbank import log_mel_fbank

        feats, feat_lens = log_mel_fbank(
            batch["xs"], batch["xlens"], num_mel_bins=self._fbank_bins)
        out = dict(batch)
        out["xs"] = feats
        out["xlens"] = feat_lens
        return out

    # ----------------------------------------------------------- resume

    def _train_state_path(self) -> str:
        import os

        return os.path.join(
            getattr(self.task, "save_dir", "."), "train_state.msgpack")

    def _maybe_resume(self):
        import json
        import os

        resume = self.cfg.common.get("resume")
        if not resume:
            return
        path = resume if resume != "auto" and os.path.isfile(str(resume)) \
            else self._train_state_path()
        if not os.path.isfile(path):
            logger.warning("resume requested but %s not found", path)
            return
        from liteasr_tpu import checkpoint

        # gather_tree / shard_tree (not device_get / device_put): with a tp
        # axis across processes the state's shards are not process-local —
        # every process gathers the full value, reads the same file, and
        # re-contributes only its addressable shards.
        host_state = gather_tree(self.state)
        try:
            restored = checkpoint.restore_train_state(path, host_state)
        except Exception as e:
            # the usual cause: optimizer-state layout mismatch — the fused
            # path (optimization.fused_step) and the optax chain serialize
            # different trees. Fail with guidance, not a msgpack traceback.
            raise RuntimeError(
                f"cannot restore {path}: the saved optimizer state does not "
                "match this run's layout. A run must resume with the SAME "
                "optimization.fused_step setting (and accum_grad) it was "
                f"started with. Underlying error: {type(e).__name__}: {e}"
            ) from e
        self.state = shard_tree(restored, self._state_sharding)
        meta_path = path + ".meta"
        if os.path.isfile(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            self.iter = int(meta.get("iter", 0))
            self.train_iter.epoch = int(meta.get("epoch", 0))
        logger.info("resumed training state from %s (iter %d, epoch %d)",
                    path, self.iter, self.epoch)

    def _save_train_state(self, host_state=None):
        import json

        from liteasr_tpu import checkpoint

        if host_state is None:
            host_state = gather_tree(self.state)  # collective: every process
        if not is_master():
            return
        path = self._train_state_path()
        checkpoint.save_train_state(path, host_state)
        with open(path + ".meta", "w") as f:
            json.dump({"iter": self.iter, "epoch": self.epoch}, f)

    # ------------------------------------------------------------- events

    def _add_events(self):
        self.event_manager = EventManager()
        for t in self.cfg.common.trigger:
            if hasattr(self, t["name"]):
                self.event_manager.register(
                    getattr(self, t["name"]), t["interval"], t["unit"])
        # a resumed run restores iter/epoch before the events exist; snap
        # each trigger past the boundaries the pre-restart run already handled
        self.event_manager.align(self.iter, self.epoch)

    @property
    def epoch(self):
        return self.train_iter.epoch

    @property
    def max_epoch(self):
        me = self.cfg.optimization.max_epoch
        return me if me > 0 else "inf"

    @property
    def max_iter(self):
        mi = self.cfg.optimization.max_iter
        return mi if mi > 0 else "inf"

    def stop(self) -> bool:
        reach_max_epoch = (
            self.cfg.optimization.max_epoch >= 0
            and self.epoch >= self.cfg.optimization.max_epoch)
        reach_max_iter = (
            self.cfg.optimization.max_iter >= 0
            and self.iter >= self.cfg.optimization.max_iter)
        return reach_max_epoch or reach_max_iter

    # ---------------------------------------------------------------- run

    def run(self):
        accum = max(1, int(self.cfg.optimization.accum_grad or 1))
        profile_dir = self.cfg.common.get("profile_dir")
        if profile_dir and is_master():
            jax.profiler.start_trace(profile_dir)
        t0 = time.time()
        for i, batch in enumerate(self.train_iter, start=1):
            self.event_manager.trigger_epoch_events(self)
            if self.stop():
                break

            device_batch = shard_batch(self.mesh, batch)
            self.state, loss = self._train_step(self.state, device_batch)
            self._loss_accum.append(loss)
            if len(self._loss_accum) > 10000:  # bounded without a trigger
                del self._loss_accum[:5000]
            self._report_utts += int(batch["valid"].sum()) \
                if "valid" in batch else batch["xs"].shape[0]

            if i % accum == 0:
                self.iter += 1
                self.event_manager.trigger_iteration_events(self)
        if profile_dir and is_master():
            jax.profiler.stop_trace()
        logger.info("training finished in %.1fs (%d iters, %d epochs)",
                    time.time() - t0, self.iter, self.epoch)

    # ----------------------------------------------- durable results rows

    def _results_append(self, row: dict):
        """Append one JSONL row to common.results_file (master only).

        Evidence durability (VERDICT r4): run_dir lives on ephemeral hosts;
        pointing results_file inside the git repo makes per-epoch metrics
        and run provenance survive machine replacement. No reference
        counterpart — the reference's only record is train.log prose."""
        import json
        import os

        path = self.cfg.common.get("results_file")
        if not path or not is_master():
            return
        parent = os.path.dirname(os.path.abspath(path))
        os.makedirs(parent, exist_ok=True)
        with open(path, "a") as f:
            f.write(json.dumps({"ts": round(time.time(), 1), **row}) + "\n")

    def _emit_run_meta(self, n_params: int):
        import hashlib
        import sys

        from liteasr_tpu.config.core import to_yaml

        try:
            cfg_yaml = to_yaml(self.cfg)
        except Exception:  # results must never break training
            cfg_yaml = ""
        self._results_append({
            "kind": "run_meta",
            "argv": sys.argv[1:],
            "config_sha1": hashlib.sha1(cfg_yaml.encode()).hexdigest()[:12],
            "model": type(self.model).__name__,
            "criterion": type(self.criterion).__name__,
            "n_params": int(n_params),
            "run_dir": self.cfg.common.run_dir,
            "resumed_from_iter": self.iter,
        })

    # ------------------------------------------------------- event bodies

    def report_loss(self):
        if self._loss_accum:
            window = float(np.mean(jax.device_get(self._loss_accum)))
            self._loss_accum = []
        else:
            window = float("nan")
        now = time.time()
        dt = max(now - self._report_time, 1e-6)
        throughput = self._report_utts * jax.process_count() / dt
        self._report_time = now
        self._report_utts = 0
        logger.info(
            "%s / %s iters, %s / %s epochs - current loss: %.2f "
            "(%.1f utts/s)",
            self.iter, self.max_iter, self.epoch, self.max_epoch, window,
            throughput)

    def valid(self):
        losses, extras = [], []
        n = len(self.valid_set)
        order = range(n)
        for idx in order:
            batch = self.valid_set.collator(self.valid_set[idx])
            device_batch = shard_batch(self.mesh, batch)
            loss, ext = self._eval_step(self.state, device_batch)
            losses.append(loss)
            extras.append(ext)
        reduced = float(np.mean(jax.device_get(losses))) if losses else float("nan")
        suffix = ""
        if extras and extras[0]:
            host = jax.device_get(extras)
            means = {k: float(np.mean([e[k] for e in host]))
                     for k in host[0]}
            suffix = "".join(f" | {k}: {v:.4f}"
                             for k, v in sorted(means.items()))
        # keep the exact "valid loss:" phrasing — checkpoint averaging parses
        # it from train.log (liteasr/utils/checkpoint.py:55-67)
        logger.info(
            "%s / %s iters, %s / %s epochs - valid loss: %.2f%s",
            self.iter, self.max_iter, self.epoch, self.max_epoch, reduced,
            suffix)
        row = {"kind": "valid", "iter": int(self.iter),
               "epoch": int(self.epoch), "valid_loss": reduced}
        if extras and extras[0]:
            row.update({k: round(v, 6) for k, v in means.items()})
        self._results_append(row)

    def save_model(self):
        # the gather is a collective when shards span processes (tp axis):
        # EVERY process must reach it; only the master touches the disk.
        # (The reference's per-rank trainer has no such hazard; this is the
        # price of global-mesh sharding, liteasr/trainer.py:211-227.)
        host_state = gather_tree(self.state)
        if is_master():
            from liteasr_tpu.checkpoint import CKPT_TEMPLATE

            variables = {"params": host_state.params}
            if host_state.batch_stats:
                variables["batch_stats"] = host_state.batch_stats
            self.task.save_model(CKPT_TEMPLATE.format(self.epoch), variables)
        self._save_train_state(host_state)

    def inference(self):
        """Decode the test sets mid-training through the same batched,
        dp-sharded pipeline as liteasr-infer (the reference loops one
        utterance at a time, trainer.py:216-227 — per-utterance dispatch is
        ~16x slower through the remote-execution tunnel).

        EVERY process runs the decode — infer_dataset's device_puts and
        per-batch host gathers are collectives on a process-spanning mesh
        (parallel/mesh.py scatter_rows / to_host); a master-only early
        return would deadlock the other ranks. Only the master logs."""
        if "test" not in self.task.datasets:
            test_dirs = self.task.cfg.get("test")
            if not test_dirs:
                logger.warning("inference trigger set but task.test is empty")
                return
            self.task.load_dataset(
                "test", list(test_dirs), self.cfg.dataset, None)
        from liteasr_tpu.infer import infer_dataset

        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        test_sets = self.task.dataset("test")
        if not isinstance(test_sets, (list, tuple)):
            test_sets = [test_sets]
        for test_set in test_sets:
            err, length = infer_dataset(
                self.task, self.model, variables, test_set,
                self.cfg.inference,
                pad_time_multiple=self.cfg.dataset.get(
                    "pad_time_multiple", 128),
                verbose=False)
            if is_master():
                logger.info(
                    "%s / %s iters, %s / %s epochs - test error rate: "
                    "%d / %d = %.2f%%",
                    self.iter, self.max_iter, self.epoch, self.max_epoch,
                    err, length, 100.0 * err / max(length, 1))
