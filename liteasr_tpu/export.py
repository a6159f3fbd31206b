"""AOT model export: serialized StableHLO decode/forward programs.

TPU-native counterpart of the reference's TorchScript deployment hook
(``LiteasrModel.script``, liteasr/models/__init__.py:34-39). Where torch
compiles the mutable module into a self-contained TorchScript archive, the
JAX equivalent serializes the *traced computation*: ``jax.export`` captures
the jitted program as StableHLO bytecode plus its calling convention, so a
serving process can run decoding without importing any model code — it only
needs the artifact, the params pytree (the msgpack checkpoint), and a JAX
runtime for the target platform.

Params stay explicit inputs (not baked-in constants): the artifact is
checkpoint-independent, and swapping in averaged or newer params needs no
re-export.

Usage::

    blob = export_decode(model, variables, mode="attention_rescore",
                         batch=16, frames=1600, feat_dim=80)
    # ... ship blob + checkpoint to the server ...
    run = load_exported(blob)
    hyps, lens, extra = run(variables, xs, xlens)
"""

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def export_fn(fn: Callable, *example_args, platforms=None) -> bytes:
    """Serialize ``jit(fn)`` traced at the example arguments' avals.

    ``example_args`` may be arrays or ``jax.ShapeDtypeStruct``s; only
    shape/dtype are used. ``platforms`` defaults to the current backend —
    pass e.g. ``("tpu", "cpu")`` to build a multi-platform artifact.
    """
    avals = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), example_args)
    exp = jax.export.export(
        jax.jit(fn), platforms=platforms)(*avals)
    return bytes(exp.serialize())


def load_exported(blob: bytes) -> Callable:
    """Deserialize an exported program into a callable (runs under jit)."""
    exp = jax.export.deserialize(blob)
    return jax.jit(exp.call)


def export_decode(model, variables, mode: str = "attention_rescore",
                  beam_size: int = 10, ctc_weight: float = 0.5,
                  batch: int = 16, frames: int = 1600, feat_dim: int = 80,
                  platforms=None) -> bytes:
    """Export one end-to-end U2 decode pipeline at a fixed padded shape.

    Shapes are static by design (the same bucketing contract as
    ``decode._get_pipeline``); export one artifact per serving bucket.
    """
    from liteasr_tpu.decode import _get_pipeline

    pipeline = _get_pipeline(model, mode, beam_size, ctc_weight)
    xs = jax.ShapeDtypeStruct((batch, frames, feat_dim), jnp.float32)
    xlens = jax.ShapeDtypeStruct((batch,), jnp.int32)
    return export_fn(pipeline, variables, xs, xlens, platforms=platforms)


def export_forward(model, variables, batch: int, frames: int, feat_dim: int,
                   label_len: int, platforms=None) -> bytes:
    """Export the training-mode-off forward (logits) at a fixed shape."""

    def fwd(variables, xs, xlens, ys, ylens):
        return model.apply(variables, xs, xlens, ys, ylens, train=False)

    return export_fn(
        fwd, variables,
        jax.ShapeDtypeStruct((batch, frames, feat_dim), jnp.float32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        jax.ShapeDtypeStruct((batch, label_len), jnp.int32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        platforms=platforms)


def main(argv=None):
    """Export CLI — same --config-dir flow as liteasr-infer::

        python -m liteasr_tpu.export --config-dir exp/u2 \\
            inference.ckpt_name=100 inference.model_avg=true \\
            export.out=exp/u2/decode_16x1600.shlo \\
            export.mode=attention_rescore export.batch=16 export.frames=1600

    Writes the StableHLO artifact; the server needs only the artifact, the
    checkpoint, and a JAX runtime (no model code).
    """
    import json
    import logging
    import os
    import sys

    from liteasr_tpu import tasks
    from liteasr_tpu.checkpoint import load_ckpt
    from liteasr_tpu.config import compose
    from liteasr_tpu.config.core import load_yaml
    from liteasr_tpu.train import setup_logging

    args = list(argv if argv is not None else sys.argv[1:])
    config_dir = None
    if "--config-dir" in args:
        i = args.index("--config-dir")
        config_dir = args[i + 1]
        del args[i:i + 2]
    exp_over = {}
    rest = []
    for a in args:  # export.* keys are CLI-only (not part of the schema)
        if a.startswith("export."):
            k, _, v = a.partition("=")
            exp_over[k.split(".", 1)[1]] = v
        else:
            rest.append(a)
    base = load_yaml(os.path.join(config_dir, "config.yaml")) \
        if config_dir else None
    cfg = compose(rest, base=base)
    setup_logging(cfg.common.run_dir, cfg.common.log_level,
                  filename="export.log")
    logger = logging.getLogger(__name__)

    task = tasks.setup_task(cfg.task)
    # resolve the feature dim BEFORE building: training runs persist
    # input_dim unresolved ('???' — the task probes it from data), so
    # either take export.feat_dim or probe the test set like infer does
    if "feat_dim" in exp_over:
        cfg.model.input_dim = int(exp_over["feat_dim"])
    elif not isinstance(cfg.model.get("input_dim"), int):
        task.load_dataset("test", list(task.cfg.test), cfg.dataset, None)
        cfg.model.input_dim = task.feat_dim
    model = task.build_model(cfg.model)
    variables = load_ckpt(cfg.inference)

    mode = exp_over.get("mode", "attention_rescore")
    batch = int(exp_over.get("batch", 16))
    frames = int(exp_over.get("frames", 1600))
    feat_dim = int(cfg.model.input_dim)
    out = exp_over.get("out") or os.path.join(
        cfg.common.run_dir, f"{mode}_{batch}x{frames}.shlo")
    platforms = tuple(exp_over["platforms"].split(",")) \
        if "platforms" in exp_over else None

    blob = export_decode(model, variables, mode=mode, batch=batch,
                         frames=frames, feat_dim=feat_dim,
                         platforms=platforms)
    with open(out, "wb") as f:
        f.write(blob)
    with open(out + ".json", "w") as f:
        json.dump({"mode": mode, "batch": batch, "frames": frames,
                   "feat_dim": feat_dim, "bytes": len(blob)}, f)
    logger.info("exported %s (%.1f MB) -> %s", mode, len(blob) / 1e6, out)
    return out


if __name__ == "__main__":
    main()
