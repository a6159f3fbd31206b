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
