"""Tensor-parallel sharding rules.

Megatron-style layout over the mesh's ``tp`` axis, expressed as path-based
``PartitionSpec`` rules on the flax param tree; XLA's GSPMD propagates the
matching activation shardings and inserts the all-reduces at the attention /
FFN block boundaries (scaling-book recipe: annotate params, let the compiler
place collectives).

* FFN: fc1 kernel (d, ff) -> P(None, 'tp'); fc2 kernel (ff, d) -> P('tp', None)
* attention: q/k/v projections column-sharded, output projection row-sharded
* conformer pointwise convs follow the FFN pattern
* everything else (LN, biases of row-sharded layers, embeddings, small
  heads) replicated

The optimizer state (adam moments, accumulated grads) mirrors the param tree
structure; specs are matched onto it by path suffix + shape.
"""

import re
from typing import Any, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, kernel spec, bias spec); first match wins.
_TP_RULES: Tuple[Tuple[str, P, P], ...] = (
    # column-parallel: expand d -> ff / d -> 2d
    (r"(feed_forward|feed_forward_macaron)/fc1$", P(None, "tp"), P("tp")),
    (r"pointwise_conv1$", P(None, "tp"), P("tp")),
    (r"(self_attn|src_attn)/linear_[qkv]$", P(None, "tp"), P("tp")),
    (r"(self_attn|src_attn)/linear_pos$", P(None, "tp"), P("tp")),
    # row-parallel: contract ff -> d
    (r"(feed_forward|feed_forward_macaron)/fc2$", P("tp", None), P()),
    (r"pointwise_conv2$", P("tp", None), P()),
    (r"(self_attn|src_attn)/linear_o$", P("tp", None), P()),
)


def _spec_for(path: str, shape) -> P:
    parent, _, leaf = path.rpartition("/")
    for pattern, kspec, bspec in _TP_RULES:
        if re.search(pattern, parent):
            spec = kspec if leaf == "kernel" else bspec
            if len(spec) == len(shape):
                return spec
            if leaf == "bias" and len(shape) == 1:
                return bspec
            return P()
    # rel-pos attention biases: (heads, d_k) -> heads over tp
    if leaf in ("pos_bias_u", "pos_bias_v") and len(shape) == 2:
        return P("tp", None)
    return P()


def _path_str(path) -> str:
    keys = []
    for p in path:
        if hasattr(p, "key"):
            keys.append(str(p.key))
        elif hasattr(p, "idx"):
            keys.append(str(p.idx))
        else:
            keys.append(str(p))
    return "/".join(keys)


def param_specs(params: Any) -> Any:
    """PartitionSpec pytree for a flax param tree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    specs = [_spec_for(_path_str(path), leaf.shape) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, specs)


def state_specs(params: Any, template: Any) -> Any:
    """Map param specs onto an arbitrary state pytree (optimizer moments,
    grad accumulators) by path-suffix + shape match; replicate the rest."""
    param_index: Dict[Tuple[Tuple[str, ...], Tuple[int, ...]], P] = {}
    p_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in p_flat:
        keys = tuple(_path_str(path).split("/"))
        spec = _spec_for(_path_str(path), leaf.shape)
        param_index[(keys, tuple(leaf.shape))] = spec

    def lookup(path, leaf):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        keys = tuple(_path_str(path).split("/"))
        for (p_keys, p_shape), spec in param_index.items():
            if p_shape == shape and len(keys) >= len(p_keys) \
                    and keys[-len(p_keys):] == p_keys:
                return spec
        return P()

    flat = jax.tree_util.tree_flatten_with_path(template)[0]
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(
        treedef, [lookup(path, leaf) for path, leaf in flat])


def to_shardings(mesh: Mesh, specs: Any) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))
