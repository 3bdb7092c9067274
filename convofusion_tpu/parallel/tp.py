"""Tensor-parallel parameter sharding rules.

The production model (~30 M params) needs only data parallelism
(SURVEY.md §2.4), but larger variants shard naturally: every FFN /
projection pair in the transformer stacks is a column-parallel -> row-
parallel Megatron pattern over the 'model' mesh axis.  These rules place
the big Dense kernels accordingly; under jit, XLA inserts the
reduce-scatter/all-reduce collectives over ICI automatically.

Rules are regex patterns over the flattened param path.  Anything
unmatched stays replicated.
"""
from __future__ import annotations

import re
from typing import Dict, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, partition spec for the kernel); biases follow the kernel's
# output axis
TP_RULES: List[Tuple[str, P]] = [
    # FFN: linear1 column-parallel, linear2 row-parallel
    (r".*/ffn/linear1/kernel", P(None, "model")),
    (r".*/ffn/linear1/bias", P("model")),
    (r".*/ffn/linear2/kernel", P("model", None)),
    # TimeBlock out layers (d -> d) column-parallel on output
    (r".*/time_block\d/out_layers_2/kernel", P(None, "model")),
    (r".*/time_block\d/out_layers_2/bias", P("model")),
    # attention projections: q/k/v column-parallel, out row-parallel
    (r".*/(q|k|v)_proj/kernel", P(None, "model")),
    (r".*/(q|k|v)_proj/bias", P("model")),
    (r".*/out_proj/kernel", P("model", None)),
    # T5 ff
    (r".*/wi/kernel", P(None, "model")),
    (r".*/wo/kernel", P("model", None)),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def tp_shardings(params, mesh: Mesh):
    """Param tree -> NamedSharding tree applying TP_RULES (else replicate)."""

    def place(path, leaf):
        p = _path_str(path)
        for pattern, spec in TP_RULES:
            if re.fullmatch(pattern, p):
                # skip specs that don't divide the leaf shape evenly
                ok = True
                for dim, axis in enumerate(spec):
                    if axis is None:
                        continue
                    size = mesh.shape[axis]
                    if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
                        ok = False
                if ok:
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(place, params)


def apply_tp(params, mesh: Mesh):
    """device_put the params with TP placement."""
    shardings = tp_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def describe_tp(params, mesh: Mesh) -> Dict[str, int]:
    """Count sharded vs replicated params (for logs/tests)."""
    shardings = tp_shardings(params, mesh)
    counts = {"sharded": 0, "replicated": 0}
    for s in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: x.spec, shardings)):
        if any(a is not None for a in s):
            counts["sharded"] += 1
        else:
            counts["replicated"] += 1
    return counts
