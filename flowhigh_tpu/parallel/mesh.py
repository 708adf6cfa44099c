"""Device mesh + sharding rules.

The reference's distributed story is DDP via HF Accelerate/NCCL
(reference: src/flowhigh/train/trainer.py:97-102,150-159) — gradient
all-reduce hidden inside DDP. The TPU-native equivalent is GSPMD: build a
``Mesh`` over ICI, annotate the batch axis with a ``data`` mesh axis and
(optionally) large kernels with a ``model`` axis, and let XLA insert the
psum/all-gather collectives. No hand-written comms.

Axes:
- ``data``  — batch sharding (DP). Gradients all-reduce over ICI
  automatically when params are replicated along it.
- ``model`` — optional tensor parallelism: the vector field's wide Dense
  kernels shard on their output/input dims. For the reference-size model
  (50 M params) this is about latency, not memory; the rules below only
  shard kernels whose dims divide evenly, so any mesh shape compiles.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices")
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over ``data``."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _kernel_spec(path: tuple, leaf: jax.Array, n_model: int) -> P:
    """Tensor-parallel rule: shard the widest divisible dim of 2D kernels.

    Column-parallel for in-projections (shard outputs), row-parallel for
    out-projections (shard inputs) — XLA inserts the reduce on the residual.
    """
    if n_model <= 1 or leaf.ndim != 2:
        return P()
    name = "/".join(str(getattr(p, "key", p)) for p in path)
    din, dout = leaf.shape
    if ("to_qkv" in name or "proj_in" in name) and dout % n_model == 0:
        return P(None, "model")
    if ("to_out" in name or "proj_out" in name) and din % n_model == 0:
        return P("model", None)
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding tree for a param pytree: replicate everything except the
    transformer's wide kernels when a model axis exists."""
    n_model = mesh.shape["model"]

    def rule(path, leaf):
        return NamedSharding(mesh, _kernel_spec(path, leaf, n_model))

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with the batch axis sharded over ``data``."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), s), batch)
