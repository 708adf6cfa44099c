"""Multi-process / multi-host entry point.

The reference's multi-node story is HF Accelerate's launcher wrapping
torch.distributed/NCCL (reference: src/flowhigh/train/trainer.py:97-102 —
``Accelerator(...)`` + ``accelerate launch``). The TPU-native equivalent is
``jax.distributed.initialize``: every host process joins a coordination
service, after which ``jax.devices()`` is the GLOBAL device list and one
``Mesh`` built over it spans the pod — XLA routes the data-axis gradient
psums over ICI, DCN only across slices. No per-rank code: the same jitted
train step runs on every process, each feeding its local shard of the batch.

What runs where:

- ``initialize()`` — once per process, before any other jax call.
- ``make_global_mesh()`` — identical on every process (same mesh axes).
- ``batch_iterator(..., process_index=, process_count=)`` (train.data) —
  per-process DISJOINT slices of a shared global shuffle, the reference's
  DistributedSampler analog.
- ``shard_global_batch`` — assembles a global jax.Array from each process's
  local rows (``jax.make_array_from_process_local_data``).
- checkpointing — orbax coordinates multihost saves internally when handed
  sharded ``jax.Array``s; the torch-layout export runs on process 0 only
  (Trainer handles this).

Validation status: single-process logic (mesh build, shard math, disjoint
slicing) is CI-tested on the virtual 8-device CPU mesh and exercised by
``dryrun_multichip``. True multi-process runs need a real pod / multi-host
environment: coordinator rendezvous, DCN collectives, and coordinated orbax
writes cannot be simulated in one process — flagged in SURVEY §2.4 terms as
the remaining pod-side validation.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from .mesh import make_mesh

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> tuple[int, int]:
    """Join the jax distributed system; returns (process_index, process_count).

    Env-driven like the reference's ``accelerate launch`` contract: with no
    arguments, ``jax.distributed.initialize`` auto-detects TPU pod metadata,
    or honors ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` when set. A single-process run (no coordinator env,
    no args) is a no-op — the library stays import-safe on one chip.
    Idempotent: safe to call from every entry point.
    """
    global _initialized
    # NOTE: jax.process_count() would itself initialize the XLA backend,
    # after which jax.distributed.initialize refuses to run — only query it
    # when the distributed client already exists (or we know we're done).
    if _initialized or jax.distributed.is_initialized():
        _initialized = True
        return jax.process_index(), jax.process_count()

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    # pod detection: >1 TPU worker host (a single-host run — including the
    # tunneled axon chip, which sets TPU_WORKER_HOSTNAMES=localhost — has
    # nothing to rendezvous with)
    workers = [w for w in
               os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if w]
    on_pod = len(workers) > 1 or bool(
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and not on_pod:
        _initialized = True  # single-process: nothing to join
        return 0, 1

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True
    return jax.process_index(), jax.process_count()


def make_global_mesh(n_data: Optional[int] = None, n_model: int = 1):
    """Mesh over the GLOBAL device list (all processes), ICI-topology-aware.

    After ``initialize()``, ``jax.devices()`` spans the pod;
    ``mesh_utils.create_device_mesh`` orders it so the ``data`` axis rides
    ICI within a slice. Falls back to the plain reshape (CPU test meshes
    have no topology metadata)."""
    devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    try:
        from jax.experimental import mesh_utils
        dev = mesh_utils.create_device_mesh((n_data, n_model),
                                            devices=devices[: n_data * n_model])
        from jax.sharding import Mesh
        return Mesh(dev, axis_names=("data", "model"))
    except (ImportError, ValueError, AssertionError):
        return make_mesh(n_data=n_data, n_model=n_model, devices=devices)


def local_batch_slice(global_batch: int,
                      process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> slice:
    """Rows of a size-``global_batch`` batch owned by this process.
    The global batch must divide evenly (static shapes everywhere)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    assert global_batch % pc == 0, (
        f"global batch {global_batch} must divide over {pc} processes")
    per = global_batch // pc
    return slice(pi * per, (pi + 1) * per)


def shard_global_batch(mesh, local_batch):
    """Assemble global batch-sharded ``jax.Array``s from each process's
    local rows. Single-process: plain sharded device_put (same semantics).

    ``local_batch``: pytree of numpy arrays holding only THIS process's rows
    (e.g. from ``batch_iterator(..., process_index=..., process_count=...)``).
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), local_batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch)
