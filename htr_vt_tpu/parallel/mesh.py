"""Device mesh and sharding layout.

The reference trains on one GPU (SURVEY §2.8 — no distributed anything); here
scaling is expressed as sharding from day one:

- ``data`` axis: batch-sharded inputs, replicated parameters. For this ~25 M
  parameter model DP over ICI is the correct strategy — gradients are reduced
  by the XLA collectives jit inserts when the loss averages a batch-sharded
  array.
- ``model`` axis (optional): tensor-sharding of the ViT MLP/attention weights
  for the multi-chip dry-run path and for serving very large batch widths;
  rules in :func:`param_sharding_rules`.

Multi-host: call :func:`maybe_initialize_distributed` first (uses
``jax.distributed.initialize`` when launched under a multi-process runtime),
then build one global mesh over all devices; DCN-spanning axes should be the
outermost mesh dimension.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from htr_vt_tpu.config import ParallelConfig


def maybe_initialize_distributed() -> None:
    """Initialize multi-process JAX when env vars indicate a multi-host launch
    (no-op for single-process; the reference has no equivalent — §2.8).
    Idempotent: callers may initialize earlier themselves (e.g. to override
    jax_platforms first) and still run fit()."""
    if not os.environ.get("HTRVT_COORDINATOR"):
        return
    # Idempotency fast path: when the caller initialized distributed itself
    # (e.g. to set jax_platforms before first backend touch), a second
    # initialize() does NOT raise the "called once" error — if the backend
    # has been touched since, it raises "must be called before any JAX
    # calls", which is indistinguishable from a real ordering bug. The
    # client check is private API, so fall through to the public call if it
    # moves.
    try:
        from jax._src import distributed as _dist
        if getattr(_dist.global_state, "client", None) is not None:
            return
    except Exception:
        pass
    try:
        jax.distributed.initialize(
            coordinator_address=os.environ["HTRVT_COORDINATOR"],
            num_processes=int(os.environ.get("HTRVT_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("HTRVT_PROCESS_ID", "0")),
        )
    except RuntimeError as e:
        # Public-API idempotency backstop (only reachable if the private
        # check above failed): a duplicate initialize() raises "should only
        # be called once". Anything else is a real failure.
        if "once" not in str(e) and "already" not in str(e):
            raise


def make_mesh(cfg: ParallelConfig = ParallelConfig(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if cfg.mesh_shape is None:
        shape: Tuple[int, ...] = (len(devices), 1)
    else:
        shape = cfg.mesh_shape
        if len(shape) == 1:
            shape = (shape[0], 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, cfg: ParallelConfig = ParallelConfig()) -> NamedSharding:
    """Leading-axis batch sharding for images/labels."""
    return NamedSharding(mesh, P(cfg.data_axis))


def put_global_batch(batch: dict, sharding: NamedSharding) -> dict:
    """Host batch dict -> batch-sharded global jax.Arrays.

    Single-process: a plain device_put of the full batch. Multi-process:
    each process contributes ITS OWN rows of the global batch via
    ``jax.make_array_from_process_local_data`` — the loader's
    shard_rank/shard_count slicing (data/loader.py) matches the mesh's
    device order (jax.devices() orders by process), so process p's rows
    land on process p's devices with zero cross-host traffic.
    """
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {k: jax.make_array_from_process_local_data(sharding, v)
            for k, v in batch.items()}


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(path: Tuple, leaf, mesh: Mesh,
                         cfg: ParallelConfig = ParallelConfig()) -> NamedSharding:
    """Tensor-parallel layout for the transformer weights when the mesh has a
    nontrivial model axis; otherwise fully replicated.

    Megatron-style: QKV/MLP-in column-sharded (last dim), proj/MLP-out
    row-sharded (first dim), everything else replicated — activations then
    need a single psum per block which XLA inserts automatically.
    """
    model_parallel = mesh.shape[cfg.model_axis] > 1
    if not model_parallel or getattr(leaf, "ndim", 0) < 2:
        return replicated(mesh)
    names = [str(getattr(k, "key", k)) for k in path]
    joined = "/".join(names)
    axis = cfg.model_axis
    if "qkv" in joined or "fc1" in joined:
        return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1)), axis))
    if ("attn" in joined and "proj" in joined) or "fc2" in joined:
        return NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1))))
    return replicated(mesh)


def shard_params(params, mesh: Mesh, cfg: ParallelConfig = ParallelConfig()):
    """Place a parameter pytree on the mesh according to the rules above."""
    def place(path, leaf):
        return jax.device_put(leaf, param_sharding_rules(path, leaf, mesh, cfg))
    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh, cfg: ParallelConfig = ParallelConfig()):
    """The sharding pytree (for jit in_shardings/out_shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: param_sharding_rules(path, leaf, mesh, cfg), params)
