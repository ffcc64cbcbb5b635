"""Device mesh construction and distributed initialization.

TPU-native replacement for the reference's NCCL process-group setup
(``dist.init_process_group("nccl")`` at ``/root/reference/train.py:12`` and the
DDP wrap at ``train.py:26``): instead of explicit collectives, we build a
``jax.sharding.Mesh`` and let the XLA SPMD partitioner insert all-reduces over
ICI/DCN from sharding annotations.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> None:
    """Multi-host rendezvous — the c10d ``init_process_group`` equivalent
    (``/root/reference/train.py:12``). No-op single-host or if already
    initialized.

    ``KLAB_MULTIHOST=1`` turns it on. On TPU pods ``jax.distributed
    .initialize()`` autodetects coordinator/process topology from the TPU
    environment; elsewhere (CPU harness, manual clusters) the torchrun-style
    env vars ``KLAB_COORDINATOR`` (host:port), ``KLAB_NUM_PROCESSES`` and
    ``KLAB_PROCESS_ID`` pin it explicitly, and
    ``KLAB_CPU_COLLECTIVES`` (gloo|mpi) selects the cross-process CPU
    collectives backend (exercised by tools/multiprocess_smoke.py and
    tests/test_multiprocess.py on a loopback coordinator).
    """
    if os.environ.get("KLAB_MULTIHOST", "0") != "1":
        return
    if jax.distributed.is_initialized():
        return  # already initialized (e.g. by an outer harness)
    impl = os.environ.get("KLAB_CPU_COLLECTIVES", "")
    if impl:
        jax.config.update("jax_cpu_collectives_implementation", impl)
    kwargs = {}
    if os.environ.get("KLAB_COORDINATOR"):
        kwargs["coordinator_address"] = os.environ["KLAB_COORDINATOR"]
    if os.environ.get("KLAB_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["KLAB_NUM_PROCESSES"])
    if os.environ.get("KLAB_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["KLAB_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


DEFAULT_AXIS_NAMES = ("data", "fsdp", "tensor", "seq", "pipe", "expert")


def pad_mesh_shape(mesh_shape: Sequence[int],
                   n_axes: int = len(DEFAULT_AXIS_NAMES),
                   fill: int = 1) -> tuple[int, ...]:
    """Right-pad a mesh shape with 1s to the axis-name count.

    Lets 3-tuple ``(data, fsdp, tensor)`` shapes (the pre-seq-axis layout,
    still what most call sites and serialized configs pass) address the
    6-axis ``(data, fsdp, tensor, seq, pipe, expert)`` mesh unchanged.
    """
    shape = tuple(int(s) for s in mesh_shape)
    if len(shape) > n_axes:
        raise ValueError(f"mesh_shape {shape} has more than {n_axes} axes")
    return shape + (fill,) * (n_axes - len(shape))


def resolve_mesh_shape(mesh_shape: Sequence[int],
                       num_devices: int | None = None) -> tuple[int, ...]:
    """Resolve -1 entries ("all remaining devices") in the mesh shape."""
    num_devices = num_devices or len(jax.devices())
    shape = list(mesh_shape)
    fixed = int(np.prod([s for s in shape if s != -1]))
    n_wild = sum(1 for s in shape if s == -1)
    if n_wild > 1:
        raise ValueError(f"at most one -1 in mesh_shape, got {mesh_shape}")
    if n_wild == 1:
        if num_devices % fixed != 0:
            raise ValueError(
                f"mesh_shape {mesh_shape} does not divide {num_devices} devices")
        shape[shape.index(-1)] = num_devices // fixed
    if int(np.prod(shape)) != num_devices:
        raise ValueError(
            f"mesh_shape {shape} != device count {num_devices}")
    return tuple(shape)


def make_mesh(mesh_shape: Sequence[int] = (-1, 1, 1, 1, 1),
              axis_names: Sequence[str] = DEFAULT_AXIS_NAMES,
              devices: Sequence[jax.Device] | None = None,
              dcn_mesh_shape: Sequence[int] | None = None) -> Mesh:
    """Create the global device mesh.

    Axes: ``data`` (pure DP — the reference's only strategy, SURVEY.md §2D),
    ``fsdp`` (parameter/optimizer sharding), ``tensor`` (megatron-style TP for
    t5-3b/11b geometries), ``seq`` (sequence/context parallelism: activation
    sequence dims sharded via ``parallel.partitioning.seq_constraint``).
    3-tuple shapes/names from pre-seq configs are right-padded with 1 /
    ``seq``.

    Multi-slice pods: pass ``dcn_mesh_shape`` (e.g. ``(n_slices, 1, 1)``)
    with ``mesh_shape`` as the PER-SLICE shape. The hybrid mesh keeps each
    slice's devices contiguous along the fast axes, so fsdp all-gathers and
    tensor-parallel collectives ride ICI while only the data-axis gradient
    all-reduce crosses DCN — the layout "How to Scale Your Model"
    prescribes for data-parallel-across-slices. On CPU test rigs the slice
    granule falls back to the process boundary, which is how
    tests/test_multiprocess.py executes this path without a pod.

    ``seq`` shards activation sequence dims (context parallelism),
    ``pipe`` shards the transformer layer stacks into pipeline stages
    (``--pipeline_stages``), and ``expert`` shards MoE expert weights and
    dispatched tokens (``--moe_experts``); all default to 1.
    """
    devices = list(devices) if devices is not None else jax.devices()
    axis_names = tuple(axis_names)
    if set(axis_names) < set(DEFAULT_AXIS_NAMES):
        # legacy 3-axis (or shorter) name lists: extend with the missing
        # canonical axes so `seq` is always addressable
        axis_names = axis_names + tuple(
            a for a in DEFAULT_AXIS_NAMES if a not in axis_names)
    mesh_shape = pad_mesh_shape(mesh_shape, len(axis_names))
    if dcn_mesh_shape is not None:
        dcn_mesh_shape = pad_mesh_shape(dcn_mesh_shape, len(axis_names))
    if dcn_mesh_shape is not None and any(
            int(s) > 1 for s in dcn_mesh_shape):
        dcn = tuple(int(s) for s in dcn_mesh_shape)
        n_granules = int(np.prod(dcn))
        if len(devices) % n_granules != 0:
            raise ValueError(
                f"dcn_mesh_shape {dcn} needs device count divisible by "
                f"{n_granules}, got {len(devices)}")
        per_slice = resolve_mesh_shape(mesh_shape,
                                       len(devices) // n_granules)
        device_array = mesh_utils.create_hybrid_device_mesh(
            per_slice, dcn, devices=devices,
            # real TPU slices carry slice_index; the CPU multi-process rig
            # has one "slice" per OS process instead
            process_is_granule=(devices[0].platform == "cpu"),
            allow_split_physical_axes=True)
        return Mesh(device_array, tuple(axis_names))
    shape = resolve_mesh_shape(mesh_shape, len(devices))
    device_array = mesh_utils.create_device_mesh(shape, devices=devices)
    return Mesh(device_array, tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Input batches are sharded over the combined data-like axes."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


