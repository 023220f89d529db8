"""Device mesh and sharding utilities.

TPU-native replacement for the reference's distributed runtime (SURVEY.md
§2.10): Lightning DDP/NCCL/DistributedSampler become one
``jax.sharding.Mesh`` with a ``data`` axis (pure DP — the gradient all-reduce
is the compiler-inserted psum in the jitted step) plus a spare ``model`` axis
for fsdp-style parameter sharding of the XXL-at-512px long-sequence case.

The reference implements data parallelism only (no TP/PP/SP/EP anywhere —
grep-verified, SURVEY §2.10); model sizes (<=1.1B) never require more. The
``model`` axis here is the forward-looking extension point the reference's
``bd_env.py`` plugin stub corresponds to.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``data=None`` uses all remaining devices for data parallelism. Device
    order follows ``jax.devices()`` so the data axis rides ICI within a slice.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def ambient_mesh():
    """The mesh from the innermost ``jax.set_mesh`` context.

    The SP/TP trunk executors accept ``mesh=None`` and resolve it here, so
    the model-level ``trunk_parallel`` knob works inside a Flax ``__call__``
    without threading a Mesh through module attributes — the train/predict
    loops already run under ``jax.set_mesh(self.mesh)``.
    """
    m = jax.sharding.get_abstract_mesh()
    if m is None or not m.shape:
        raise RuntimeError(
            "no ambient mesh — wrap the call in jax.set_mesh(mesh) (the "
            "Experiment loops do) or pass mesh= explicitly"
        )
    return m


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis (the DP input layout)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, batch dim over ``data``."""
    sharding = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def param_partition_spec(path_leaf, *, model_axis_size: int, min_size: int = 2**20):
    """fsdp-style spec for one parameter: shard the largest divisible axis.

    Small params stay replicated; large ones shard their biggest dimension
    that divides the model-axis size. Returns a PartitionSpec.
    """
    x = path_leaf
    if model_axis_size <= 1 or x.size < min_size:
        return P()
    dims = list(x.shape)
    # prefer the largest axis divisible by the model axis
    order = sorted(range(len(dims)), key=lambda i: -dims[i])
    for i in order:
        if dims[i] % model_axis_size == 0:
            spec = [None] * len(dims)
            spec[i] = MODEL_AXIS
            return P(*spec)
    return P()


def shard_params(mesh: Mesh, params, min_size: int = 2**20):
    """Apply fsdp-style sharding to a parameter pytree on ``mesh``."""
    model_size = mesh.shape[MODEL_AXIS]

    def place(x):
        spec = param_partition_spec(x, model_axis_size=model_size, min_size=min_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)


def param_shardings(mesh: Mesh, params, min_size: int = 2**20):
    """The NamedSharding pytree matching :func:`shard_params` (for jit specs)."""
    model_size = mesh.shape[MODEL_AXIS]
    return jax.tree.map(
        lambda x: NamedSharding(
            mesh, param_partition_spec(x, model_axis_size=model_size, min_size=min_size)
        ),
        params,
    )
