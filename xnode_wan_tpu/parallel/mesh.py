"""Device-mesh data parallelism.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(replicate modules, scatter the batch over local GPUs; reference
``src/training.py:93-97``). The TPU-native equivalent: a 1-D
``jax.sharding.Mesh`` over all chips with the Monte-Carlo path axis ``N``
sharded (``P('data')``) and parameters replicated. The whole outer step is
one ``jit``-compiled SPMD program — XLA inserts the ``psum``s for the loss
reductions over ICI; there is no host-side scatter/gather.

Scaling beyond data parallelism is unnecessary at this model scale
(MLPs <= 50 wide — see SURVEY §2), but the sharding helpers take the axis
name from config so a 2-D mesh can be threaded through later.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xnode_wan_tpu.ops.sampling import PathBatch


def init_distributed(**kwargs) -> None:
    """Multi-host entry point: ``jax.distributed.initialize`` passthrough.

    Single-host slices (everything this package has run on) never need
    this — ``jax.devices()`` already sees every chip on the host and the
    meshes below are process-local. On a multi-host pod, call this once
    per process before building a solver (coordinator address/process id
    via ``kwargs`` or the standard env vars); ``jax.devices()`` then spans
    the pod and ``make_mesh`` produces a global mesh whose collectives
    ride ICI within a host and DCN across hosts. Scoped per SURVEY §2:
    "``jax.distributed.initialize`` only if multi-host is ever added".

    Exercised by ``tests/test_distributed.py``: a real 2-process CPU
    "pod" (4 virtual devices each) initializes through this entry point,
    both processes build the identical 8-device global mesh via
    :func:`make_mesh`, and a cross-process ``psum`` over it returns the
    global device count in every process.
    """
    jax.distributed.initialize(**kwargs)


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    import numpy as np
    if any(d.process_index != devices[0].process_index for d in devices):
        # Multi-host: every process must build the identical global mesh.
        # The helpers here do that naturally (jax.devices() is globally
        # consistent after init_distributed), but data arrays fed from the
        # host must then be globally sharded (jax.make_array_from_*);
        # the samplers generate on-device so the solver path is safe.
        assert len(devices) == len(jax.devices()), (
            "multi-host meshes must span all devices of the pod")
    return Mesh(np.array(devices), (axis,))


def make_mesh_ensemble(devices: Sequence[jax.Device], k: int,
                       data_axis: str = "data") -> Mesh:
    """``member x data`` mesh for ``ensemble: K`` runs.

    K members on the leading ``member`` axis, each member's Monte-Carlo
    path axis sharded over the remaining ``n/K`` devices — ensemble and
    data parallelism COMPOSE (round-2 VERDICT item 3: ``ensemble: 4`` on
    8 devices must use all 8, two chips per member, not silently fall
    back to one). When K is a multiple of the device count the mesh is
    member-only (several members per device, path axis unsharded).
    Anything else is an error, never a silent degradation.
    """
    import numpy as np
    devices = list(devices)
    n = len(devices)
    if n % k == 0:
        arr = np.array(devices).reshape(k, n // k)
        return Mesh(arr, ("member", data_axis))
    if k % n == 0:
        return Mesh(np.array(devices), ("member",))
    raise ValueError(
        f"ensemble={k} cannot be laid out on {n} devices: need the member "
        f"count to divide the device count (member x data mesh) or be a "
        f"multiple of it (member-only mesh). Pick K accordingly, or pass "
        f"devices=jax.devices()[:1] to run deliberately unsharded — "
        f"refusing to silently drop the mesh.")


def make_mesh_2d(devices: Optional[Sequence[jax.Device]] = None,
                 data_axis: str = "data", tangent_axis: str = "tangent",
                 tangent_shards: int = 2) -> Mesh:
    """2-D mesh: Monte-Carlo paths over ``data``, forward-mode derivative
    directions over ``tangent``.

    The weak form needs ``d`` tangent passes through the integrator for
    ``grad_x u`` (``ops/weak_form.py``); at d=20-50 that batch is the
    second-largest axis in the program and shards cleanly — the
    sequence-parallel analogue for this workload (SURVEY §2's "natural
    analogue if stressed").
    """
    devices = list(devices if devices is not None else jax.devices())
    import numpy as np
    n = len(devices)
    assert n % tangent_shards == 0, (n, tangent_shards)
    arr = np.array(devices).reshape(n // tangent_shards, tangent_shards)
    return Mesh(arr, (data_axis, tangent_axis))


def round_up(n: int, k: int) -> int:
    return -(-n // k) * k


def batch_sharding(mesh: Mesh, axis: str = "data") -> PathBatch:
    """Per-leaf NamedShardings for a PathBatch: path axis sharded."""
    def s(*spec):
        return NamedSharding(mesh, P(*spec))
    return PathBatch(
        x=s(axis, None, None), mask=s(axis, None),
        t_start=s(axis), seed_from_h=s(axis),
    )


def shard_batch(batch: PathBatch, mesh: Optional[Mesh],
                axis: str = "data") -> PathBatch:
    """Constrain a sampled batch onto the mesh (inside jit)."""
    if mesh is None or mesh.size == 1:
        return batch
    shardings = batch_sharding(mesh, axis)
    return jax.tree.map(jax.lax.with_sharding_constraint, batch, shardings)


def replicated(mesh: Optional[Mesh]):
    if mesh is None:
        return None
    return NamedSharding(mesh, P())
