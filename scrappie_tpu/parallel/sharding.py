"""Device mesh and sharding helpers.

Multi-chip strategy (SURVEY.md section 2 "Parallelism"): models are tiny
(~1 MB) so weights are replicated; reads/chunks are data-parallel over
the mesh's 'data' axis; the widest matmul (hidden -> 1025-state output)
can additionally be tensor-sharded over 'state'.  XLA inserts the ICI
collectives from the shardings — there is no hand-written communication.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_state: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_state
    devices = devices[: n_data * n_state].reshape(n_data, n_state)
    return Mesh(devices, ("data", "state"))


def data_spec() -> P:
    return P("data")


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_params(params: dict, mesh: Mesh, state_shard_keys=()) -> dict:
    """Place parameters: replicated, except listed output-layer weights
    which shard their last axis over 'state' (tensor parallelism)."""
    out = {}
    for k, v in params.items():
        if (k in state_shard_keys and v.ndim == 2 and mesh.shape["state"] > 1
                and v.shape[0] % mesh.shape["state"] == 0):
            # Shard the contraction (hidden) axis: XLA psum-reduces the
            # partial products over 'state' (1025 outputs don't divide).
            spec = P("state", None)
        else:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out
