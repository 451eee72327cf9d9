"""Device-mesh construction and env-batch sharding.

The reference's entire parallelism story is multiprocessing pipes
(SURVEY.md §5.8). Here the equivalent is a ``jax.sharding.Mesh`` with the
env batch laid out over a ``dp`` axis (and the learner's hidden dimension
optionally over ``tp``); the same compiled step then runs SPMD with XLA
inserting collectives over ICI.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_env_batch",
    "replicated",
    "shard_ppo_state",
    "gather_trajectory",
    "scaling_report",
]


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    tp: int = 1,
) -> Mesh:
    """A ``(dp, tp)`` mesh over ``devices`` (default: all local devices).

    ``tp`` splits off a tensor-parallel axis for the learner; the remaining
    devices form the data-parallel env axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % tp == 0, f"device count {n} not divisible by tp={tp}"
    grid = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(grid, ("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding that replicates a pytree over the whole mesh."""
    return NamedSharding(mesh, P())


def make_mesh_two_level(
    devices: Sequence[jax.Device] | None = None, hosts: int = 2
) -> Mesh:
    """A ``(hosts, chips)`` mesh: the multi-host factorization of SURVEY
    §5.8 (ICI inside a host row, DCN across rows). The env batch shards over
    BOTH axes; env stepping needs no collective on either, learner
    all-reduces span both (XLA reduces hierarchically: chips over ICI, then
    hosts over DCN)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % hosts == 0, f"device count {n} not divisible by hosts={hosts}"
    grid = np.asarray(devices).reshape(hosts, n // hosts)
    return Mesh(grid, ("hosts", "chips"))


def shard_env_batch(
    tree: Any,
    mesh: Mesh,
    batch_size: int | None = None,
    axis: str | tuple = "dp",
) -> Any:
    """Place a batched env pytree with its leading axis split over ``axis``
    (one mesh axis name, or a tuple of names for multi-level meshes, e.g.
    ``("hosts", "chips")``).

    Leaves whose leading dimension equals ``batch_size`` (inferred from the
    largest common leading dim when ``None``) shard over ``axis``; everything
    else — scalars, shared PRNG keys — replicates.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    if batch_size is None:
        dims = [leaf.shape[0] for leaf in leaves if getattr(leaf, "ndim", 0) >= 1]
        assert dims, "cannot infer batch size from a tree of scalars"
        batch_size = max(set(dims), key=dims.count)

    def put(leaf):
        leaf = jax.numpy.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[0] == batch_size:
            spec = P(axis, *([None] * (leaf.ndim - 1)))
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, tree)


def gather_trajectory(traj: Any, mesh: Mesh) -> Any:
    """All-gather a dp-sharded trajectory pytree onto every device
    (SURVEY.md §5.8: "all-gather of trajectory slices to the learner").

    The gather is expressed as a resharding to the replicated layout — XLA
    emits an ``all-gather`` over the ``dp`` axis riding ICI. Use only at
    learner boundaries; the rollout itself should stay sharded.
    """
    return jax.device_put(traj, replicated(mesh))


def scaling_report(step_fn, args, mesh: Mesh, iters: int = 10) -> dict:
    """Measure SPMD scaling of ``step_fn(*args)`` over ``mesh`` vs one device.

    Returns wall-clock per call for the sharded and single-device layouts and
    the implied scaling efficiency. Meaningful on real multi-chip hardware
    (virtual CPU devices share the same cores)."""
    import time

    f = jax.jit(step_fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    sharded = (time.perf_counter() - t0) / iters

    single = jax.devices()[0]
    args1 = jax.tree_util.tree_map(lambda x: jax.device_put(x, single), args)
    out = f(*args1)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args1)
    jax.block_until_ready(out)
    alone = (time.perf_counter() - t0) / iters

    n = mesh.devices.size
    return {
        "devices": n,
        "sharded_s": sharded,
        "single_device_s": alone,
        "scaling_efficiency": alone / (sharded * n),
    }


def shard_ppo_state(state: Any, mesh: Mesh, axis: str | tuple = "dp") -> Any:
    """Lay out a :class:`~gymnasium_tpu.train.PPOState` on ``mesh``.

    Env carry (including its batched PRNG state) shards over ``axis``
    (default the ``dp`` axis; pass ``("hosts", "chips")`` on a two-level
    mesh); params and optimizer state replicate (sharding the MLP hidden
    axis over ``tp`` is profitable only for much larger models — XLA still
    runs the replicated matmuls data-parallel over the dp-sharded batch).
    """
    from gymnasium_tpu.train.ppo import PPOState

    num_envs = state.obs.shape[0]
    return PPOState(
        params=jax.device_put(state.params, replicated(mesh)),
        opt_state=jax.device_put(state.opt_state, replicated(mesh)),
        # WrappedEnvCarry shards too: per-env leaves (frame buffers, return
        # accumulators) split over dp, shared stats (RMS mean/var) replicate.
        env_carry=shard_env_batch(state.env_carry, mesh, batch_size=num_envs, axis=axis),
        obs=shard_env_batch(state.obs, mesh, batch_size=num_envs, axis=axis),
        rng=jax.device_put(state.rng, replicated(mesh)),
        update_count=jax.device_put(state.update_count, replicated(mesh)),
    )
