"""Ensemble solves: batched parameter sweeps in one compiled program.

Another capability with no analogue in the serial C++ reference (which
runs one deck per process): because the solve is a pure function of its
parameters, `jax.vmap` turns it into a batched solve over an ensemble
of parameter sets — opacity samples, source candidates, temperature
perturbations — in ONE XLA program whose batch axis fuses into the
existing (M, G) lane batching (the VPU sees a bigger, better-utilised
batch, not a Python loop). Use cases: uncertainty propagation, design
sweeps, and batched inverse problems (compose with adjoint.py:
``jax.vmap(jax.grad(...))`` gives per-member gradients).

Multi-chip: an ensemble is embarrassingly parallel, so the batch axis
shards perfectly over a `jax.sharding.Mesh` — `solve_ensemble(...,
mesh=...)` places each member's whole solve on one device with zero
collectives (the sharding propagates through the vmapped program).
This composes with, rather than replaces, the spatial/group
decompositions of parallel/ — shard the ensemble axis when you have
many small problems, shard space/groups when you have one big one.

Parameters follow adjoint.traced_tables: any subset of {'kappa',
'rho', 'psi_source', 'T'}, each stacked along a leading ensemble axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config.config import Config
from .models import transport
from .models.transport import State, Tables
from . import adjoint


def _batch_size(params: dict) -> int:
    sizes = {int(np.shape(v)[0]) for v in params.values()}
    if len(sizes) != 1:
        raise ValueError(
            f"ensemble leaves disagree on the leading axis: {sorted(sizes)}"
        )
    return sizes.pop()


def make_ensemble_solve(
    cfg: Config,
    tables: Tables,
    num_steps: Optional[int] = None,
    remat: bool = True,
    shared_state: bool = True,
):
    """Build ``ens_fn(params, state) -> State`` where every leaf of
    ``params`` carries a leading ensemble axis and the returned State's
    leaves carry it too.

    ``shared_state``: True (default) broadcasts one initial State to
    every member (pass None to rebuild psi = B_g per member from the
    traced tables — required for 'T' ensembles, whose initial
    condition varies); False expects the State leaves themselves
    stacked along the ensemble axis.
    """
    solve_fn = adjoint.make_diff_solve(cfg, tables, num_steps, remat=remat)
    state_axis = None if shared_state else 0

    def ens_fn(params: dict, state: Optional[State] = None) -> State:
        axes = ({k: 0 for k in params}, state_axis)
        return jax.vmap(solve_fn, in_axes=axes)(params, state)

    return ens_fn


def solve_ensemble(
    cfg: Config,
    tables: Tables,
    params: dict,
    num_steps: Optional[int] = None,
    state: Optional[State] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    remat: bool = True,
) -> State:
    """Run an ensemble of solves; one compiled program, optionally
    sharded over a device mesh along the ensemble axis.

    ``params``: dict of stacked parameter leaves, e.g.
    ``{'kappa': (K, G) array}`` for K opacity samples. ``mesh``: a
    1-axis Mesh; the batch axis is sharded over it (K must divide the
    device count evenly or vice versa), each member solving wholly on
    one device with zero collectives. Returns the final State with a
    leading ensemble axis on every leaf.
    """
    if not params:
        raise ValueError("empty params: nothing to batch over")
    k = _batch_size(params)
    ens_fn = make_ensemble_solve(
        cfg, tables, num_steps, remat=remat, shared_state=True)
    params = {key: jnp.asarray(v) for key, v in params.items()}

    if mesh is None:
        return jax.jit(ens_fn)(params, state)

    if len(mesh.axis_names) != 1:
        raise ValueError(
            f"ensemble sharding wants a 1-axis mesh, got {mesh.axis_names}")
    axis = mesh.axis_names[0]
    nd = mesh.devices.size
    if k % nd != 0:
        raise ValueError(
            f"ensemble size {k} must divide evenly over {nd} devices")
    pspec = jax.sharding.PartitionSpec(axis)
    sharding = jax.sharding.NamedSharding(mesh, pspec)
    params = {key: jax.device_put(v, sharding) for key, v in params.items()}
    out_spec = jax.sharding.NamedSharding(mesh, pspec)
    fn = jax.jit(
        ens_fn,
        out_shardings=jax.tree_util.tree_map(lambda _: out_spec,
                                             jax.eval_shape(ens_fn, params, state)),
    )
    return fn(params, state)


def observe_phi(cfg: Config, tables: Tables, final: State) -> jnp.ndarray:
    """Scalar-flux observable for a stacked ensemble State: (K, G, N)."""
    wt = np.asarray(tables.wt)
    return jax.vmap(
        lambda e: transport.compute_phi(transport.psi_from_ends(e), wt)
    )(final.ends)
