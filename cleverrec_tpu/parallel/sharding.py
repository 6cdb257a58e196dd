"""Sharding rules + explicit row-sharded embedding exchange.

Two tiers (SURVEY.md section 7.1 L8):

1. GSPMD tier (default): embedding tables get ``P('model', None)`` row
   sharding, everything else is replicated; batches are constrained to
   ``P('data')``.  XLA inserts the collectives.  This is what the Trainer
   uses when given a mesh and what ``__graft_entry__.dryrun_multichip``
   validates.

2. Explicit tier: ``row_sharded_gather`` is a shard_map lookup where each
   device resolves the ids it owns and a single ``psum`` over the
   ``model`` axis combines partial rows — the classic sharded-embedding
   exchange, differentiable (the backward pass is a local scatter-add +
   identity psum).  Used by the perf path and tested against the dense
   gather on the 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _is_embedding_table(x, meta) -> bool:
    """Row-shardable = 2D with a leading dim that is one of the entity
    cardinalities (user/item counts, possibly +1 for sentinel rows)."""
    if getattr(x, "ndim", 0) != 2:
        return False
    n = x.shape[0]
    cards = {meta.user_nums, meta.user_nums + 1,
             meta.item_nums, meta.item_nums + 1,
             meta.user_nums + meta.item_nums}
    return n in cards


def _rowshardable(x, meta, mesh: Mesh) -> bool:
    """Row-shard only when the leading dim divides over the model axis;
    odd-sized tables (e.g. sentinel-row +1 tables) stay replicated —
    GSPMD requires divisibility and these are the rare small cases."""
    return (_is_embedding_table(x, meta)
            and x.shape[0] % mesh.shape["model"] == 0)


def shard_params(params: Any, meta, mesh: Mesh) -> Any:
    """device_put params with row-sharded tables, replicated leaves."""
    def place(x):
        spec = P("model", None) if _rowshardable(x, meta, mesh) else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(place, params)


def param_sharding_tree(params: Any, meta, mesh: Mesh) -> Any:
    def spec(x):
        s = P("model", None) if _rowshardable(x, meta, mesh) else P()
        return NamedSharding(mesh, s)
    return jax.tree_util.tree_map(spec, params)


def shard_batch_spec(mesh: Mesh):
    """Constrain a batch pytree's leading axis onto the data axis."""
    def constrain(batch):
        def go(x):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("data")))
        return jax.tree_util.tree_map(go, batch)
    return constrain


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


# -- explicit shard_map embedding exchange --------------------------------

def row_sharded_gather(table: jax.Array, ids: jax.Array, mesh: Mesh,
                       axis: str = "model",
                       data_axis: str | None = None) -> jax.Array:
    """Gather rows of a row-sharded table by global ids.

    table: [N, d] with N divisible by the axis size, sharded P(axis, None).
    ids:   integer array of ANY shape (flattened internally); replicated
           along ``axis``.  With ``data_axis`` given, the flattened ids are
           kept sharded along that axis and the gathered rows come back
           P(data_axis, None) — each id's row crosses ICI exactly once
           (per-data-shard psum over the model axis); without it, ids and
           output are replicated.
    Each device contributes the rows it owns; one psum over ``axis``
    assembles full rows — the all-to-all-free formulation of the sharded
    lookup.  Differentiable (backward = local scatter-add + identity psum).
    """
    def local(table_shard, ids_local):
        size = table_shard.shape[0]
        start = jax.lax.axis_index(axis) * size
        local_ids = ids_local - start
        owned = (local_ids >= 0) & (local_ids < size)
        safe = jnp.clip(local_ids, 0, size - 1)
        part = jnp.where(owned[:, None], table_shard[safe], 0.0)
        return jax.lax.psum(part, axis)

    flat = ids.reshape(-1)
    id_spec = P(data_axis) if data_axis else P()
    out_spec = P(data_axis, None) if data_axis else P()
    rows = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), id_spec),
        out_specs=out_spec, check_vma=False,
    )(table, flat)
    return rows.reshape(ids.shape + (table.shape[1],))


class ExchangeTable:
    """A traced-value VIEW of a row-sharded embedding table that routes
    integer-array indexing through the explicit shard_map exchange
    (``row_sharded_gather``) while remaining transparent to every other
    use: jnp functions convert it back to the raw (GSPMD-sharded) array
    via ``__jax_array__`` (e.g. CML's covariance ``jnp.concatenate`` over
    the full tables, full-catalog scoring matmuls).

    Constructed INSIDE the traced loss (see Trainer's explicit tier), so
    differentiation still runs w.r.t. the raw params pytree — no pytree
    registration is needed.
    """

    __slots__ = ("_a", "_mesh", "_axis", "_data_axis")

    def __init__(self, array, mesh: Mesh, axis: str = "model",
                 data_axis: str | None = None):
        self._a = array
        self._mesh = mesh
        self._axis = axis
        self._data_axis = data_axis

    @property
    def shape(self):
        return self._a.shape

    @property
    def dtype(self):
        return self._a.dtype

    @property
    def ndim(self):
        return self._a.ndim

    def __jax_array__(self):
        return self._a

    def __getitem__(self, idx):
        if (getattr(idx, "ndim", None) is not None
                and jnp.issubdtype(jnp.asarray(idx).dtype, jnp.integer)):
            # Tables whose row count does not divide the model axis are
            # padded INSIDE the traced view (zero rows, never addressed;
            # their grads are sliced away by the pad's transpose), so the
            # exchange works for every table, not just divisible ones.
            table = pad_table_for_sharding(self._a,
                                           self._mesh.shape[self._axis])
            return row_sharded_gather(table, jnp.asarray(idx), self._mesh,
                                      self._axis, data_axis=self._data_axis)
        return self._a[idx]


def wrap_explicit_exchange(params: Any, meta, mesh: Mesh,
                           data_axis: str | None = None) -> Any:
    """Wrap every embedding-table leaf in an ``ExchangeTable`` view
    (the ``parallel.exchange=explicit`` trainer tier).  Non-table leaves
    (dense towers, output vectors) pass through untouched."""
    def wrap(x):
        if _is_embedding_table(x, meta):
            return ExchangeTable(x, mesh, data_axis=data_axis)
        return x
    return jax.tree_util.tree_map(wrap, params)


def pad_table_for_sharding(table, n_shards: int):
    """Pad a table's leading dim up to a multiple of n_shards (the padded
    rows are never addressed — ids stay < original N)."""
    n = table.shape[0]
    pad = (-n) % n_shards
    if pad == 0:
        return table
    return jnp.concatenate(
        [table, jnp.zeros((pad,) + table.shape[1:], table.dtype)], axis=0)


def sharded_train_step(model, optimizer, mesh: Mesh, item_nums: int,
                       neg_ratio: int):
    """A standalone jitted full train step over the mesh: device-side
    pairwise sampling -> forward -> grads -> optimizer update, with
    batches on P('data') and tables on P('model', None).

    Returned fn signature:
        step(params, opt_state, key, arrays, rows, valid)
            -> (params, opt_state, loss)
    ``arrays`` needs pos_u/pos_i/seen as in the Trainer; ``rows``
    are this step's shuffled epoch row ids, ``valid`` their weights.
    """
    import optax
    from cleverrec_tpu import sampling

    constrain = shard_batch_spec(mesh)

    def step(params, opt_state, key, arrays, rows, valid):
        batch = sampling.pairwise_batch(
            key, rows, valid, arrays["pos_u"], arrays["pos_i"],
            arrays["seen"], item_nums, neg_ratio)
        batch = constrain(batch)
        loss, grads = jax.value_and_grad(model.loss)(params, batch, arrays)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))
