"""Device-side negative sampling (jit-compiled).

Replaces the reference's epoch-materialized Python rejection samplers
(utils/sampler.py:10-203).  Same statistical contract — uniform negatives
rejected against the user's seen set — but computed inside the training
step on-device with fixed shapes:

- membership tests are O(log L) binary searches against a per-user SORTED,
  sentinel-padded seen table (data/arrays.py),
- rejection is a fixed number of resample rounds (``TRIES``): a candidate
  that is still "seen" after round t is replaced by a fresh uniform draw;
  the residual collision probability is density^TRIES (< 1e-8 even for a
  user who has seen half the catalog), vs. the reference's unbounded
  ``while`` loop (utils/sampler.py:59-61),
- the reference additionally forbids duplicate negatives within one
  (u, i) group (``random_j`` set); we sample independently, which is
  statistically equivalent for metric purposes (SURVEY.md section 7.3.1).

Epoch layout parity: one reference epoch is the multiset of train pairs
repeated ``neg_ratio`` times (pairwise) or 1 positive + ``neg_ratio``
negative rows per pair (pointwise), globally shuffled
(utils/sampler.py:36-38).  We reproduce exactly that multiset with a
device-side permutation; rows past the true epoch length are weight-0
padding so batch shapes stay static.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

TRIES = 24  # resample rounds; collision prob <= density^TRIES


class SortedTable(NamedTuple):
    """Padded sorted membership table: rows[i] ascending, padded with a
    sentinel strictly greater than any valid id."""

    rows: Array   # [N, L] int32, each row sorted ascending
    lens: Array   # [N] int32


def member(table_rows: Array, x: Array) -> Array:
    """Vectorized membership: is x[b] contained in table_rows[b]?

    table_rows: [B, L] sorted rows (already gathered for the batch).
    x: [B] query ids.  Returns bool [B].
    """
    idx = jax.vmap(jnp.searchsorted)(table_rows, x)
    L = table_rows.shape[1]
    idx_c = jnp.minimum(idx, L - 1)
    return jnp.take_along_axis(table_rows, idx_c[:, None], axis=1)[:, 0] == x


def sample_not_in(key: Array, rows: Array, n_range: int,
                  shape: tuple[int, ...]) -> Array:
    """Uniform draws from [0, n_range) rejecting membership in ``rows``.

    rows: [B, L] sorted membership rows for each batch element.
    shape: output shape whose leading dim is B (e.g. (B,) or (B, K)).
    """
    draws = jax.random.randint(key, (TRIES,) + shape, 0, n_range,
                               dtype=jnp.int32)
    flat = lambda a: a.reshape(-1)
    if len(shape) == 2:
        # Expand rows across the K negatives.
        b, k = shape
        rows_q = jnp.repeat(rows, k, axis=0)       # [B*K, L]
    else:
        rows_q = rows

    def body(t, j):
        seen = member(rows_q, flat(j)).reshape(shape)
        return jnp.where(seen, draws[t], j)

    return jax.lax.fori_loop(1, TRIES, body, draws[0])


def epoch_permutation(key: Array, epoch_rows: int, padded_rows: int) -> tuple[Array, Array]:
    """Shuffled row ids for one epoch with weight-0 padding.

    Returns (perm [padded_rows], valid [padded_rows] float32).  Rows are a
    permutation of arange(padded_rows); entries >= epoch_rows are padding.
    """
    perm = jax.random.permutation(key, padded_rows)
    valid = (perm < epoch_rows).astype(jnp.float32)
    return perm, valid


# -- per-protocol batch builders -----------------------------------------
# Each takes the device tables + this step's shuffled row ids and returns a
# dict batch.  All are shape-static and run inside the scanned train step.

def pairwise_batch(key, rows, valid, pos_u, pos_i, seen_sorted, item_nums,
                   neg_ratio):
    """(u, i, j) rows: pair p repeated neg_ratio times (sampler.py:46-74)."""
    n = pos_u.shape[0]
    p = (rows % (n * neg_ratio)) // neg_ratio
    u = pos_u[p]
    i = pos_i[p]
    j = sample_not_in(key, seen_sorted[u], item_nums, u.shape)
    return {"u": u, "i": i, "j": j, "w": valid}


def pointwise_batch(key, rows, valid, pos_u, pos_i, seen_sorted, item_nums,
                    neg_ratio):
    """(u, i, y) rows: 1 positive + neg_ratio negatives per pair
    (sampler.py:10-43)."""
    n = pos_u.shape[0]
    grp = 1 + neg_ratio
    r = rows % (n * grp)
    p = r // grp
    is_pos = (r % grp) == 0
    u = pos_u[p]
    i_pos = pos_i[p]
    j = sample_not_in(key, seen_sorted[u], item_nums, u.shape)
    i = jnp.where(is_pos, i_pos, j)
    y = is_pos.astype(jnp.float32)
    return {"u": u, "i": i, "y": y, "w": valid}


def cml_batch(key, rows, valid, pos_u, pos_i, seen_sorted, item_nums,
              neg_ratio):
    """(u, i, [K negatives]) rows — one row per pair (sampler.py:77-99)."""
    n = pos_u.shape[0]
    p = rows % n
    u = pos_u[p]
    i = pos_i[p]
    negs = sample_not_in(key, seen_sorted[u], item_nums,
                         (u.shape[0], neg_ratio))
    return {"u": u, "i": i, "negs": negs, "w": valid}


def sbpr_batch(key, rows, valid, pos_u, pos_i, seen_sorted, item_nums,
               neg_ratio, spu_rows, spu_suk, spu_len):
    """(u, i, social item k, negative j, suk) rows (sampler.py:102-141).

    The caller must restrict (pos_u, pos_i) to users with non-empty SPu
    (the reference skips users without social positives, sampler.py:105-106).
    ``spu_suk[u, s]`` pre-counts how many of u's friends consumed
    ``spu_rows[u, s]`` (the reference recomputes this per sample,
    sampler.py:124-130 — it is sample-independent, so we precompute).
    The negative is rejected against seen(u) UNION SPu(u) (sampler.py:117-119);
    we test the two sorted tables separately.
    """
    n = pos_u.shape[0]
    p = (rows % (n * neg_ratio)) // neg_ratio
    u = pos_u[p]
    i = pos_i[p]
    k_key, j_key = jax.random.split(key)
    # Social item: uniform index into SPu[u] (per-row modulo by the ragged
    # list length; modulo bias is negligible at int32 range).
    s_raw = jax.random.randint(k_key, u.shape, 0, jnp.iinfo(jnp.int32).max,
                               dtype=jnp.int32)
    s = s_raw % jnp.maximum(spu_len[u], 1)
    k = jnp.take_along_axis(spu_rows[u], s[:, None], axis=1)[:, 0]
    suk = jnp.take_along_axis(spu_suk[u], s[:, None], axis=1)[:, 0]
    # Negative not in seen(u) nor SPu(u): resample against both tables.
    seen_u = seen_sorted[u]
    spu_u = spu_rows[u]
    draws = jax.random.randint(j_key, (TRIES,) + u.shape, 0, item_nums,
                               dtype=jnp.int32)

    def body(t, j):
        bad = member(seen_u, j) | member(spu_u, j)
        return jnp.where(bad, draws[t], j)

    j = jax.lax.fori_loop(1, TRIES, body, draws[0])
    return {"u": u, "i": i, "k": k, "j": j,
            "suk": suk.astype(jnp.float32), "w": valid}


def samn_batch(key, rows, valid, pos_u, pos_i, seen_sorted, item_nums,
               neg_ratio, friends_padded):
    """Pairwise rows + each user's padded friend list (sampler.py:144-166)."""
    b = pairwise_batch(key, rows, valid, pos_u, pos_i, seen_sorted,
                       item_nums, neg_ratio)
    b["friends"] = friends_padded[b["u"]]
    return b


def social_pairwise_batch(key, rows, valid, sf_u, sf_v, friends_sorted,
                          user_nums, neg_ratio):
    """Social-domain (u, v, w) triples for the dual-domain models:
    positive friend pairs with negatives rejected against the friend list
    (sampler.py:184-197)."""
    n = sf_u.shape[0]
    p = (rows % (n * neg_ratio)) // neg_ratio
    u = sf_u[p]
    v = sf_v[p]
    w = sample_not_in(key, friends_sorted[u], user_nums, u.shape)
    return {"u_s": u, "v": v, "w_neg": w, "w_s": valid}
