"""Device-side negative sampling (jit-compiled).

Replaces the reference's epoch-materialized Python rejection samplers
(utils/sampler.py:10-203).  Same statistical contract — uniform negatives
rejected against the user's seen set — but computed inside the training
step on-device with fixed shapes.

Membership structure (``MemberTable``), two execution paths chosen at
table-build time (a static decision, so jit traces exactly one):

- bitmap path (default for CleverRec-scale data): per-entity packed
  uint32 bitmaps, membership = one gather + bit test, O(1) per query;
- sorted-rows path (fallback when the bitmap would exceed the budget,
  e.g. Epinions' user×user friend sets): per-entity sorted sentinel-padded
  rows, membership = O(log L) binary search.

Rejection is ONE vectorized round: draw ``TRIES`` candidates per slot,
test all of them at once, take the first unseen (``argmax`` over the
try axis).  Residual collision probability is density^TRIES (< 1e-8 even
for a user who has seen half the catalog) vs. the reference's unbounded
``while`` loop (utils/sampler.py:59-61).  The reference additionally
forbids duplicate negatives within one (u, i) group (``random_j`` set);
we sample independently — statistically equivalent for metric purposes
(SURVEY.md section 7.3.1).

Epoch layout parity: one reference epoch is the multiset of train pairs
repeated ``neg_ratio`` times (pairwise) or 1 positive + ``neg_ratio``
negative rows per pair (pointwise), globally shuffled
(utils/sampler.py:36-38).  We reproduce exactly that multiset with a
device-side permutation; rows past the true epoch length are weight-0
padding so batch shapes stay static.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Candidate draws per slot: one WIDE vectorized draw is a single cheap
# kernel, while each corrective round is a sequential small-kernel pass
# (measured ~1.6ms/step for 8 rounds on v5e) — so prefer width to rounds.
TRIES = 32  # collision prob <= density^TRIES per slot
EXTRA_ROUNDS = 2
# Bitmaps cost id_range/8 bytes per entity and unlock the cheapest
# membership test (2 gathers/draw), the fused eval kernel, and the
# bitmap-sliced streaming mask.  1GB covers a ~170k-item catalog at 50k
# users on a 16GB-HBM chip whose training state at that scale is <1GB;
# above it, sorted-rows binary search takes over.
BITMAP_BUDGET_BYTES = 1 << 30


COMPLEMENT_BUDGET_BYTES = 2 << 30  # direct unseen-table sampling cap
# (v5e HBM is 16GB; a ~1-2GB complement table buys exact single-gather
# negatives where the bitmap-rejection fallback costs 2-3 gathers/draw.
# Note: on many-users workloads the scan path is dense-Adam/HBM-bound,
# not sampling-bound, so this is about sampling exactness + the fused
# path's epoch-tensor draw, not scan-path speed.)


class MemberTable(NamedTuple):
    """Per-entity membership sets over an id range [0, id_range)."""

    rows: Array        # [N, L] int32 sorted, padded with sentinel id_range
    lens: Array        # [N] int32
    bits: Array | None  # [N, ceil(id_range/32)] uint32, or None
    # Complement table [N, id_range]: row e lists the ids NOT in e's set
    # (first id_range - lens[e] slots valid).  When present, negative
    # sampling is a single exact uniform gather — no rejection at all.
    complement: Array | None = None


def build_member_table(sets: dict[int, list[int]], n_entities: int,
                       id_range: int,
                       bitmap_budget: int = BITMAP_BUDGET_BYTES,
                       complement_budget: int = COMPLEMENT_BUDGET_BYTES,
                       need_rows: bool = True,
                       ) -> MemberTable:
    """Host-side construction from {entity: [member ids]}.

    ``need_rows=False`` skips the [N, max_set_size] sorted-rows plane
    when a bitmap or complement covers the table's uses (membership
    tests and negative draws) — union tables over seen+social sets can
    have ~catalog-sized members per entity, making the rows plane a
    GB-scale array that nothing reads.  Rows are still built if neither
    bitmap nor complement fits its budget (they become the only
    membership structure)."""
    lens = np.zeros(n_entities, dtype=np.int32)
    for e, ids in sets.items():
        lens[e] = len(set(ids))

    n_words = -(-id_range // 32)
    bits = None
    if n_entities * n_words * 4 <= bitmap_budget:
        bits = np.zeros((n_entities, n_words), dtype=np.uint32)
        for e, ids in sets.items():
            a = np.asarray(ids, dtype=np.int64)
            np.bitwise_or.at(bits[e], a >> 5,
                             (np.uint32(1) << (a & 31).astype(np.uint32)))

    fits_complement = n_entities * id_range * 4 <= complement_budget
    if need_rows or (bits is None and not fits_complement):
        width = max(int(max(len(v) for v in sets.values()) if sets
                        else 1), 1)
        rows = np.full((n_entities, width), id_range, dtype=np.int32)
        for e, ids in sets.items():
            ids = sorted(set(ids))
            rows[e, : len(ids)] = np.asarray(ids, dtype=np.int32)
    else:
        rows = np.full((n_entities, 1), id_range, dtype=np.int32)

    complement = None
    if fits_complement:
        # Row e = all ids with e's members moved to the tail; valid prefix
        # length = id_range - lens[e].
        complement = np.tile(np.arange(id_range, dtype=np.int32),
                             (n_entities, 1))
        for e, ids in sets.items():
            s = np.asarray(sorted(set(ids)), dtype=np.int64)
            if s.size:
                mask = np.zeros(id_range, bool)
                mask[s] = True
                complement[e, : id_range - s.size] = np.flatnonzero(~mask)
                complement[e, id_range - s.size:] = s
    return MemberTable(rows=rows, lens=lens, bits=bits,
                       complement=complement)


def complement_from_bits(bits, id_range: int,
                         chunk: int = 2048) -> Array:
    """Device-side complement construction from a membership bitmap:
    row e = the ids NOT in e's set first (ascending), members after —
    the exact layout the host builder produces — via a STABLE argsort
    of the unpacked mask (False rows sort first, ties keep id order).

    Exists because a [N, id_range] complement is GB-scale: building it
    on host costs a GB-scale host->device transfer (minutes over this
    container's tunneled chip), while the bitmap it derives from is
    32x smaller.  Chunked over entities to bound the unpacked-mask
    working set."""
    import jax

    iota = jnp.arange(id_range, dtype=jnp.int32)
    word_idx = iota >> 5
    shift = (iota & 31).astype(jnp.uint32)

    @jax.jit
    def unpack_sort(b):
        words = b[:, word_idx]                         # [C, I] uint32
        mask = ((words >> shift) & 1).astype(jnp.uint8)
        return jnp.argsort(mask, axis=1, stable=True).astype(jnp.int32)

    bits = jnp.asarray(bits)
    outs = [unpack_sort(bits[s:s + chunk])
            for s in range(0, bits.shape[0], chunk)]
    return jnp.concatenate(outs, axis=0)


def rows_to_bits(rows: Array, id_range: int) -> Array:
    """Device-side packed-bitmap construction from sorted member rows:
    [B, L] int32 ids (sentinel = id_range padding) -> [B, ceil(id_range/32)]
    uint32 bitmaps — the per-BATCH bitmap slab for catalogs whose global
    [N, W] bitmap exceeds the budget (VERDICT round-2 task 4: past-budget
    full-catalog eval keeps the bitmap-sliced masking path by building
    only the current batch's rows on device, ~20MB per 512-user batch at
    a 319k catalog instead of a multi-GB table).

    Ids within a row are unique, so scatter-ADD of single-bit words is
    exactly scatter-OR; sentinel entries contribute a zero word."""
    n_words = (id_range + 31) // 32
    b = rows.shape[0]
    words = jnp.minimum(rows >> 5, n_words - 1)
    bit = jnp.where(rows < id_range,
                    jnp.uint32(1) << (rows & 31).astype(jnp.uint32),
                    jnp.uint32(0))
    out = jnp.zeros((b, n_words), jnp.uint32)
    return out.at[jnp.arange(b, dtype=jnp.int32)[:, None], words].add(bit)


def attach_device_complement(table: MemberTable,
                             id_range: int) -> MemberTable:
    """Attach a DEVICE-built complement to a bits-bearing table when the
    [N, id_range] plane fits the budget (the single policy point for
    both the seen table and the social union tables)."""
    if (table.complement is None and table.bits is not None
            and table.bits.shape[0] * id_range * 4
            <= COMPLEMENT_BUDGET_BYTES):
        return table._replace(
            complement=complement_from_bits(table.bits, id_range))
    return table


def member(table: MemberTable, e: Array, x: Array) -> Array:
    """Is x[b, ...] a member of entity e[b]'s set?

    e: [B] entity ids; x: [B] or [B, ...] query ids (batch axis leading).
    """
    flat = x.reshape(x.shape[0], -1)                     # [B, M]
    if table.bits is not None:
        bm = table.bits[e]                               # [B, W]
        word = jnp.take_along_axis(bm, (flat >> 5).astype(jnp.int32), axis=1)
        res = (word >> (flat & 31).astype(jnp.uint32)) & 1
        return res.astype(bool).reshape(x.shape)
    rows = table.rows[e]                                 # [B, L]
    idx = jax.vmap(jnp.searchsorted)(rows, flat)         # [B, M]
    idx_c = jnp.minimum(idx, rows.shape[1] - 1)
    res = jnp.take_along_axis(rows, idx_c, axis=1) == flat
    return res.reshape(x.shape)


def unseen_by_rank(table: MemberTable, e: Array, r: Array) -> Array:
    """Exact r-th UNSEEN id per entity — order statistics over the
    complement, computed from the sorted rows alone.

    e: [B] entity ids; r: [B] or [B, K] complement ranks in
    [0, id_range - lens[e]).  The r-th unseen id is ``r + c`` where
    ``c = |{j < lens[e] : rows[e, j] - j <= r}|`` — every seen id at or
    below the answer shifts it up by one.  ``rows[e, j] - j`` is
    nondecreasing over the REAL entries (rows are sorted unique), so c
    is one vectorized binary search: ceil(log2(L+1)) element gathers
    per draw, no rejection, no tries multiplier, any catalog size.
    The search is clamped to lens[e]: the sentinel pads (id_range)
    make ``rows - j`` NON-monotone past lens.

    Given the same rank r this returns exactly
    ``complement[e, r]`` — the complement-table tier's draw — so the
    two tiers produce IDENTICAL samples from identical uniforms.
    """
    rows = table.rows
    L = rows.shape[1]
    r2 = r.reshape(r.shape[0], -1)                      # [B, M]
    eb = jnp.broadcast_to(e[:, None], r2.shape)
    flat = rows.reshape(-1)
    base = eb.astype(jnp.int32) * L
    lo = jnp.zeros_like(r2)
    hi = jnp.broadcast_to(table.lens[e][:, None], r2.shape)
    for _ in range(max(L, 1).bit_length()):
        mid = (lo + hi) >> 1
        sj = flat[base + jnp.minimum(mid, L - 1)]
        pred = (mid < hi) & ((sj - mid) <= r2)
        lo = jnp.where(pred, mid + 1, lo)
        hi = jnp.where(pred, hi, mid)
    return (r2 + lo).reshape(r.shape)


def _reject(key: Array, e: Array, n_range: int, shape: tuple[int, ...],
            is_bad, extra_rounds: int = EXTRA_ROUNDS,
            tries: int = TRIES) -> Array:
    """Draw uniforms avoiding ``is_bad`` sets: one vectorized
    ``tries``-wide round (first-good wins), then up to ``extra_rounds``
    cheap corrective redraws of the still-bad stragglers.  Residual miss
    probability is density^(tries + extra_rounds) per slot."""
    key0, key1 = jax.random.split(key)
    draws = jax.random.randint(key0, shape + (tries,), 0, n_range,
                               dtype=jnp.int32)
    bad = is_bad(draws)                                   # [*shape, T]
    first = jnp.argmax(~bad, axis=-1)                     # [*shape]
    j = jnp.take_along_axis(draws, first[..., None], axis=-1)[..., 0]

    # Fixed-trip corrective rounds (static bounds compile leaner than a
    # data-dependent while_loop and the expected work is ~0 rounds).
    def body(i, j):
        new = jax.random.randint(jax.random.fold_in(key1, i), j.shape,
                                 0, n_range, dtype=jnp.int32)
        both = jnp.stack([j, new], axis=-1)
        bad2 = is_bad(both)
        # Switch to the fresh draw only when it strictly improves.
        take_new = bad2[..., 0] & ~bad2[..., 1]
        return jnp.where(take_new, new, j)

    return jax.lax.fori_loop(0, extra_rounds, body, j)


def sample_not_in(key: Array, table: MemberTable, e: Array, n_range: int,
                  shape: tuple[int, ...]) -> Array:
    """Uniform draws from [0, n_range) avoiding entity e's set.

    shape: output shape with batch leading; shape[0] == e.shape[0].
    Complement path (default for CleverRec-scale tables): EXACT uniform over
    the unseen set via one indexed gather — no rejection; otherwise a
    vectorized bitmap/binary-search rejection pass whose width adapts to
    the table's STATIC density bound (rows.shape[1] / n_range): a sparse
    100k+ catalog with <=40 seen items per user collides on 0.04% of
    draws, where the fixed 32-wide round wasted 30 draws + membership
    tests per slot (~8x of a big-catalog epoch's sampling cost).
    """
    exact = (table.complement is not None
             or (table.bits is None and table.rows.shape[1] > 1))
    if exact:
        n_un = jnp.maximum(n_range - table.lens[e], 1)     # [B]
        r = jax.random.randint(key, shape, 0, jnp.iinfo(jnp.int32).max,
                               dtype=jnp.int32)
        idx = r % (n_un[:, None] if len(shape) == 2 else n_un)
        if table.complement is None:
            # Rows-only tier (catalog past the bitmap budget): the
            # SAME exact rank draw, resolved by binary search over the
            # sorted rows instead of a complement gather — identical
            # samples, no rejection (replaces the binary-search
            # rejection pass that dominated big-catalog epochs).
            return unseen_by_rank(table, e, idx)
        # POINT gathers (complement[e, idx]) — never complement[e], which
        # would materialize [B, id_range] rows per step.
        if len(shape) == 2:
            return table.complement[e[:, None], idx]
        return table.complement[e, idx]
    w = table.rows.shape[1]
    if w > 1:           # width-1 rows are need_rows=False stubs: no bound
        density = min(w / n_range, 0.99)
        # Per-slot miss <= density^tries <= 2^-24 (+2 corrective rounds).
        tries = int(min(TRIES, max(2, math.ceil(
            24.0 / max(-math.log2(density), 1e-6)))))
    else:
        tries = TRIES
    return _reject(key, e, n_range, shape,
                   lambda q: member(table, e, q), tries=tries)


def sample_not_in_popular(key: Array, table: MemberTable, e: Array,
                          pop_cdf: Array, shape: tuple[int, ...]) -> Array:
    """Popularity-proportional negatives avoiding entity e's set.

    pop_cdf: [id_range] cumulative item-popularity distribution.  Draws
    TRIES candidates by CDF inversion, keeps the first unseen, then runs
    corrective redraw rounds like ``_reject`` (the popularity-biased
    analog of ``sample_not_in``; used when ``neg_sampling=popularity`` —
    see Chen et al. 2017 on sampling strategies for implicit CF).

    The corrective rounds matter MORE here than in the uniform sampler:
    the per-draw collision probability is the user's seen POPULARITY
    MASS, not seen density — a heavy user whose ratings concentrate in
    the catalog head can hold >=0.9 of the mass, making all-TRIES-seen
    a percent-level event rather than a negligible one."""

    def draw(k, shp):
        uni = jax.random.uniform(k, shp)
        cand = jnp.searchsorted(pop_cdf, uni.reshape(-1)).reshape(
            uni.shape).astype(jnp.int32)
        return jnp.clip(cand, 0, pop_cdf.shape[0] - 1)

    key0, key1 = jax.random.split(key)
    cand = draw(key0, shape + (TRIES,))
    bad = member(table, e, cand)
    first = jnp.argmax(~bad, axis=-1)
    j = jnp.take_along_axis(cand, first[..., None], axis=-1)[..., 0]

    def body(i, j):
        new = draw(jax.random.fold_in(key1, i), j.shape)
        both = jnp.stack([j, new], axis=-1)
        bad2 = member(table, e, both)
        take_new = bad2[..., 0] & ~bad2[..., 1]
        return jnp.where(take_new, new, j)

    return jax.lax.fori_loop(0, EXTRA_ROUNDS, body, j)


def _draw_negatives(key, seen, u, item_nums, shape, pop_cdf=None):
    if pop_cdf is not None:
        return sample_not_in_popular(key, seen, u, pop_cdf, shape)
    return sample_not_in(key, seen, u, item_nums, shape)


def epoch_permutation(key: Array, epoch_rows: int, padded_rows: int) -> tuple[Array, Array]:
    """Shuffled row ids for one epoch with weight-0 padding.

    Returns (perm [padded_rows], valid [padded_rows] float32).  Rows are a
    permutation of arange(padded_rows); entries >= epoch_rows are padding.
    """
    perm = jax.random.permutation(key, padded_rows)
    valid = (perm < epoch_rows).astype(jnp.float32)
    return perm, valid


def pairwise_epoch_static(pos_u: np.ndarray, pos_i: np.ndarray,
                          lens: np.ndarray, item_nums: int, padded: int,
                          neg_ratio: int):
    """Host-side per-RUN constants for ``pairwise_epoch_tensors``: the
    epoch's rows in PAIR ORDER (pair p occupies rows p*neg_ratio ..),
    padded to the step grid.  Computing these once kills three of the
    four per-epoch XLA gathers (TPU gathers cost ~8ns/element regardless
    of table size — profiled: they dominated the sampling pass)."""
    rows_total = len(pos_u) * neg_ratio
    u = np.zeros(padded, np.int32)
    i = np.zeros(padded, np.int32)
    u[:rows_total] = np.repeat(pos_u, neg_ratio)
    i[:rows_total] = np.repeat(pos_i, neg_ratio)
    # Valid complement-row prefix = number of UNSEEN items.
    n_un = np.ones(padded, np.int32)
    n_un[:rows_total] = np.maximum(
        item_nums - np.asarray(lens)[u[:rows_total]], 1)
    w = np.zeros(padded, np.float32)
    w[:rows_total] = 1.0
    return {"ord_u": u, "ord_i": i, "ord_nun": n_un, "ord_w": w}


def pointwise_epoch_static(pos_u: np.ndarray, pos_i: np.ndarray,
                           lens: np.ndarray, item_nums: int, padded: int,
                           neg_ratio: int):
    """Host-side per-RUN constants for ``pointwise_epoch_tensors``: the
    epoch's rows in GROUP order (pair p occupies rows p*(1+neg_ratio)..,
    slot 0 the positive, the rest negatives — sampler.py:10-43's layout),
    padded to the step grid."""
    grp = 1 + neg_ratio
    rows_total = len(pos_u) * grp
    u = np.zeros(padded, np.int32)
    i = np.zeros(padded, np.int32)
    u[:rows_total] = np.repeat(pos_u, grp)
    i[:rows_total] = np.repeat(pos_i, grp)
    y = np.zeros(padded, np.float32)
    y[np.arange(0, rows_total, grp)] = 1.0
    n_un = np.ones(padded, np.int32)
    n_un[:rows_total] = np.maximum(
        item_nums - np.asarray(lens)[u[:rows_total]], 1)
    w = np.zeros(padded, np.float32)
    w[:rows_total] = 1.0
    return {"ord_u": u, "ord_i": i, "ord_y": y, "ord_nun": n_un,
            "ord_w": w}


def _epoch_negatives(jkey, static, seen: MemberTable, item_nums: int,
                     padded: int, pop_cdf, k: int | None = None):
    """One whole-epoch negative draw for a static row layout: the exact
    complement-table path is one randint + one modulo + ONE gather; the
    rejection/popularity fallback chunks the draw (a (padded, TRIES)
    materialization would be GBs at big-catalog scale).  With ``k`` the
    draw is [padded, k] (k independent negatives per row — the CML
    protocol), still a single gather."""
    u = static["ord_u"]
    shape = (padded,) if k is None else (padded, k)
    exact = (seen.complement is not None
             or (seen.bits is None and seen.rows.shape[1] > 1))
    if exact and pop_cdf is None:
        r = jax.random.randint(jkey, shape, 0,
                               jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        nun = static["ord_nun"] if k is None else static["ord_nun"][:, None]
        idx = r % nun
        if seen.complement is None:
            # Rows-only tier: identical exact rank draw resolved by
            # binary search over the sorted rows (unseen_by_rank) — one
            # whole-epoch pass, no chunking (nothing TRIES-wide is
            # materialized), no rejection.  Replaced a binary-search
            # rejection pass that was ~half the 319k-catalog epoch.
            return unseen_by_rank(seen, u, idx)
        flat = seen.complement.reshape(-1)
        base = u * seen.complement.shape[1]
        return flat[(base if k is None else base[:, None]) + idx]
    chunk = min(1 << 14, padded)
    n_chunks = -(-padded // chunk)
    pad_n = n_chunks * chunk - padded
    u_p = jnp.pad(u, (0, pad_n)).reshape(n_chunks, chunk)
    keys = jax.random.split(jkey, n_chunks)

    def one(args):
        ck, e = args
        cshape = (chunk,) if k is None else (chunk, k)
        return _draw_negatives(ck, seen, e, item_nums, cshape, pop_cdf)

    out = jax.lax.map(one, (keys, u_p))
    if k is None:
        return out.reshape(-1)[:padded]
    return out.reshape(-1, k)[:padded]


def pointwise_epoch_tensors(key, static: dict, seen: MemberTable,
                            item_nums: int, steps: int, b: int,
                            pop_cdf=None):
    """The whole epoch's (u, i, y, w) as [steps, b] tensors — the
    pointwise analog of ``pairwise_epoch_tensors``: one negative draw
    over the static group-order layout (positive slots keep their item),
    then one multi-operand ``lax.sort`` global shuffle.  Distributionally
    identical to per-step ``pointwise_batch`` draws and the same epoch
    layout the reference materializes (utils/sampler.py:10-43)."""
    padded = steps * b
    jkey, skey = jax.random.split(key)
    j = _epoch_negatives(jkey, static, seen, item_nums, padded, pop_cdf)
    i = jnp.where(static["ord_y"] > 0, static["ord_i"], j)
    keys = jax.random.bits(skey, (padded,), jnp.uint32)
    _, u_s, i_s, y_s, w_s = jax.lax.sort(
        (keys, static["ord_u"], i, static["ord_y"], static["ord_w"]),
        num_keys=1)
    return {"u": u_s.reshape(steps, b),
            "i": i_s.reshape(steps, b),
            "y": y_s.reshape(steps, b),
            "w": w_s.reshape(steps, b)}


def pairwise_epoch_tensors(key, static: dict, seen: MemberTable,
                           item_nums: int, steps: int, b: int,
                           pop_cdf=None):
    """The whole epoch's (u, i, j, w) as [steps, b] tensors.

    Device work per epoch is exactly: one randint, one modulo, ONE gather
    (the exact complement-table negative draw), and one multi-operand
    ``lax.sort`` that shuffles (u, i, j, w) together — replacing the
    permutation + three row gathers of the naive layout (every XLA TPU
    gather costs ~8ns/element, so gather count is THE sampling cost).
    Distributionally identical to per-step draws and the same epoch
    layout the reference materializes (utils/sampler.py:46-74).
    """
    padded = steps * b
    jkey, skey = jax.random.split(key)
    j = _epoch_negatives(jkey, static, seen, item_nums, padded, pop_cdf)
    keys = jax.random.bits(skey, (padded,), jnp.uint32)
    _, u_s, i_s, j_s, w_s = jax.lax.sort(
        (keys, static["ord_u"], static["ord_i"], j, static["ord_w"]),
        num_keys=1)
    return {"u": u_s.reshape(steps, b),
            "i": i_s.reshape(steps, b),
            "j": j_s.reshape(steps, b),
            "w": w_s.reshape(steps, b)}


def sbpr_epoch_static(pos_u: np.ndarray, pos_i: np.ndarray,
                      social_lens: np.ndarray, spu_lens: np.ndarray,
                      spu_off: np.ndarray, item_nums: int, padded: int,
                      neg_ratio: int):
    """Host-side per-RUN constants for ``sbpr_epoch_tensors``: the
    pairwise row layout of ``pairwise_epoch_static`` plus each row's
    SPu draw geometry (CSR offset + list length) and the negative
    draw's complement count w.r.t. the seen-UNION-SPu exclusion set
    (``social_neg`` — utils/sampler.py:117-119 semantics)."""
    rows_total = len(pos_u) * neg_ratio
    u = np.zeros(padded, np.int32)
    i = np.zeros(padded, np.int32)
    u[:rows_total] = np.repeat(pos_u, neg_ratio)
    i[:rows_total] = np.repeat(pos_i, neg_ratio)
    n_un = np.ones(padded, np.int32)
    n_un[:rows_total] = np.maximum(
        item_nums - np.asarray(social_lens)[u[:rows_total]], 1)
    w = np.zeros(padded, np.float32)
    w[:rows_total] = 1.0
    spulen = np.ones(padded, np.int32)
    spulen[:rows_total] = np.maximum(
        np.asarray(spu_lens)[u[:rows_total]], 1)
    spuoff = np.zeros(padded, np.int32)
    spuoff[:rows_total] = np.asarray(spu_off)[u[:rows_total]]
    return {"ord_u": u, "ord_i": i, "ord_nun": n_un, "ord_w": w,
            "ord_spulen": spulen, "ord_spuoff": spuoff}


def sbpr_epoch_tensors(key, static: dict, social_neg: MemberTable,
                       spu_csr, item_nums: int, steps: int, b: int):
    """The whole epoch's (u, i, k, j, suk, w) as [steps, b] tensors —
    the SBPR-protocol analog of ``pairwise_epoch_tensors`` (round-4
    verdict item 1: per-step sampling was 113.5ms of the 336.7ms
    Epinions epoch).  Device work per epoch: one complement gather for
    the negative (exclusion = seen UNION SPu, exact via social_neg's
    complement), TWO gathers for the social item + its suk coefficient
    (CSR-flat SPu lists), and one multi-operand ``lax.sort`` shuffle.
    Distributionally identical to per-step ``sbpr_batch`` draws and the
    reference's epoch materialization (utils/sampler.py:102-141)."""
    padded = steps * b
    jkey, kkey, skey = jax.random.split(key, 3)
    j = _epoch_negatives(jkey, static, social_neg, item_nums, padded,
                         None)
    raw = jax.random.randint(kkey, (padded,), 0,
                             jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    sidx = static["ord_spuoff"] + raw % static["ord_spulen"]
    k = spu_csr["flat"][sidx]
    suk = spu_csr["suk"][sidx].astype(jnp.float32)
    keys = jax.random.bits(skey, (padded,), jnp.uint32)
    _, u_s, i_s, k_s, j_s, w_s, suk_s = jax.lax.sort(
        (keys, static["ord_u"], static["ord_i"], k, j, static["ord_w"],
         suk), num_keys=1)
    return {"u": u_s.reshape(steps, b), "i": i_s.reshape(steps, b),
            "k": k_s.reshape(steps, b), "j": j_s.reshape(steps, b),
            "suk": suk_s.reshape(steps, b),
            "w": w_s.reshape(steps, b)}


def tbpr_epoch_static(pos_u: np.ndarray, pos_i: np.ndarray,
                      social_lens: np.ndarray, ts_lens: np.ndarray,
                      ts_off: np.ndarray, tw_lens: np.ndarray,
                      tw_off: np.ndarray, item_nums: int, padded: int,
                      neg_ratio: int):
    """Host-side constants for ``tbpr_epoch_tensors``: the pairwise row
    layout plus BOTH tie lists' draw geometry (strong + weak CSR
    offsets/lengths) and the negative draw's complement count w.r.t.
    seen UNION strong UNION weak (models/social.py TBPR)."""
    base = sbpr_epoch_static(pos_u, pos_i, social_lens, ts_lens, ts_off,
                             item_nums, padded, neg_ratio)
    rows_total = len(pos_u) * neg_ratio
    u = base["ord_u"]
    twlen = np.ones(padded, np.int32)
    twlen[:rows_total] = np.maximum(
        np.asarray(tw_lens)[u[:rows_total]], 1)
    twoff = np.zeros(padded, np.int32)
    twoff[:rows_total] = np.asarray(tw_off)[u[:rows_total]]
    return {**base, "ord_twlen": twlen, "ord_twoff": twoff}


def tbpr_epoch_tensors(key, static: dict, social_neg: MemberTable,
                       ts_csr, tw_csr, item_nums: int, steps: int,
                       b: int):
    """The whole epoch's (u, i, s, t, j, w) as [steps, b] tensors — the
    TBPR-protocol analog of ``sbpr_epoch_tensors``: one exact negative
    draw via the triple-union complement, two CSR tie-item gathers, one
    multi-operand sort shuffle."""
    padded = steps * b
    jkey, skey2, tkey, pkey = jax.random.split(key, 4)
    j = _epoch_negatives(jkey, static, social_neg, item_nums, padded,
                         None)
    raw_s = jax.random.randint(skey2, (padded,), 0,
                               jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    s = ts_csr["flat"][static["ord_spuoff"]
                       + raw_s % static["ord_spulen"]]
    raw_t = jax.random.randint(tkey, (padded,), 0,
                               jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    t = tw_csr["flat"][static["ord_twoff"]
                       + raw_t % static["ord_twlen"]]
    keys = jax.random.bits(pkey, (padded,), jnp.uint32)
    _, u_s, i_s, s_s, t_s, j_s, w_s = jax.lax.sort(
        (keys, static["ord_u"], static["ord_i"], s, t, j,
         static["ord_w"]), num_keys=1)
    return {"u": u_s.reshape(steps, b), "i": i_s.reshape(steps, b),
            "s": s_s.reshape(steps, b), "t": t_s.reshape(steps, b),
            "j": j_s.reshape(steps, b), "w": w_s.reshape(steps, b)}


def cml_epoch_tensors(key, static: dict, seen: MemberTable,
                      item_nums: int, steps: int, b: int,
                      pop_cdf=None, *, neg_ratio: int):
    """The whole epoch's (u, i, negs[K], w) as [steps, b(, K)] tensors —
    the CML-protocol analog of ``pairwise_epoch_tensors`` (one row per
    pair, K negatives each; sampler.py:77-99's layout).  The static
    layout is ``pairwise_epoch_static(..., neg_ratio=1)``.  One
    [padded, K] complement gather + one multi-operand ``lax.sort``
    shuffles (u, i, w) and the K negative columns together."""
    padded = steps * b
    jkey, skey = jax.random.split(key)
    negs = _epoch_negatives(jkey, static, seen, item_nums, padded,
                            pop_cdf, k=neg_ratio)
    keys = jax.random.bits(skey, (padded,), jnp.uint32)
    ops = (keys, static["ord_u"], static["ord_i"], static["ord_w"],
           *(negs[:, k] for k in range(neg_ratio)))
    srt = jax.lax.sort(ops, num_keys=1)
    return {"u": srt[1].reshape(steps, b),
            "i": srt[2].reshape(steps, b),
            "w": srt[3].reshape(steps, b),
            "negs": jnp.stack(srt[4:], axis=1).reshape(steps, b,
                                                       neg_ratio)}


# -- per-protocol batch builders -----------------------------------------
# Each takes the device tables + this step's shuffled row ids and returns a
# dict batch.  All are shape-static and run inside the scanned train step.

def pairwise_batch(key, rows, valid, pos_u, pos_i, seen: MemberTable,
                   item_nums, neg_ratio, pop_cdf=None):
    """(u, i, j) rows: pair p repeated neg_ratio times (sampler.py:46-74)."""
    n = pos_u.shape[0]
    p = (rows % (n * neg_ratio)) // neg_ratio
    u = pos_u[p]
    i = pos_i[p]
    j = _draw_negatives(key, seen, u, item_nums, u.shape, pop_cdf)
    return {"u": u, "i": i, "j": j, "w": valid}


def pointwise_batch(key, rows, valid, pos_u, pos_i, seen: MemberTable,
                    item_nums, neg_ratio, pop_cdf=None):
    """(u, i, y) rows: 1 positive + neg_ratio negatives per pair
    (sampler.py:10-43)."""
    n = pos_u.shape[0]
    grp = 1 + neg_ratio
    r = rows % (n * grp)
    p = r // grp
    is_pos = (r % grp) == 0
    u = pos_u[p]
    i_pos = pos_i[p]
    j = _draw_negatives(key, seen, u, item_nums, u.shape, pop_cdf)
    i = jnp.where(is_pos, i_pos, j)
    y = is_pos.astype(jnp.float32)
    return {"u": u, "i": i, "y": y, "w": valid}


def cml_batch(key, rows, valid, pos_u, pos_i, seen: MemberTable, item_nums,
              neg_ratio, pop_cdf=None):
    """(u, i, [K negatives]) rows — one row per pair (sampler.py:77-99)."""
    n = pos_u.shape[0]
    p = rows % n
    u = pos_u[p]
    i = pos_i[p]
    negs = _draw_negatives(key, seen, u, item_nums, (u.shape[0], neg_ratio),
                           pop_cdf)
    return {"u": u, "i": i, "negs": negs, "w": valid}


def build_csr_lists(sets: dict[int, list[int]], n_entities: int,
                    aux: dict[int, list[float]] | None = None):
    """CSR-flat per-entity lists for device-side uniform draws: returns
    {"flat": [nnz+1] int32 (one sentinel pad at the end), "off": [N]
    int32 start offsets, "suk": [nnz+1] float32 aligned aux values
    (zeros when ``aux`` is None)}.  Callers supply each entity's ids as
    a SORTED-UNIQUE list with aux aligned (build_spu's contract — the
    same ordering the old padded [N, max_len] tables carried), so a
    draw sees the same id at the same slot either way.  Replaces those
    padded planes: at Epinions scale max |SPu| is ~20x the mean, making
    the padded tables ~1GB of mostly-sentinel host->device transfer."""
    off = np.zeros(n_entities, dtype=np.int32)
    flat, aux_flat = [], []
    pos = 0
    for e in range(n_entities):
        ids = sets.get(e)
        off[e] = pos
        if not ids:
            continue
        flat.append(np.asarray(ids, dtype=np.int32))
        if aux is not None:
            aux_flat.append(np.asarray(aux[e], dtype=np.float32))
        pos += len(ids)
    flat = (np.concatenate(flat + [np.zeros(1, np.int32)])
            if flat else np.zeros(1, np.int32))
    if aux is not None:
        suk = (np.concatenate(aux_flat + [np.zeros(1, np.float32)])
               if aux_flat else np.zeros(1, np.float32))
    else:
        suk = np.zeros_like(flat, dtype=np.float32)
    return {"flat": flat, "off": off, "suk": suk}


def sbpr_batch(key, rows, valid, pos_u, pos_i, seen: MemberTable, item_nums,
               neg_ratio, spu: MemberTable, spu_csr,
               social_neg: MemberTable | None = None):
    """(u, i, social item k, negative j, suk) rows (sampler.py:102-141).

    The caller must restrict (pos_u, pos_i) to users with non-empty SPu
    (the reference skips users without social positives, sampler.py:105-106).
    ``spu_csr`` is a build_csr_lists dict: ``flat``/``off`` hold each
    user's sorted-unique SPu items CSR-flat and ``suk`` the aligned
    friend-consumption counts (the reference recomputes suk per sample,
    sampler.py:124-130 — it is sample-independent, so we precompute).
    The negative avoids
    seen(u) UNION SPu(u) (sampler.py:117-119): when the caller provides
    ``social_neg`` (a MemberTable OF THE UNION, models/social.py), the
    draw is exact via its complement table (zero rejection, one gather)
    or a single-set rejection via its bitmap; otherwise it rejects
    against both sets.
    """
    n = pos_u.shape[0]
    p = (rows % (n * neg_ratio)) // neg_ratio
    u = pos_u[p]
    i = pos_i[p]
    k_key, j_key = jax.random.split(key)
    # Social item: uniform index into SPu[u] (per-row modulo by the ragged
    # list length; modulo bias is negligible at int32 range).  The lists
    # live CSR-flat (spu_csr/spu_off) — a max-width padded [U, L] plane
    # was ~20x waste at Epinions scale (max |SPu| 7382 vs mean 327).
    s_raw = jax.random.randint(k_key, u.shape, 0, jnp.iinfo(jnp.int32).max,
                               dtype=jnp.int32)
    s = s_raw % jnp.maximum(spu.lens[u], 1)
    idx = spu_csr["off"][u] + s
    k = spu_csr["flat"][idx]
    suk = spu_csr["suk"][idx]
    if social_neg is not None:
        j = sample_not_in(j_key, social_neg, u, item_nums, u.shape)
    else:
        j = _reject(j_key, u, item_nums, u.shape,
                    lambda q: member(seen, u, q) | member(spu, u, q))
    return {"u": u, "i": i, "k": k, "j": j,
            "suk": suk.astype(jnp.float32), "w": valid}


def tbpr_batch(key, rows, valid, pos_u, pos_i, seen: MemberTable, item_nums,
               neg_ratio, strong: MemberTable, weak: MemberTable,
               ts_csr, tw_csr, social_neg: MemberTable | None = None):
    """(u, i, strong-tie item s, weak-tie item t, negative j) rows for
    TBPR's 4-level chain i > s > t > j (CIKM'16; see
    models/social.py TBPR).  The caller restricts (pos_u, pos_i) to users
    with BOTH tie classes non-empty; tie items draw from CSR-flat lists
    (see build_csr_lists); the negative avoids seen(u) UNION strong(u)
    UNION weak(u) — exactly via ``social_neg`` (the union MemberTable)
    when provided, else by triple-set rejection."""
    n = pos_u.shape[0]
    p = (rows % (n * neg_ratio)) // neg_ratio
    u = pos_u[p]
    i = pos_i[p]
    s_key, t_key, j_key = jax.random.split(key, 3)

    def draw_from(table, csr, k):
        raw = jax.random.randint(k, u.shape, 0, jnp.iinfo(jnp.int32).max,
                                 dtype=jnp.int32)
        sel = raw % jnp.maximum(table.lens[u], 1)
        return csr["flat"][csr["off"][u] + sel]

    s = draw_from(strong, ts_csr, s_key)
    t = draw_from(weak, tw_csr, t_key)
    if social_neg is not None:
        j = sample_not_in(j_key, social_neg, u, item_nums, u.shape)
    else:
        j = _reject(j_key, u, item_nums, u.shape,
                    lambda q: (member(seen, u, q) | member(strong, u, q)
                               | member(weak, u, q)))
    return {"u": u, "i": i, "s": s, "t": t, "j": j, "w": valid}


def samn_batch(key, rows, valid, pos_u, pos_i, seen: MemberTable, item_nums,
               neg_ratio, friends_padded):
    """Pairwise rows + each user's padded friend list (sampler.py:144-166)."""
    b = pairwise_batch(key, rows, valid, pos_u, pos_i, seen, item_nums,
                       neg_ratio)
    b["friends"] = friends_padded[b["u"]]
    return b


def social_pairwise_batch(key, rows, valid, sf_u, sf_v,
                          friends: MemberTable, user_nums, neg_ratio):
    """Social-domain (u, v, w) triples for the dual-domain models:
    positive friend pairs with negatives rejected against the friend list
    (sampler.py:184-197)."""
    n = sf_u.shape[0]
    p = (rows % (n * neg_ratio)) // neg_ratio
    u = sf_u[p]
    v = sf_v[p]
    w = sample_not_in(key, friends, u, user_nums, u.shape)
    return {"u_s": u, "v": v, "w_neg": w, "w_s": valid}
