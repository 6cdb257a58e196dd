"""Pallas TPU kernel: fused full-catalog dot scoring with seen masking.

The hot eval op for the dot-product family (BPR/GMF/SBPR/SAMN user
vectors): scores = U @ Q^T with the user's seen train items forced to a
-3e38 sentinel before ranking (RankingRecommender.py:231-240 semantics).
XLA runs this as matmul -> scatter-mask -> where with the [B, I] boolean
mask materialized in HBM; the kernel fuses score + mask in one VMEM pass
per (user-block x item-block) tile, consuming the packed per-user seen
bitmaps (the sampler's MemberTable.bits layout) directly.

Mosaic has no lane-gather and no cross-lane reshape, so the bit test is
built from the two primitives it DOES have: ``pltpu.repeat`` (tile) and
lane-constant shifts.  Within a 4096-item block, column c holds word
(c % 128) and tests bit (c // 128), i.e. ITEM 32*(c % 128) + c // 128 —
a fixed permutation.  The item table is pre-permuted to match, and the
kernel's outputs are in permuted column order: callers rank the returned
scores directly and translate top-k indices through the returned
``item_map`` (cheap [B, K] lookup) — top-k is order-agnostic, so the
permutation costs one tiny gather instead of a [B, I] reorder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cleverrec_tpu.common import cdiv

NEG = -3.0e38   # mask value (finite: top_k handles it like -inf)
BLOCK_I = 4096  # 128 bitmap words per tile (Mosaic lane-tiling constraint)
_WORDS = BLOCK_I // 32  # 128


GROUP_I = 128   # full-kernel group-max granularity (lane-window reduces)
_GROUPS = BLOCK_I // GROUP_I  # 32 real group maxes per tile
COMB_I = 32     # comb-group size: gmax-only kernel lane gid covers
                # ORIGINAL item ids [32*gid, 32*gid + 32)


def _masked_scores(u_ref, q_ref, bits_ref, bias_ref, *, interpret: bool):
    """Masked score tile: scores[:, c] = u . q_perm[c] + bias_perm[c],
    masked to NEG by bit test word = c % 128, bit = c // 128 of the
    user's seen bitmap."""
    from jax.experimental.pallas import tpu as pltpu

    scores = jnp.dot(u_ref[...], q_ref[...].T,
                     preferred_element_type=jnp.float32)   # [bm, 4096]
    scores = scores + bias_ref[...]                        # [1, 4096]
    words = bits_ref[...]                                  # [bm, 128]
    if interpret:
        rep = jnp.concatenate([words] * 32, axis=1)        # tile semantics
    else:
        rep = pltpu.repeat(words, 32, axis=1)              # [bm, 4096]
    col = jax.lax.broadcasted_iota(jnp.uint32, scores.shape, 1)
    seen = ((rep >> (col >> 7)) & 1) == 1
    return jnp.where(seen, NEG, scores)


def _masked_tile(u_ref, q_ref, bits_ref, bias_ref, *, interpret: bool):
    """Masked scores plus the per-128-column GROUP maxes (free here in
    VMEM — they feed the exact group-pruned top-k; round-3 verdict item
    2).  The tile's 32 group maxes fill the first 32 lanes of a
    128-lane output block (Mosaic's minimum lane tile); lanes 32..
    carry the NEG sentinel and can never win a top-k."""
    masked = _masked_scores(u_ref, q_ref, bits_ref, bias_ref,
                            interpret=interpret)
    # Static lane-window reduces: the one group-max form Mosaic accepts
    # (a [bm, 32, 128] reshape-max fails to compile; measured probe).
    parts = [jnp.max(masked[:, g * GROUP_I:(g + 1) * GROUP_I], axis=1,
                     keepdims=True) for g in range(_GROUPS)]
    pad = jnp.full((masked.shape[0], GROUP_I - _GROUPS), NEG, jnp.float32)
    return masked, jnp.concatenate(parts + [pad], axis=1)


def _kernel(u_ref, q_ref, bits_ref, bias_ref, out_ref, gmax_ref, *,
            interpret: bool):
    masked, gmax = _masked_tile(u_ref, q_ref, bits_ref, bias_ref,
                                interpret=interpret)
    out_ref[...] = masked
    gmax_ref[...] = gmax


def _kernel_scores_only(u_ref, q_ref, bits_ref, bias_ref, out_ref, *,
                        interpret: bool):
    """Masked scores WITHOUT the group-max epilogue: the narrow-catalog
    eval path ranks the [B, I] row directly and never consumes gmax, so
    computing it there only shrank the tile budget (the gmax temps push
    block_b=256's working set past the 16MB scoped-VMEM limit —
    round-4 verdict item 2: eval 1.631M -> 1.399M users/s)."""
    out_ref[...] = _masked_scores(u_ref, q_ref, bits_ref, bias_ref,
                                  interpret=interpret)


def _kernel_gmax_only(u_ref, q_ref, bits_ref, bias_ref, gmax_ref, *,
                      interpret: bool):
    """COMB-group maxes WITHOUT the [B, I] score write: the masked score
    tile lives and dies in VMEM.  Output lane g of tile t is
    max_j masked[:, 128j + g] (j < 32) — under the column permutation
    (item at local c = base + 32*(c % 128) + c // 128) that comb is
    exactly ORIGINAL item ids [32*gid, 32*gid + 32) for
    gid = 128t + g, i.e. group gid == bitmap word gid.  Round 5 moved
    the pruning groups from 128 permuted columns to these 32-item combs:
    the rescue gather shrinks 4x ([B, k, 32, d] contiguous slabs of the
    ORIGINAL-order table), candidate ids become pure iota, and the seen
    re-mask collapses to ONE u32 word per group (319k-item eval 4.89 ->
    3.57 ms/batch; benchmarks/rescue_probe.py).  Computed as 32 ALIGNED
    [bb, 128] elementwise maxes into one accumulator — the naive
    per-32-lane-window reduce allocated 128 keepdims temps each padded
    to a 128-lane tile (35.75MB > the 16MB scoped-VMEM limit)."""
    masked = _masked_scores(u_ref, q_ref, bits_ref, bias_ref,
                            interpret=interpret)
    acc = masked[:, 0:GROUP_I]
    for j in range(1, _GROUPS):
        acc = jnp.maximum(acc, masked[:, GROUP_I * j:GROUP_I * (j + 1)])
    gmax_ref[...] = acc


def _column_permutation(i_padded: int) -> np.ndarray:
    """item_map[c] = item id scored at column c (per 4096 block)."""
    c = np.arange(i_padded, dtype=np.int64)
    base = (c // BLOCK_I) * BLOCK_I
    local = c % BLOCK_I
    return (base + 32 * (local % _WORDS) + local // _WORDS).astype(np.int32)


def permute_item_table(q_table: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Pre-permute the item table into the kernel's column order.

    Returns (q_perm [I_padded, d], item_map [I_padded]).  The gather is
    a full-catalog row permutation (~2.7ms at 320k rows on v5e) —
    batch-INDEPENDENT, so callers evaluating many batches against one
    params snapshot must do it once and pass ``q_perm``/``item_map`` to
    ``fused_dot_topk_scores`` (XLA does not reliably hoist the gather
    out of a scanned eval body on its own)."""
    i, _ = q_table.shape
    i_pad = (-i) % BLOCK_I
    if i_pad:
        q_table = jnp.pad(q_table, ((0, i_pad), (0, 0)))
    item_map = jnp.asarray(_column_permutation(i + i_pad))
    return q_table[item_map], item_map


@functools.partial(jax.jit, static_argnames=("block_b", "interpret",
                                             "pre_permuted", "item_nums"))
def fused_dot_topk_scores(u_vecs: jax.Array, q_table: jax.Array,
                          seen_bits: jax.Array, block_b: int = 256,
                          interpret: bool = False,
                          pre_permuted: bool = False,
                          item_nums: int | None = None,
                          bias: jax.Array | None = None
                          ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Masked full-catalog scores for ranking.

    u_vecs: [B, d]; q_table: [I, d] (or the [I_padded, d] output of
    ``permute_item_table`` with ``pre_permuted=True`` and the REAL
    catalog size in ``item_nums`` — the once-per-params path);
    seen_bits: [B, ceil(I/32)] uint32 (per-user packed seen bitmaps,
    rows already gathered for the batch); bias: optional per-item score
    offset in the SAME order as q_table (i.e. already permuted when
    ``pre_permuted``) — added in-kernel before masking.

    Returns (scores [B, I_padded], gmax [B, I_padded/32], item_map
    [I_padded]): scores are in permuted column order; ``item_map[col]``
    is the item id scored there (padded columns map to ids >= I and
    carry the NEG sentinel).  ``gmax`` holds per-128-column group maxes
    in PADDED lane layout: lane t*128 + j (j < 32) is the max of
    scores[b, 4096t + 128j : 4096t + 128(j+1)]; lanes with j >= 32 are
    the NEG sentinel.  (The production group-pruned top-k uses the
    gmax-only kernel's COMB layout instead — ``fused_dot_gmax``.)
    Rank the scores as-is and translate the top-k indices:
        v, idx = lax.top_k(scores, k); items = item_map[idx]
    """
    args, meta = _prepare(u_vecs, q_table, seen_bits, block_b,
                          pre_permuted, item_nums, bias)
    b, b_pad, i_padded, block_b, grid, d, item_map = meta
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    out, gmax = pl.pallas_call(
        functools.partial(_kernel, interpret=interpret),
        out_shape=(
            jax.ShapeDtypeStruct((b + b_pad, i_padded), jnp.float32),
            jax.ShapeDtypeStruct((b + b_pad, i_padded // 32),
                                 jnp.float32),
        ),
        grid=grid,
        in_specs=_in_specs(pl, pltpu, block_b, d),
        out_specs=(
            pl.BlockSpec((block_b, BLOCK_I), lambda bi, ii: (bi, ii),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, GROUP_I), lambda bi, ii: (bi, ii),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(*args)
    return out[:b], gmax[:b], jnp.asarray(item_map)


def _gmax_block_cap(d: int) -> int:
    """Largest user block the gmax-only kernel fits in scoped VMEM: the
    masked [bb, 4096] f32 score tile lives as a VMEM temp (never an
    output buffer) next to the double-buffered [4096, d] q slab.
    Bigger blocks cut the kernel's dominant HBM cost — the per-block
    q-table re-read (319k items d=64: full rank_fused 6.66 ms/batch at
    bb=128 -> 5.41 ms at bb=512, outputs bit-identical; round-5
    chained-stage profile)."""
    budget = 13_500_000 - 8 * 4096 * d          # minus 2x q slab
    bb = 128
    while bb < 512 and (2 * bb) * 4096 * 4 <= budget:
        bb *= 2
    return bb


@functools.partial(jax.jit, static_argnames=("block_b", "interpret",
                                             "item_nums"))
def fused_dot_gmax(u_vecs: jax.Array, q_perm: jax.Array,
                   seen_bits: jax.Array, block_b: int = 512,
                   interpret: bool = False,
                   item_nums: int | None = None,
                   bias_perm: jax.Array | None = None) -> jax.Array:
    """Masked per-COMB-group maxes only — the [B, I_padded] score
    matrix never leaves VMEM (the write is ~1.3GB/batch at 320k items,
    and the group-pruned rescue re-read doubled it; round-4 eval tail).
    Inputs must be PRE-permuted (``permute_item_table``); returns gmax
    [B, I_padded/32] where lane ``gid`` is the max masked score over
    ORIGINAL item ids [32*gid, 32*gid + 32) — i.e. group gid == packed
    seen-bitmap word gid (see ``_kernel_gmax_only``).  Callers recover
    the winning groups' scores by recomputing u . q[item] for the k*32
    candidate rows gathered as contiguous slabs of the ORIGINAL-order
    table (ranking.rank_fused) — within f32-MXU rounding of the
    kernel's dot (same contraction, different tiling)."""
    assert item_nums is not None, "fused_dot_gmax needs item_nums"
    args, meta = _prepare(u_vecs, q_perm, seen_bits, block_b,
                          True, item_nums, bias_perm,
                          cap=_gmax_block_cap(u_vecs.shape[1]))
    b, b_pad, i_padded, block_b, grid, d, _ = meta
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    gmax = pl.pallas_call(
        functools.partial(_kernel_gmax_only, interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((b + b_pad, i_padded // 32),
                                       jnp.float32),
        grid=grid,
        in_specs=_in_specs(pl, pltpu, block_b, d),
        out_specs=pl.BlockSpec((block_b, GROUP_I), lambda bi, ii: (bi, ii),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return gmax[:b]


@functools.partial(jax.jit, static_argnames=("block_b", "interpret",
                                             "pre_permuted", "item_nums"))
def fused_dot_scores(u_vecs: jax.Array, q_table: jax.Array,
                     seen_bits: jax.Array, block_b: int = 256,
                     interpret: bool = False,
                     pre_permuted: bool = False,
                     item_nums: int | None = None,
                     bias: jax.Array | None = None
                     ) -> tuple[jax.Array, jax.Array]:
    """Masked full-catalog scores WITHOUT group maxes — the
    narrow-catalog eval variant.  Skipping the gmax epilogue keeps the
    block_b=256 tile under the 16MB scoped-VMEM limit (the gmax temps
    measured 16.13MB there), restoring the round-3 eval throughput for
    catalogs whose rank path never consumes gmax (ranking.rank_fused's
    plain-top_k branch).  Same argument contract as
    ``fused_dot_topk_scores``; returns (scores [B, I_padded], item_map
    [I_padded])."""
    args, meta = _prepare(u_vecs, q_table, seen_bits, block_b,
                          pre_permuted, item_nums, bias, cap=256)
    b, b_pad, i_padded, block_b, grid, d, item_map = meta
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    out = pl.pallas_call(
        functools.partial(_kernel_scores_only, interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((b + b_pad, i_padded), jnp.float32),
        grid=grid,
        in_specs=_in_specs(pl, pltpu, block_b, d),
        out_specs=pl.BlockSpec((block_b, BLOCK_I), lambda bi, ii: (bi, ii),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return out[:b], jnp.asarray(item_map)


def _in_specs(pl, pltpu, block_b: int, d: int):
    return [
        pl.BlockSpec((block_b, d), lambda bi, ii: (bi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BLOCK_I, d), lambda bi, ii: (ii, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, _WORDS), lambda bi, ii: (bi, ii),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK_I), lambda bi, ii: (0, ii),
                     memory_space=pltpu.VMEM),
    ]


def _prepare(u_vecs, q_table, seen_bits, block_b, pre_permuted,
             item_nums, bias, cap: int = 128):
    """Shared padding/permutation setup for all kernel variants."""
    b, d = u_vecs.shape
    if pre_permuted:
        assert item_nums is not None, "pre_permuted needs item_nums"
        i_padded = q_table.shape[0]
        i = item_nums
    else:
        i = q_table.shape[0]
        i_padded = i + ((-i) % BLOCK_I)
    # The per-tile working set (double-buffered [block_b, 4096] score
    # block + q slab + bitmap words + the group-max temps) measures
    # 16.13MB > the 16MB scoped-VMEM limit at block_b=256 — the gmax
    # additions pushed the round-3 layout just over, at ANY tile count
    # (OOMs measured at both 319k and 103k items).  block_b=128 keeps
    # the gmax-emitting pipeline ~8MB; the scores-only kernel (no gmax
    # temps) fits block_b=256 and passes cap=256 to get it back.
    block_b = min(block_b, cap)
    grid = (cdiv(b, block_b), i_padded // BLOCK_I)
    b_pad = grid[0] * block_b - b
    i_pad = i_padded - i
    if b_pad:
        u_vecs = jnp.pad(u_vecs, ((0, b_pad), (0, 0)))
        seen_bits = jnp.pad(seen_bits, ((0, b_pad), (0, 0)))
    words_total = i_padded // 32
    if seen_bits.shape[1] < words_total:
        seen_bits = jnp.pad(seen_bits,
                            ((0, 0), (0, words_total - seen_bits.shape[1])))
    if i_pad:
        # Mark padded items seen so they rank last.
        pad_ids = np.arange(i, i + i_pad)
        pad_mask = np.zeros(words_total, np.uint32)
        np.bitwise_or.at(pad_mask, pad_ids >> 5,
                         np.uint32(1) << (pad_ids & 31).astype(np.uint32))
        seen_bits = seen_bits | jnp.asarray(pad_mask)[None, :]

    item_map = _column_permutation(i_padded)
    if pre_permuted:
        q_perm = q_table
        bias_perm = bias                      # caller permuted it already
    else:
        q_perm = jnp.pad(q_table, ((0, i_pad), (0, 0)))[
            jnp.asarray(item_map)]
        bias_perm = (None if bias is None else
                     jnp.pad(bias, (0, i_padded
                                    - bias.shape[0]))[jnp.asarray(item_map)])
    if bias_perm is None:
        bias_perm = jnp.zeros((i_padded,), jnp.float32)
    args = (u_vecs, q_perm, seen_bits, bias_perm[None, :])
    return args, (b, b_pad, i_padded, block_b, grid, d,
                  jnp.asarray(item_map))
