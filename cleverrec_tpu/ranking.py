"""Shared full-catalog ranking backends.

One implementation of each ranker, consumed by BOTH the Evaluator
(evalx.py — converts to PAD_ITEM id lists for the metric formulas) and
the serving module (serving.py — returns (items, scores) with -1/-inf
padding).  They previously carried near-duplicate copies that had
already drifted (PAD sentinels, stream thresholds, backend precedence).

Every ranker returns ``(values [B, k], items [B, k])`` with masked /
past-catalog slots at exactly ``-inf`` (the fused kernel's finite
-3e38 sentinel is normalized here so consumers can test isfinite
uniformly).  Scores are "higher is better": cml_like distance models
are negated INSIDE each ranker.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_full_scores(model, params, aux, u, rows,
                       filter_seen: bool = True):
    """[B, I] scores with seen train items masked to -inf.

    ``rows``: the batch users' PRE-GATHERED sorted seen rows [B, L]
    (callers gather seen.rows[u] themselves — the Evaluator pre-stacks
    them per batch).  Seen ids scatter into a [B, I+1] mask; the
    sentinel id ``I`` lands in the spill column and is sliced off
    (matches the reference's rank-time skip,
    RankingRecommender.py:214-230)."""
    scores = model.score_all(params, u, aux)
    if model.cml_like:
        scores = -scores
    if not filter_seen:
        return scores
    b, item_nums = scores.shape
    seen = jnp.zeros((b, item_nums + 1), dtype=bool)
    seen = seen.at[jnp.arange(b)[:, None], rows].set(True)[:, :item_nums]
    return jnp.where(seen, -jnp.inf, scores)


def rank_dense(model, params, aux, u, rows, k: int,
               filter_seen: bool = True):
    """Dense [B, I] scoring + top-k (group-max pruned past 16k items —
    exact values, ops/topk.grouped_topk)."""
    from cleverrec_tpu.ops.topk import grouped_topk
    scores = masked_full_scores(model, params, aux, u, rows, filter_seen)
    return grouped_topk(scores, k)


def rank_sharded(model, params, aux, u, rows, k: int, mesh,
                 filter_seen: bool = True):
    """Item-axis-sharded ranking: scores constrained to
    P(None, 'model'), per-shard top-K + all_gather merge."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cleverrec_tpu.ops.topk import sharded_topk_scores
    scores = masked_full_scores(model, params, aux, u, rows, filter_seen)
    n_shards = mesh.shape["model"]
    pad = (-scores.shape[1]) % n_shards
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)),
                         constant_values=-jnp.inf)
    scores = jax.lax.with_sharding_constraint(
        scores, NamedSharding(mesh, P(None, "model")))
    return sharded_topk_scores(scores, k, mesh)


def rank_stream(model, params, aux, u, rows, item_nums: int, k: int,
                chunk: int = 4096, filter_seen: bool = True,
                seen_bits=None, approx: bool = False):
    """Streaming ranking: lax.scan over item chunks with a carried
    running top-K — memory O(B * chunk) instead of the dense [B, I]
    score matrix (the catalog-axis scaling path, SURVEY.md section
    5.7).

    Dot-decomposable models score each chunk as ONE [B, d] x [d, chunk]
    matmul against the shared chunk columns (monotone-equivalent
    ranking, same contract as the fused backend); the generic fallback
    via score_candidates materializes a [B, chunk, d] gather — 4.3GB at
    B = chunk = 4096, which both crawled and OOM'd.

    Seen masking: when ``seen_bits`` ([B, ceil(I/32)] packed uint32
    rows) is given, a chunk's mask is a dynamic SLICE of the bitmap
    unpacked with broadcast shifts (chunk columns are contiguous ids) —
    zero per-query gathers.  Without bitmaps (catalog past the bitmap
    budget), the stream runs UNFILTERED to a top-(k + max_seen) carry
    and post-filters that short list against the sorted rows — exact
    (a user's seen items can displace at most max_seen top slots), and
    O(B * (k + W) * log W) gathers total instead of per-chunk
    binary searches over every item (which cost log2(L) gathers per
    query — ~100ms/call at [256, 4096] on this chip)."""
    from cleverrec_tpu.ops.topk import streaming_topk
    cml = model.cml_like
    decomp = getattr(model, "dot_decomposition", None)
    if decomp is not None:
        uv, table, bias = decomp(params, u, aux)
        if cml:
            uv = -uv
            bias = None if bias is None else -bias
    if seen_bits is not None:
        assert chunk % 32 == 0, "bitmap-sliced masking needs 32 | chunk"
        shifts = (jnp.arange(chunk, dtype=jnp.uint32) & 31)
        word_of = jnp.arange(chunk, dtype=jnp.int32) >> 5
        # Pad to whole chunks of words so the tail chunk's dynamic_slice
        # never clamps (a clamped start misaligns every column).
        need_w = (-(-item_nums // chunk)) * (chunk // 32)
        if seen_bits.shape[1] < need_w:
            seen_bits = jnp.pad(
                seen_bits, ((0, 0), (0, need_w - seen_bits.shape[1])))

    def mask_seen_bits(s, chunk_ids):
        w0 = chunk_ids[0] >> 5
        words = jax.lax.dynamic_slice(
            seen_bits, (0, w0), (s.shape[0], chunk // 32))
        hit = (words[:, word_of] >> shifts[None, :]) & 1
        return jnp.where(hit.astype(bool), -jnp.inf, s)

    # The post-filter trick widens the carry by the GLOBAL max seen
    # count; one power user with a huge history would inflate every
    # merge, so past this width fall back to exact per-chunk
    # binary-search masking (slower, skew-immune).
    post_filter = (filter_seen and seen_bits is None
                   and rows.shape[1] <= 4096)
    chunk_mask_rows = filter_seen and seen_bits is None and not post_filter

    def score_chunk(chunk_ids):
        cand = jnp.broadcast_to(chunk_ids[None, :],
                                (u.shape[0], chunk_ids.shape[0]))
        if decomp is not None:
            s = jnp.dot(uv, table[chunk_ids].T,
                        preferred_element_type=jnp.float32)
            if bias is not None:
                s = s + bias[chunk_ids][None, :]
        else:
            s = model.score_candidates(params, u, cand, aux)
            if cml:
                s = -s
        if filter_seen and seen_bits is not None:
            s = mask_seen_bits(s, chunk_ids)
        elif chunk_mask_rows:
            idx = jax.vmap(jnp.searchsorted)(rows, cand)
            idx_c = jnp.minimum(idx, rows.shape[1] - 1)
            hit = jnp.take_along_axis(rows, idx_c, axis=1) == cand
            s = jnp.where(hit, -jnp.inf, s)
        return s

    if post_filter:
        # streaming_topk always yields k columns (-inf padded), so the
        # widened carry stays >= k even on tiny catalogs.
        kk = max(k, min(k + rows.shape[1], item_nums))
        v, ids = streaming_topk(score_chunk, item_nums, kk, chunk=chunk,
                                approx=approx)
        idx = jax.vmap(jnp.searchsorted)(rows, ids)
        idx_c = jnp.minimum(idx, rows.shape[1] - 1)
        hit = jnp.take_along_axis(rows, idx_c, axis=1) == ids
        v = jnp.where(hit, -jnp.inf, v)
        v, sel = jax.lax.top_k(v, k)
        return v, jnp.take_along_axis(ids, sel, axis=1)

    return streaming_topk(score_chunk, item_nums, k, chunk=chunk,
                          approx=approx)


def fused_precompute(model, params, aux, rescue_bf16: bool = False):
    """Batch-INDEPENDENT half of the fused ranking path: the item table
    permuted into the kernel's column order (+ permuted bias), plus the
    ORIGINAL-order table/bias padded to kernel width for the comb-group
    rescue gather.  The permutation is a full-catalog row gather
    (~2.7ms at 320k rows) that XLA does not hoist out of a scanned eval
    body — callers evaluating many batches against one params snapshot
    compute this ONCE and pass it to ``rank_fused`` as ``pre``.

    ``rescue_bf16=True`` stores the rescue copy in bfloat16: the slab
    gather halves, at the cost of bf16-rounded candidate scores — an
    APPROXIMATE mode for serving retrieval (~90% top-20 id agreement on
    random tables), never used by evaluation.  Measured through the
    production path the gain is small (319k items: 3.58 -> 3.43
    ms/batch; a standalone pre-integration variant once measured 1.75 —
    lowering-context dependent), so prefer exact unless profiling shows
    the slab gather dominating."""
    from cleverrec_tpu.ops.pallas_scores import permute_item_table
    _, table, bias = model.dot_decomposition(
        params, jnp.zeros((1,), jnp.int32), aux)
    if model.cml_like:
        bias = None if bias is None else -bias
    q_perm, item_map = permute_item_table(table)
    n = item_map.shape[0]
    bias_perm = (None if bias is None else
                 jnp.pad(bias, (0, n - bias.shape[0]))[item_map])
    q_pad = jnp.pad(table, ((0, n - table.shape[0]), (0, 0)))
    if rescue_bf16:
        q_pad = q_pad.astype(jnp.bfloat16)
    bias_pad = (None if bias is None else
                jnp.pad(bias, (0, n - bias.shape[0])))
    # Arrays only (no int leaf): pre may cross a jit boundary as an
    # argument; the static catalog size comes from model.meta instead.
    return q_perm, bias_perm, item_map, q_pad, bias_pad


def rank_fused(model, params, aux, u, seen_bits, k: int,
               interpret: bool = False, pre=None):
    """Pallas path for dot-decomposable models: one fused
    score+bias+bitmap-mask kernel (which emits per-COMB-group maxes
    from VMEM), then group-pruned top-k.  ``seen_bits``: [B, W] packed
    uint32 seen bitmaps (pass zeros for unfiltered retrieval).  ``pre``:
    output of ``fused_precompute`` — skips the per-call table
    permutation (hot for multi-batch eval / serving).

    Group-pruned selection (the ops/topk.grouped_topk argument, at
    comb groups of 32 items): any group holding a top-k item has
    group-max >= the k-th score, and at most k groups can, so top-k
    over the in-kernel group maxes, then a RESCUE of those k groups'
    scores.  Round 4 deleted the [B, I_pad] score matrix from the
    pruned path entirely (fused_dot_gmax); round 5 moved the groups
    from 128 permuted columns to 32-item COMBS (group gid = items
    [32*gid, 32*gid+32) = bitmap word gid): the rescue gathers
    [B, k, 32, d] CONTIGUOUS slabs of the ORIGINAL-order table (4x
    less traffic than the 128-wide slabs), candidate ids are pure
    iota, and the seen re-mask reads ONE u32 word per group —
    [1024 x 319k] d=64 k=20: 4.89 -> 3.57 ms/batch (rescue_probe.py).
    Rescue scores are within f32-MXU rounding of the kernel's (same
    contraction, different tiling; bit-exact under interpret).  Narrow
    catalogs keep the full-scores kernel and rank the row directly."""
    from cleverrec_tpu.ops.pallas_scores import (
        BLOCK_I, COMB_I, NEG, fused_dot_gmax, fused_dot_scores,
        permute_item_table)
    u_vecs, table, bias = model.dot_decomposition(params, u, aux)
    if model.cml_like:
        # Negate INSIDE the dot (-u).q so the kernel's -3e38 seen mask
        # stays the worst score; never negate after masking.
        u_vecs = -u_vecs
        bias = None if bias is None else -bias
    i_real = model.meta.item_nums if pre is not None else table.shape[0]
    n = i_real + ((-i_real) % BLOCK_I)                     # padded width
    n_groups = n // COMB_I
    b = u_vecs.shape[0]
    if not (n >= 8192 and n_groups >= 2 * k):
        # Narrow catalog: full masked scores + a plain row top_k.  The
        # scores-only kernel (no gmax epilogue) keeps block_b=256 —
        # this branch never consumes gmax, and computing it here cost
        # 14% of round-4 eval throughput (verdict item 2).
        if pre is not None:
            q_perm, bias_perm, item_map = pre[:3]
            scores, _ = fused_dot_scores(
                u_vecs, q_perm, seen_bits, interpret=interpret,
                pre_permuted=True, item_nums=i_real, bias=bias_perm)
        else:
            scores, item_map = fused_dot_scores(
                u_vecs, table, seen_bits, interpret=interpret, bias=bias)
        v, idx = jax.lax.top_k(scores, k)
        return jnp.where(v > -1e37, v, -jnp.inf), item_map[idx]

    if pre is not None:
        q_perm, bias_perm, _, q_pad, bias_pad = pre
    else:
        q_perm, item_map = permute_item_table(table)
        bias_perm = (None if bias is None else
                     jnp.pad(bias, (0, item_map.shape[0]
                                    - bias.shape[0]))[item_map])
        q_pad = jnp.pad(table, ((0, n - i_real), (0, 0)))
        bias_pad = (None if bias is None else
                    jnp.pad(bias, (0, n - i_real)))
    gmax = fused_dot_gmax(u_vecs, q_perm, seen_bits, interpret=interpret,
                          item_nums=i_real, bias_perm=bias_perm)
    # gmax lane gid is the max over ORIGINAL items [32*gid, 32*gid+32)
    # (the comb layout — see _kernel_gmax_only); every lane is real.
    # Hierarchical group selection: grouped_topk over the gmax row
    # beats a plain [B, n/32] sort ~2.6x on chip.
    from cleverrec_tpu.ops.topk import grouped_topk
    _, gi = grouped_topk(gmax, k, min_cols=4096)           # [B, k]
    # Rescue the winning groups' masked scores: comb group gid is a
    # CONTIGUOUS 32-row slab [32*gid, 32*gid+32) of the ORIGINAL-order
    # table, so gather [B, k] slabs from a [G, 32, d] view (slice sizes
    # (1, 32, d) — DMA-friendly; element-indexed gathers lowered to
    # scalar gathers measured 31.5 ms/batch at [1024 x 319k]).  The
    # dot recomputes the kernel's contraction (within f32-MXU rounding;
    # bit-exact under interpret).  bf16 rescue copies (serving approx
    # mode) halve the slab traffic again (small measured gain through
    # this full path: 3.58 -> 3.43 ms/batch at 319k).
    qc = q_pad.reshape(n // COMB_I, COMB_I, -1)[gi]        # [B, k, 32, d]
    cand = jax.lax.dot_general(
        qc, u_vecs.astype(qc.dtype), (((3,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # [B, k, 32]
    if bias_pad is not None:
        cand = cand + bias_pad.reshape(n // COMB_I, COMB_I)[gi]
    ids = gi[:, :, None] * COMB_I + jnp.arange(COMB_I, dtype=gi.dtype)
    # Seen-bit re-masking: comb group gid IS packed bitmap word gid —
    # ONE u32 word per winning group, member r at bit r.
    sb = seen_bits
    w_total = n // 32
    if sb.shape[1] < w_total:
        sb = jnp.pad(sb, ((0, 0), (0, w_total - sb.shape[1])))
    words = jnp.take_along_axis(sb, gi, axis=1)            # [B, k]
    bit = jnp.arange(COMB_I, dtype=jnp.uint32)
    seen = ((words[:, :, None] >> bit) & 1) == 1
    cand = jnp.where(seen | (ids >= i_real), NEG, cand)
    # Final selection by k-fold max extraction: k unrolled
    # max+argmax+mask passes measured ~3.7x faster than lax.top_k's
    # sort on chip; argmax's first-index tie rule matches top_k's
    # lowest-index order exactly.
    c = cand.reshape(b, k * COMB_I)
    ids_flat = ids.reshape(b, k * COMB_I)
    lanes = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
    vs, cis = [], []
    for _ in range(k):
        m = jnp.max(c, axis=1)
        a = jnp.argmax(c, axis=1)
        vs.append(m)
        cis.append(a)
        c = jnp.where(lanes == a[:, None], -jnp.inf, c)
    v = jnp.stack(vs, axis=1)
    ci = jnp.stack(cis, axis=1)
    items = jnp.take_along_axis(ids_flat, ci, axis=1)
    # Normalize the kernel's finite -3e38 sentinel to the module-wide
    # -inf contract.
    return jnp.where(v > -1e37, v, -jnp.inf), items
