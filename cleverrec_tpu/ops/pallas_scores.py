"""Pallas TPU kernel: fused full-catalog dot scoring with seen masking.

The hot eval op for the dot-product family (BPR/GMF/SBPR/SAMN user
vectors): scores = U @ Q^T with the user's seen train items forced to
-inf before ranking (RankingRecommender.py:231-240 semantics).  XLA runs
this as matmul -> scatter-mask -> top_k with the [B, I] score matrix
round-tripping HBM between ops; the kernel fuses score + mask in one VMEM
pass per (user-block x item-block) tile:

- grid tiles (B/bm, I/bn); per tile one MXU matmul of the user block
  against the item block (fp32 accumulation),
- the seen mask is consumed as the packed per-user bitmap (the sampler's
  MemberTable.bits layout): word = bits[b, i>>5], bit (i & 31) — tested
  on the VPU directly against the tile's item ids, so no [B, I] boolean
  mask ever exists in HBM.

Falls back to plain XLA when Pallas is unavailable (non-TPU backends run
the kernel in interpret mode inside the tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cleverrec_tpu.common import cdiv

NEG = -3.0e38  # mask value (finite: top_k handles it like -inf)


def _kernel(u_ref, q_ref, bits_ref, out_ref, *, block_i: int):
    """One (user-block, item-block) tile: scores = u @ q^T, seen -> NEG."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    scores = jnp.dot(u_ref[...], q_ref[...].T,
                     preferred_element_type=jnp.float32)   # [bm, bn]
    item_ids = j * block_i + jax.lax.broadcasted_iota(
        jnp.int32, scores.shape, dimension=1)              # [bm, bn]
    # Packed-bitmap seen test: bits_ref holds this user block's words for
    # THIS item block only ([bm, block_i // 32]).
    word_idx = (item_ids % block_i) >> 5
    word = jnp.take_along_axis(bits_ref[...], word_idx, axis=1)
    bit = (word >> (item_ids & 31).astype(jnp.uint32)) & jnp.uint32(1)
    out_ref[...] = jnp.where(bit == 1, NEG, scores)


@functools.partial(jax.jit, static_argnames=("block_b", "block_i",
                                             "interpret"))
def fused_dot_topk_scores(u_vecs: jax.Array, q_table: jax.Array,
                          seen_bits: jax.Array, block_b: int = 256,
                          block_i: int = 1024,
                          interpret: bool = False) -> jax.Array:
    """Masked full-catalog scores [B, I] for ranking.

    u_vecs: [B, d]; q_table: [I, d]; seen_bits: [B, ceil(I/32)] uint32
    (per-user packed seen bitmaps, rows already gathered for the batch).
    block_i must be a multiple of 32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d = u_vecs.shape
    i, _ = q_table.shape
    assert block_i % 32 == 0
    grid = (cdiv(b, block_b), cdiv(i, block_i))
    b_pad = grid[0] * block_b - b
    i_pad = grid[1] * block_i - i
    if b_pad:
        u_vecs = jnp.pad(u_vecs, ((0, b_pad), (0, 0)))
        seen_bits = jnp.pad(seen_bits, ((0, b_pad), (0, 0)))
    if i_pad:
        q_table = jnp.pad(q_table, ((0, i_pad), (0, 0)))
    # Mark padded items seen so they rank last.
    words_total = (i + i_pad) // 32
    if seen_bits.shape[1] < words_total:
        seen_bits = jnp.pad(seen_bits,
                            ((0, 0), (0, words_total - seen_bits.shape[1])))
    if i_pad:
        pad_ids = np.arange(i, i + i_pad)
        pad_mask = np.zeros(words_total, np.uint32)
        np.bitwise_or.at(pad_mask, pad_ids >> 5,
                         np.uint32(1) << (pad_ids & 31).astype(np.uint32))
        seen_bits = seen_bits | jnp.asarray(pad_mask)[None, :]

    words_per_block = block_i // 32
    out = pl.pallas_call(
        functools.partial(_kernel, block_i=block_i),
        out_shape=jax.ShapeDtypeStruct((b + b_pad, i + i_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, d), lambda bi, ii: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_i, d), lambda bi, ii: (ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, words_per_block),
                         lambda bi, ii: (bi, ii),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, block_i),
                               lambda bi, ii: (bi, ii),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(u_vecs, q_table, seen_bits)
    return out[:b, :i]
