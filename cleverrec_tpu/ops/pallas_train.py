"""Pallas TPU kernel: VMEM-resident fused BPR training epoch.

The scan-based trainer (train/trainer.py) runs one XLA program per epoch,
but each step still round-trips the embedding tables and Adam moments
through HBM (gather -> grads -> scatter -> dense Adam = ~8 HBM passes over
the tables per step) and pays per-op dispatch inside the scan.  For
MF-family catalogs that FIT in VMEM (ml-100k/ml-1m-class), this kernel
runs the ENTIRE epoch as one Pallas program with P, Q and the four Adam
moment arrays resident in VMEM across all steps:

    grid = (steps,); per grid step the pipeline streams that step's
    pre-sampled (u, i, j) index rows HBM->VMEM (auto double-buffered)
    while compute proceeds; tables are DMA'd in once at step 0 and
    written back once at the end.

Gather/scatter are expressed as MXU matmuls via TRANSPOSED one-hot
matrices (onehotT[e, b] = 1 iff ids[b] == e), which avoids every
cross-lane reshape Mosaic lacks:

    rows   = onehotT^T @ table          (dot_general contracting dim 0)
    dTable = onehotT   @ d_rows         (scatter-add, duplicates sum)

Invalid (epoch-padding) rows are encoded by the SAMPLER as sentinel ids
pointing at all-zero padded table rows: their score diff is 0, their
gradient contributions vanish identically, and the constant
-log(sigmoid(0)) they add to the loss sum is subtracted on the host side
(count is static).  No weight vector enters the kernel.

Math parity: BPR.loss (models/bpr.py:35-42) with l2_loss = 0.5*sum(x^2)
and optax.adam(b1=0.9, b2=0.999, eps=1e-8) dense updates — the same
update the scan path applies, so fused == scan numerics up to f32
reduction order (tested in tests/test_fused_train.py).

Replaces the hot loop of the reference at
model/RankingRecommender.py:33-61 + model/BPR.py:33-44.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from cleverrec_tpu.common import cdiv

LOG2 = float(np.log(2.0))   # -log(sigmoid(0)): per-sentinel-row loss bias


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _epoch_kernel(t0_ref, u_ref, i_ref, j_ref,
                  hbm_p, hbm_q, hbm_mp, hbm_vp, hbm_mq, hbm_vq,
                  p_ref, q_ref, mp_ref, vp_ref, mq_ref, vq_ref, loss_ref,
                  dp_ref, dq_ref, acc_ref, sem,
                  *, steps: int, blk: int, lr: float, reg: float,
                  b1: float, b2: float, eps: float):
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    s = pl.program_id(0)
    u_pad, d = p_ref.shape
    i_pad, _ = q_ref.shape
    lane_w = u_ref.shape[2]            # idx blocks are [1, 8, B//8]
    n_sub = lane_w // blk

    @pl.when(s == 0)
    def _load_state():
        pairs = ((hbm_p, p_ref), (hbm_q, q_ref), (hbm_mp, mp_ref),
                 (hbm_vp, vp_ref), (hbm_mq, mq_ref), (hbm_vq, vq_ref))
        for k, (src, dst) in enumerate(pairs):
            pltpu.make_async_copy(src, dst, sem.at[k]).start()
        for k, (src, dst) in enumerate(pairs):
            pltpu.make_async_copy(src, dst, sem.at[k]).wait()
        acc_ref[0, 0] = 0.0

    # -- batch pass: grads into dp/dq scratch ---------------------------
    dp_ref[...] = jnp.zeros_like(dp_ref)
    dq_ref[...] = jnp.zeros_like(dq_ref)

    def onehot_t(ids_row, n_rows):
        """[n_rows, blk] transposed one-hot of a lane-oriented id row."""
        iota = jax.lax.broadcasted_iota(jnp.int32, (n_rows, blk), 0)
        return (iota == jnp.broadcast_to(ids_row, (n_rows, blk))).astype(
            jnp.float32)

    def gather(oh_t, table_ref):
        return jax.lax.dot_general(
            oh_t, table_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def block(kb, loss):
        row = pl.ds(kb // n_sub, 1)
        sl = pl.ds((kb % n_sub) * blk, blk)
        oh_u = onehot_t(u_ref[0, row, sl], u_pad)
        oh_i = onehot_t(i_ref[0, row, sl], i_pad)
        oh_j = onehot_t(j_ref[0, row, sl], i_pad)
        pe = gather(oh_u, p_ref)                    # [blk, d]
        qi = gather(oh_i, q_ref)
        qj = gather(oh_j, q_ref)
        qd = qi - qj
        diff = jnp.sum(pe * qd, axis=1, keepdims=True)      # [blk, 1]
        loss = loss + jnp.sum(-jax.nn.log_sigmoid(diff)) + 0.5 * reg * (
            jnp.sum(pe * pe) + jnp.sum(qi * qi) + jnp.sum(qj * qj))
        g = -jax.nn.sigmoid(-diff)                          # dL/ddiff
        d_pe = g * qd + reg * pe
        d_qi = g * pe + reg * qi
        d_qj = -g * pe + reg * qj
        dp_ref[...] += jnp.dot(oh_u, d_pe,
                               preferred_element_type=jnp.float32)
        dq_ref[...] += (jnp.dot(oh_i, d_qi,
                                preferred_element_type=jnp.float32)
                        + jnp.dot(oh_j, d_qj,
                                  preferred_element_type=jnp.float32))
        return loss

    loss = jax.lax.fori_loop(0, 8 * n_sub, block, 0.0)
    acc_ref[0, 0] += loss

    # -- dense Adam over the resident tables ----------------------------
    t = (t0_ref[0] + s + 1).astype(jnp.float32)
    bc1 = 1.0 - jnp.exp(t * math.log(b1))
    bc2 = 1.0 - jnp.exp(t * math.log(b2))

    def adam(p_r, m_r, v_r, g_r):
        g = g_r[...]
        m = b1 * m_r[...] + (1.0 - b1) * g
        v = b2 * v_r[...] + (1.0 - b2) * (g * g)
        m_r[...] = m
        v_r[...] = v
        p_r[...] -= lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)

    adam(p_ref, mp_ref, vp_ref, dp_ref)
    adam(q_ref, mq_ref, vq_ref, dq_ref)

    @pl.when(s == steps - 1)
    def _store_loss():
        loss_ref[0] = acc_ref[0, 0]


@functools.partial(jax.jit, static_argnames=(
    "lr", "reg", "b1", "b2", "eps", "blk", "interpret"))
def fused_bpr_epoch(p, q, mp, vp, mq, vq, u_idx, i_idx, j_idx, t0,
                    *, lr: float, reg: float, b1: float = 0.9,
                    b2: float = 0.999, eps: float = 1e-8,
                    blk: int = 256, interpret: bool = False):
    """One full BPR training epoch in a single Pallas program.

    p/q: [U, d]/[I, d] tables; mp/vp/mq/vq: matching Adam moments;
    u_idx/i_idx/j_idx: [steps, B] pre-sampled rows with INVALID slots
    already pointing at the sentinel ids U_pad-1 / I_pad-1 (see
    ``sentinel_dims``); t0: scalar int32 Adam step count so far.

    Returns (p, q, mp, vp, mq, vq, loss_total) — loss_total still
    includes log(2) per sentinel row; callers subtract
    ``n_sentinel * LOG2`` (static count) and divide by steps.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps, b = u_idx.shape
    u_real, d = p.shape
    i_real, _ = q.shape
    u_pad, i_pad = sentinel_dims(u_real, i_real)
    pads = lambda a, n: jnp.pad(a, ((0, n - a.shape[0]), (0, 0)))  # noqa: E731
    p, mp, vp = (pads(x, u_pad) for x in (p, mp, vp))
    q, mq, vq = (pads(x, i_pad) for x in (q, mq, vq))
    # Index rows stream as [1, 8, B/8] tiles (sublane x lane aligned);
    # pad B to a multiple of 8*blk with sentinel slots (their constant
    # log(2) loss bias is subtracted below — static count).
    padb = (_round_up(b, 8 * blk) - b) if b % (8 * blk) else 0
    if padb:
        pad_ids = lambda a, sent: jnp.pad(a, ((0, 0), (0, padb)),  # noqa: E731
                                          constant_values=sent)
        u_idx = pad_ids(u_idx, u_pad - 1)
        i_idx = pad_ids(i_idx, i_pad - 1)
        j_idx = pad_ids(j_idx, i_pad - 1)
        b = b + padb
    u_idx, i_idx, j_idx = (a.reshape(steps, 8, b // 8)
                           for a in (u_idx, i_idx, j_idx))

    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda s: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    idx = pl.BlockSpec((1, 8, b // 8), lambda s: (s, 0, 0),
                       memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_epoch_kernel, steps=steps, blk=blk,
                          lr=lr, reg=reg, b1=b1, b2=b2, eps=eps),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # t0
            idx, idx, idx,                              # u, i, j
            hbm, hbm, hbm, hbm, hbm, hbm,               # initial state
        ],
        out_specs=(
            full((u_pad, d)), full((i_pad, d)),
            full((u_pad, d)), full((u_pad, d)),
            full((i_pad, d)), full((i_pad, d)),
            pl.BlockSpec(memory_space=pltpu.SMEM),      # loss
        ),
        out_shape=(
            jax.ShapeDtypeStruct((u_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((i_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((u_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((u_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((i_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((i_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((u_pad, d), jnp.float32),        # dP
            pltpu.VMEM((i_pad, d), jnp.float32),        # dQ
            pltpu.SMEM((1, 1), jnp.float32),            # loss accumulator
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
    )(jnp.asarray([t0], jnp.int32), u_idx, i_idx, j_idx,
      p, q, mp, vp, mq, vq)
    p_o, q_o, mp_o, vp_o, mq_o, vq_o, loss = outs
    return (p_o[:u_real], q_o[:i_real], mp_o[:u_real], vp_o[:u_real],
            mq_o[:i_real], vq_o[:i_real], loss[0] - steps * padb * LOG2)


def _pw_kernel(t0_ref, uz_ref, i_ref,
               hbm_p, hbm_q, hbm_h, hbm_mp, hbm_vp, hbm_mq, hbm_vq,
               hbm_mh, hbm_vh,
               p_ref, q_ref, h_ref, mp_ref, vp_ref, mq_ref, vq_ref,
               mh_ref, vh_ref, loss_ref,
               dp_ref, dq_ref, acc_ref, sem,
               *, steps: int, blk: int, lr: float, reg: float,
               b1: float, b2: float, eps: float):
    """Pointwise sigmoid-cross-entropy epoch (GMF-family) kernel body.

    The label never enters as data: each streamed user id carries it in
    its SIGN (uz = (u+1)*(2y-1)), and the user one-hot is scaled by that
    sign z.  With pe' = z*P[u] the BCE collapses to the BPR form:
    s' = z*s, loss = -log_sigmoid(s'), g' = -sigmoid(-s'); gathering AND
    scattering through the signed one-hot yields exactly the true
    gradients for P, Q and the output weight h — no [blk, 1] label
    column, no cross-lane transpose.
    """
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    s = pl.program_id(0)
    u_pad, d = p_ref.shape
    i_pad, _ = q_ref.shape
    lane_w = uz_ref.shape[2]
    n_sub = lane_w // blk

    @pl.when(s == 0)
    def _load_state():
        pairs = ((hbm_p, p_ref), (hbm_q, q_ref), (hbm_h, h_ref),
                 (hbm_mp, mp_ref), (hbm_vp, vp_ref), (hbm_mq, mq_ref),
                 (hbm_vq, vq_ref), (hbm_mh, mh_ref), (hbm_vh, vh_ref))
        for k, (src, dst) in enumerate(pairs):
            pltpu.make_async_copy(src, dst, sem.at[k]).start()
        for k, (src, dst) in enumerate(pairs):
            pltpu.make_async_copy(src, dst, sem.at[k]).wait()
        acc_ref[0, 0] = 0.0

    dp_ref[...] = jnp.zeros_like(dp_ref)
    dq_ref[...] = jnp.zeros_like(dq_ref)

    def onehot_t(ids_row, n_rows):
        iota = jax.lax.broadcasted_iota(jnp.int32, (n_rows, blk), 0)
        return (iota == jnp.broadcast_to(ids_row, (n_rows, blk))).astype(
            jnp.float32)

    def gather(oh_t, table_ref):
        return jax.lax.dot_general(
            oh_t, table_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    h_row = h_ref[0:1, :]                               # [1, d]

    def block(kb, carry):
        loss, dh = carry
        row = pl.ds(kb // n_sub, 1)
        sl = pl.ds((kb % n_sub) * blk, blk)
        uz = uz_ref[0, row, sl]                         # [1, blk] signed
        z = jnp.where(uz > 0, 1.0, -1.0)
        oh_u = onehot_t(jnp.abs(uz) - 1, u_pad) * z     # signed one-hot
        oh_i = onehot_t(i_ref[0, row, sl], i_pad)
        pe = gather(oh_u, p_ref)                        # z * P[u]  [blk, d]
        qi = gather(oh_i, q_ref)
        prod = pe * qi
        sp = jnp.sum(prod * h_row, axis=1, keepdims=True)   # z * logits
        loss = loss + jnp.sum(-jax.nn.log_sigmoid(sp)) + 0.5 * reg * (
            jnp.sum(pe * pe) + jnp.sum(qi * qi))
        gp = -jax.nn.sigmoid(-sp)                       # dL/dsp  [blk, 1]
        d_pe = gp * (qi * h_row) + reg * pe             # signed-space
        d_qi = gp * (pe * h_row) + reg * qi             # true-space
        dh = dh + jnp.sum(gp * prod, axis=0, keepdims=True)
        dp_ref[...] += jnp.dot(oh_u, d_pe,
                               preferred_element_type=jnp.float32)
        dq_ref[...] += jnp.dot(oh_i, d_qi,
                               preferred_element_type=jnp.float32)
        return loss, dh

    loss, dh = jax.lax.fori_loop(
        0, 8 * n_sub, block, (0.0, jnp.zeros((1, d), jnp.float32)))
    acc_ref[0, 0] += loss

    t = (t0_ref[0] + s + 1).astype(jnp.float32)
    bc1 = 1.0 - jnp.exp(t * math.log(b1))
    bc2 = 1.0 - jnp.exp(t * math.log(b2))

    def adam(p_r, m_r, v_r, g):
        m = b1 * m_r[...] + (1.0 - b1) * g
        v = b2 * v_r[...] + (1.0 - b2) * (g * g)
        m_r[...] = m
        v_r[...] = v
        p_r[...] -= lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)

    adam(p_ref, mp_ref, vp_ref, dp_ref[...])
    adam(q_ref, mq_ref, vq_ref, dq_ref[...])
    # h's grad row 0 padded to the [8, d] tile; rows 1-7 stay identically
    # zero under dense Adam (zero m, v and grad).
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, d), 0)
    adam(h_ref, mh_ref, vh_ref, jnp.where(sub == 0, dh, 0.0))

    @pl.when(s == steps - 1)
    def _store_loss():
        loss_ref[0] = acc_ref[0, 0]


@functools.partial(jax.jit, static_argnames=(
    "lr", "reg", "b1", "b2", "eps", "blk", "interpret"))
def fused_gmf_epoch(p, q, h, mp, vp, mq, vq, mh, vh, uz_idx, i_idx, t0,
                    *, lr: float, reg: float, b1: float = 0.9,
                    b2: float = 0.999, eps: float = 1e-8,
                    blk: int = 256, interpret: bool = False):
    """One full GMF (pointwise sigmoid-xent) training epoch in a single
    Pallas program — the pointwise sibling of ``fused_bpr_epoch``.

    p/q: [U, d]/[I, d] tables; h: [d] output weight (GMF.py:29-58's
    h_gmf — unregularized, matching models/ncf.py GMF.loss); m*/v*:
    matching Adam moments; uz_idx: [steps, B] SIGN-ENCODED user rows
    ((u+1) for positives, -(u+1) for negatives, u_pad for sentinel
    slots); i_idx: [steps, B] item rows (sentinel i_pad-1 for invalid).

    Returns (p, q, h, mp, vp, mq, vq, mh, vh, loss_total); loss_total
    includes log(2) per sentinel row, subtracted by the caller.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps, b = uz_idx.shape
    u_real, d = p.shape
    i_real, _ = q.shape
    u_pad, i_pad = sentinel_dims(u_real, i_real)
    pads = lambda a, n: jnp.pad(a, ((0, n - a.shape[0]), (0, 0)))  # noqa: E731
    p, mp, vp = (pads(x, u_pad) for x in (p, mp, vp))
    q, mq, vq = (pads(x, i_pad) for x in (q, mq, vq))
    h, mh, vh = (pads(x[None, :], 8) for x in (h, mh, vh))
    padb = (_round_up(b, 8 * blk) - b) if b % (8 * blk) else 0
    if padb:
        pad_ids = lambda a, sent: jnp.pad(a, ((0, 0), (0, padb)),  # noqa: E731
                                          constant_values=sent)
        uz_idx = pad_ids(uz_idx, u_pad)         # |u_pad| - 1 = sentinel row
        i_idx = pad_ids(i_idx, i_pad - 1)
        b = b + padb
    uz_idx, i_idx = (a.reshape(steps, 8, b // 8) for a in (uz_idx, i_idx))

    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda s: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    idx = pl.BlockSpec((1, 8, b // 8), lambda s: (s, 0, 0),
                       memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_pw_kernel, steps=steps, blk=blk,
                          lr=lr, reg=reg, b1=b1, b2=b2, eps=eps),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # t0
            idx, idx,                                   # uz, i
            hbm, hbm, hbm, hbm, hbm, hbm, hbm, hbm, hbm,
        ],
        out_specs=(
            full((u_pad, d)), full((i_pad, d)), full((8, d)),
            full((u_pad, d)), full((u_pad, d)),
            full((i_pad, d)), full((i_pad, d)),
            full((8, d)), full((8, d)),
            pl.BlockSpec(memory_space=pltpu.SMEM),      # loss
        ),
        out_shape=(
            jax.ShapeDtypeStruct((u_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((i_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
            jax.ShapeDtypeStruct((u_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((u_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((i_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((i_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((u_pad, d), jnp.float32),        # dP
            pltpu.VMEM((i_pad, d), jnp.float32),        # dQ
            pltpu.SMEM((1, 1), jnp.float32),            # loss accumulator
            pltpu.SemaphoreType.DMA((9,)),
        ],
        interpret=interpret,
    )(jnp.asarray([t0], jnp.int32), uz_idx, i_idx,
      p, q, h, mp, vp, mq, vq, mh, vh)
    (p_o, q_o, h_o, mp_o, vp_o, mq_o, vq_o, mh_o, vh_o, loss) = outs
    return (p_o[:u_real], q_o[:i_real], h_o[0],
            mp_o[:u_real], vp_o[:u_real], mq_o[:i_real], vq_o[:i_real],
            mh_o[0], vh_o[0], loss[0] - steps * padb * LOG2)


def sentinel_dims(u_real: int, i_real: int) -> tuple[int, int]:
    """Padded table dims; the LAST padded row of each is the sentinel the
    sampler points invalid batch slots at (always > real ids)."""
    return _round_up(u_real + 1, 128), _round_up(i_real + 1, 128)


def vmem_footprint_bytes(u_real: int, i_real: int, d: int, b: int,
                         blk: int = 256) -> int:
    """Rough VMEM bytes the fused epoch needs: 6 resident state arrays +
    dP/dQ scratch + 3 one-hot blocks + streamed index rows (x2 buffers)."""
    u_pad, i_pad = sentinel_dims(u_real, i_real)
    state = 4 * d * (3 * u_pad + 3 * i_pad)
    scratch = 4 * d * (u_pad + i_pad)
    onehots = 4 * blk * (u_pad + 2 * i_pad)
    idx = 2 * 3 * 4 * _round_up(b, 8 * blk)
    return state + scratch + onehots + idx


FUSED_VMEM_BUDGET = 13 * 2 ** 20


def plan_fused(u_real: int, i_real: int, d: int, b: int):
    """Pick a block size that fits the VMEM budget, or None (caller
    falls back to the scan path).  A bf16-compute variant was measured
    and REJECTED: bf16 one-hot construction forces (8,128)->(16,128)
    retiling per block and ran 35x slower than f32, and even bf16 VMEM
    sizing cannot fit ml-1m-class state (the remote compiler rejects
    13MB+ resident layouts)."""
    for blk in (256, 128, 64):
        if vmem_footprint_bytes(u_real, i_real, d, b,
                                blk) < FUSED_VMEM_BUDGET:
            return blk
    return None
