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


def _onehot_t(ids_row, n_rows: int, blk: int, dtype=jnp.float32,
              iotas=None):
    """[n_rows, blk] transposed one-hot of a lane-oriented id row.

    bf16 one-hots: deriving bf16 from 32-bit lane structures pays an
    (8,128)->(16,128) retile per block (measured 2.04x the f32 step
    cost on v5e; an i16 iota would avoid it but "16-bit iota not
    supported by hardware").  With ``iotas`` = (lo_ref, hi_ref) — bf16
    scratch holding each row index's base-128 digits, filled ONCE at
    grid step 0 — the one-hot composes from two bf16-exact compares
    with no per-block retile: row < 32768 means hi < 256 and lo < 128,
    both exactly representable in bf16's 8-bit mantissa."""
    if dtype == jnp.bfloat16 and iotas is not None:
        lo_ref, hi_ref = iotas
        lo_b = jnp.broadcast_to(lo_ref[0:n_rows, 0:1], (n_rows, blk))
        hi_b = jnp.broadcast_to(hi_ref[0:n_rows, 0:1], (n_rows, blk))
        ids_lo = jnp.broadcast_to(
            (ids_row % 128).astype(jnp.bfloat16), (n_rows, blk))
        ids_hi = jnp.broadcast_to(
            (ids_row // 128).astype(jnp.bfloat16), (n_rows, blk))
        # Equality as ARITHMETIC (v5e rejects bf16 comparisons: "Target
        # does not support this comparison"): digits are exact small
        # ints, so |a - b| is 0 when equal and >= 1 otherwise, and
        # relu(1 - |a - b|) is an exact 0/1 indicator in bf16.
        one = jnp.bfloat16(1)
        zero = jnp.bfloat16(0)
        eq_lo = jnp.maximum(one - jnp.abs(lo_b - ids_lo), zero)
        eq_hi = jnp.maximum(one - jnp.abs(hi_b - ids_hi), zero)
        return eq_lo * eq_hi
    iota = jax.lax.broadcasted_iota(jnp.int32, (n_rows, blk), 0)
    return (iota == jnp.broadcast_to(ids_row, (n_rows, blk))).astype(
        dtype)


def _mxu_gather(oh_t, table_ref):
    """rows = onehotT^T @ table as an MXU dot (contracting dim 0)."""
    return jax.lax.dot_general(
        oh_t, table_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _load_resident(pairs, sem):
    """Start-then-wait async copies of the HBM state into the resident
    VMEM output buffers (issued once, at grid step 0)."""
    from jax.experimental.pallas import tpu as pltpu
    for k, (src, dst) in enumerate(pairs):
        pltpu.make_async_copy(src, dst, sem.at[k]).start()
    for k, (src, dst) in enumerate(pairs):
        pltpu.make_async_copy(src, dst, sem.at[k]).wait()


def _adam_step(t0_ref, s, b1: float, b2: float):
    """Bias-correction scalars for Adam step t0 + s + 1."""
    t = (t0_ref[0] + s + 1).astype(jnp.float32)
    return (1.0 - jnp.exp(t * math.log(b1)),
            1.0 - jnp.exp(t * math.log(b2)))


def _adam_apply(p_r, m_r, v_r, g, bc1, bc2, *, lr: float, b1: float,
                b2: float, eps: float):
    """Dense in-place Adam over one resident table.  bf16-stored state
    computes in f32 and rounds back on write (round-to-nearest); for
    f32 refs the casts are no-ops and the math is unchanged."""
    m = b1 * m_r[...].astype(jnp.float32) + (1.0 - b1) * g
    v = b2 * v_r[...].astype(jnp.float32) + (1.0 - b2) * (g * g)
    m_r[...] = m.astype(m_r.dtype)
    v_r[...] = v.astype(v_r.dtype)
    p_r[...] = (p_r[...].astype(jnp.float32)
                - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)).astype(
                    p_r.dtype)



def _epoch_kernel(t0_ref, u_ref, i_ref, j_ref,
                  hbm_p, hbm_q, hbm_mp, hbm_vp, hbm_mq, hbm_vq,
                  p_ref, q_ref, mp_ref, vp_ref, mq_ref, vq_ref, loss_ref,
                  dp_ref, dq_ref, sem, *iota_refs,
                  steps: int, blk: int, lr: float, reg: float,
                  b1: float, b2: float, eps: float):
    import jax.experimental.pallas as pl

    s = pl.program_id(0)
    u_pad, d = p_ref.shape
    i_pad, _ = q_ref.shape
    n_rb = u_ref.shape[1]              # idx blocks are [1, B//blk, blk]

    @pl.when(s == 0)
    def _load_state():
        _load_resident(((hbm_p, p_ref), (hbm_q, q_ref), (hbm_mp, mp_ref),
                        (hbm_vp, vp_ref), (hbm_mq, mq_ref),
                        (hbm_vq, vq_ref)), sem)

    iotas = iota_refs if iota_refs else None
    if iotas:
        # bf16 one-hot digit tables: one 32-bit-derived fill (the only
        # retile) at grid step 0; every block then composes its one-hot
        # from bf16-exact compares (see _onehot_t).
        @pl.when(s == 0)
        def _fill_iota():
            lo_ref, hi_ref = iotas
            r = jax.lax.broadcasted_iota(jnp.int32, lo_ref.shape, 0)
            lo_ref[...] = (r % 128).astype(jnp.bfloat16)
            hi_ref[...] = (r // 128).astype(jnp.bfloat16)

    # -- batch pass: grads into dp/dq scratch ---------------------------
    dp_ref[...] = jnp.zeros_like(dp_ref)
    dq_ref[...] = jnp.zeros_like(dq_ref)
    tdt = p_ref.dtype   # table storage dtype (f32 or bf16)
    onehot_t = lambda ids_row, n_rows: _onehot_t(ids_row, n_rows, blk,  # noqa: E731
                                                 dtype=tdt, iotas=iotas)
    gather = _mxu_gather

    def block(kb, loss):
        # One id row per block: DYNAMIC index only in the sublane dim —
        # lane offsets stay statically 0 (Mosaic requires provable
        # 128-multiples for dynamic lane offsets).
        row = pl.ds(kb, 1)
        oh_u = onehot_t(u_ref[0, row, :], u_pad)
        oh_i = onehot_t(i_ref[0, row, :], i_pad)
        oh_j = onehot_t(j_ref[0, row, :], i_pad)
        pe = gather(oh_u, p_ref)                    # [blk, d] f32
        qi = gather(oh_i, q_ref)
        qj = gather(oh_j, q_ref)
        qd = qi - qj
        diff = jnp.sum(pe * qd, axis=1, keepdims=True)      # [blk, 1]
        loss = loss + jnp.sum(-jax.nn.log_sigmoid(diff)) + 0.5 * reg * (
            jnp.sum(pe * pe) + jnp.sum(qi * qi) + jnp.sum(qj * qj))
        g = -jax.nn.sigmoid(-diff)                          # dL/ddiff
        # Row grads ride the scatter dots in the table dtype (the
        # accumulator scratch stays f32 via preferred_element_type).
        d_pe = (g * qd + reg * pe).astype(tdt)
        d_qi = (g * pe + reg * qi).astype(tdt)
        d_qj = (-g * pe + reg * qj).astype(tdt)
        dp_ref[...] += jnp.dot(oh_u, d_pe,
                               preferred_element_type=jnp.float32)
        dq_ref[...] += (jnp.dot(oh_i, d_qi,
                                preferred_element_type=jnp.float32)
                        + jnp.dot(oh_j, d_qj,
                                  preferred_element_type=jnp.float32))
        return loss

    # Per-step loss vector (summed by the wrapper as an XLA tree
    # reduction — a single running f32 cell loses ~4 digits on long
    # epochs).
    loss_ref[s] = jax.lax.fori_loop(0, n_rb, block, 0.0)

    # -- dense Adam over the resident tables ----------------------------
    bc1, bc2 = _adam_step(t0_ref, s, b1, b2)
    _adam_apply(p_ref, mp_ref, vp_ref, dp_ref[...], bc1, bc2,
                lr=lr, b1=b1, b2=b2, eps=eps)
    _adam_apply(q_ref, mq_ref, vq_ref, dq_ref[...], bc1, bc2,
                lr=lr, b1=b1, b2=b2, eps=eps)


@functools.partial(jax.jit, static_argnames=(
    "lr", "reg", "b1", "b2", "eps", "blk", "interpret", "table_dtype"))
def fused_bpr_epoch(p, q, mp, vp, mq, vq, u_idx, i_idx, j_idx, t0,
                    *, lr: float, reg: float, b1: float = 0.9,
                    b2: float = 0.999, eps: float = 1e-8,
                    blk: int = 256, interpret: bool = False,
                    table_dtype=jnp.float32):
    """One full BPR training epoch in a single Pallas program.

    p/q: [U, d]/[I, d] tables; mp/vp/mq/vq: matching Adam moments;
    u_idx/i_idx/j_idx: [steps, B] pre-sampled rows with INVALID slots
    already pointing at the sentinel ids U_pad-1 / I_pad-1 (see
    ``sentinel_dims``); t0: scalar int32 Adam step count so far.

    ``table_dtype=jnp.bfloat16`` stores the six resident state arrays
    (tables + Adam moments) in bf16 — halving their VMEM charge so 2x
    larger tables stay fused-resident (``plan_fused(bf16=True)``) —
    while ALL arithmetic stays f32 (gather/scatter dots accumulate via
    preferred_element_type; Adam computes in f32 and rounds back on
    write).  Inputs are cast on entry and the outputs are returned
    upcast to f32 carrying bf16-rounded values: re-rounding them next
    epoch is exact, so trainer state round-trips losslessly.

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
    if table_dtype != jnp.float32:
        assert max(u_pad, i_pad) < (1 << 15), (
            "bf16 fused plan requires i16-addressable tables")
        p, q, mp, vp, mq, vq = (x.astype(table_dtype)
                                for x in (p, q, mp, vp, mq, vq))
    pads = lambda a, n: jnp.pad(a, ((0, n - a.shape[0]), (0, 0)))  # noqa: E731
    p, mp, vp = (pads(x, u_pad) for x in (p, mp, vp))
    q, mq, vq = (pads(x, i_pad) for x in (q, mq, vq))
    # Index rows stream as [1, B/blk, blk] tiles — one sublane ROW per
    # compute block, so the kernel's per-block loads use a dynamic
    # SUBLANE index with static lane offset 0 (dynamic lane offsets must
    # be provably 128-aligned, which (kb % n) * blk is not).  Pad B to a
    # multiple of blk with sentinel slots (their constant log(2) loss
    # bias is subtracted below — static count).
    padb = (_round_up(b, blk) - b) if b % blk else 0
    if padb:
        pad_ids = lambda a, sent: jnp.pad(a, ((0, 0), (0, padb)),  # noqa: E731
                                          constant_values=sent)
        u_idx = pad_ids(u_idx, u_pad - 1)
        i_idx = pad_ids(i_idx, i_pad - 1)
        j_idx = pad_ids(j_idx, i_pad - 1)
        b = b + padb
    u_idx, i_idx, j_idx = (a.reshape(steps, b // blk, blk)
                           for a in (u_idx, i_idx, j_idx))

    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda s: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    idx = pl.BlockSpec((1, b // blk, blk), lambda s: (s, 0, 0),
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
            jax.ShapeDtypeStruct((u_pad, d), table_dtype),
            jax.ShapeDtypeStruct((i_pad, d), table_dtype),
            jax.ShapeDtypeStruct((u_pad, d), table_dtype),
            jax.ShapeDtypeStruct((u_pad, d), table_dtype),
            jax.ShapeDtypeStruct((i_pad, d), table_dtype),
            jax.ShapeDtypeStruct((i_pad, d), table_dtype),
            jax.ShapeDtypeStruct((steps,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((u_pad, d), jnp.float32),        # dP
            pltpu.VMEM((i_pad, d), jnp.float32),        # dQ
            pltpu.SemaphoreType.DMA((6,)),
        ] + ([pltpu.VMEM((max(u_pad, i_pad), 128), jnp.bfloat16),
              pltpu.VMEM((max(u_pad, i_pad), 128), jnp.bfloat16)]
             if table_dtype == jnp.bfloat16 else []),
        interpret=interpret,
    )(jnp.asarray([t0], jnp.int32), u_idx, i_idx, j_idx,
      p, q, mp, vp, mq, vq)
    p_o, q_o, mp_o, vp_o, mq_o, vq_o, loss = outs
    f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
    return (f32(p_o[:u_real]), f32(q_o[:i_real]), f32(mp_o[:u_real]),
            f32(vp_o[:u_real]), f32(mq_o[:i_real]), f32(vq_o[:i_real]),
            jnp.sum(loss) - steps * padb * LOG2)


def _pw_kernel(t0_ref, uz_ref, i_ref,
               hbm_p, hbm_q, hbm_h, hbm_mp, hbm_vp, hbm_mq, hbm_vq,
               hbm_mh, hbm_vh,
               p_ref, q_ref, h_ref, mp_ref, vp_ref, mq_ref, vq_ref,
               mh_ref, vh_ref, loss_ref,
               dp_ref, dq_ref, sem,
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
    import jax.experimental.pallas as pl

    s = pl.program_id(0)
    u_pad, d = p_ref.shape
    i_pad, _ = q_ref.shape
    n_rb = uz_ref.shape[1]             # idx blocks are [1, B//blk, blk]

    @pl.when(s == 0)
    def _load_state():
        _load_resident(((hbm_p, p_ref), (hbm_q, q_ref), (hbm_h, h_ref),
                        (hbm_mp, mp_ref), (hbm_vp, vp_ref),
                        (hbm_mq, mq_ref), (hbm_vq, vq_ref),
                        (hbm_mh, mh_ref), (hbm_vh, vh_ref)), sem)

    dp_ref[...] = jnp.zeros_like(dp_ref)
    dq_ref[...] = jnp.zeros_like(dq_ref)
    onehot_t = lambda ids_row, n_rows: _onehot_t(ids_row, n_rows, blk)  # noqa: E731
    gather = _mxu_gather

    h_row = h_ref[0:1, :]                               # [1, d]

    def block(kb, carry):
        loss, dh = carry
        row = pl.ds(kb, 1)              # dynamic sublane, static lanes
        uz = uz_ref[0, row, :]                          # [1, blk] signed
        z = jnp.where(uz > 0, 1.0, -1.0)
        oh_u = onehot_t(jnp.abs(uz) - 1, u_pad) * z     # signed one-hot
        oh_i = onehot_t(i_ref[0, row, :], i_pad)
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
        0, n_rb, block, (0.0, jnp.zeros((1, d), jnp.float32)))
    loss_ref[s] = loss                  # per-step; wrapper tree-sums

    bc1, bc2 = _adam_step(t0_ref, s, b1, b2)
    ad = functools.partial(_adam_apply, bc1=bc1, bc2=bc2,
                           lr=lr, b1=b1, b2=b2, eps=eps)
    ad(p_ref, mp_ref, vp_ref, dp_ref[...])
    ad(q_ref, mq_ref, vq_ref, dq_ref[...])
    # h's grad row 0 padded to the [8, d] tile; rows 1-7 stay identically
    # zero under dense Adam (zero m, v and grad).
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, d), 0)
    ad(h_ref, mh_ref, vh_ref, jnp.where(sub == 0, dh, 0.0))


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
    padb = (_round_up(b, blk) - b) if b % blk else 0
    if padb:
        pad_ids = lambda a, sent: jnp.pad(a, ((0, 0), (0, padb)),  # noqa: E731
                                          constant_values=sent)
        uz_idx = pad_ids(uz_idx, u_pad)         # |u_pad| - 1 = sentinel row
        i_idx = pad_ids(i_idx, i_pad - 1)
        b = b + padb
    uz_idx, i_idx = (a.reshape(steps, b // blk, blk)
                     for a in (uz_idx, i_idx))

    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda s: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    idx = pl.BlockSpec((1, b // blk, blk), lambda s: (s, 0, 0),
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
            jax.ShapeDtypeStruct((steps,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((u_pad, d), jnp.float32),        # dP
            pltpu.VMEM((i_pad, d), jnp.float32),        # dQ
            pltpu.SemaphoreType.DMA((9,)),
        ],
        interpret=interpret,
    )(jnp.asarray([t0], jnp.int32), uz_idx, i_idx,
      p, q, h, mp, vp, mq, vq, mh, vh)
    (p_o, q_o, h_o, mp_o, vp_o, mq_o, vq_o, mh_o, vh_o, loss) = outs
    return (p_o[:u_real], q_o[:i_real], h_o[0],
            mp_o[:u_real], vp_o[:u_real], mq_o[:i_real], vq_o[:i_real],
            mh_o[0], vh_o[0], jnp.sum(loss) - steps * padb * LOG2)


def _mlp_kernel(t0_ref, uz_ref, i_ref, *refs,
                steps: int, blk: int, nd: int, row_loss, lr: float,
                b1: float, b2: float, eps: float):
    """Generic pointwise epoch kernel body (NeuMF/MLP family).

    The per-row objective is NOT hand-differentiated: ``row_loss`` (a
    pure function of the gathered user/item rows, the dense tower
    params, and the label/validity columns) is reverse-differentiated
    with ``jax.value_and_grad`` INSIDE the kernel — the transpose ops it
    produces (matmul transposes, relu selects) all lower to Mosaic.
    User-side and item-side embedding tables arrive pre-CONCATENATED on
    the feature axis (e.g. NeuMF's [P_gmf | P_mlp]), so one one-hot
    gather/scatter pair per side covers every table: 4 table-width MXU
    matmuls per block regardless of how many logical tables the model
    has.  Dense (tower) grads accumulate into VMEM scratch across the
    step's blocks; everything gets the same dense Adam update at step
    end.

    Labels ride the user id sign (uz = (u+1)*(2y-1), u_pad = invalid);
    the label/validity lane rows become [blk, 1] columns via mat-vecs
    against the user one-hot (its columns each sum to 1), so no
    cross-lane transpose is ever needed.  Invalid rows are masked by an
    EXPLICIT weight column (a tower with biases scores nonzero on
    all-zero sentinel embeddings, so the BPR/GMF kernels'
    constant-bias trick does not apply): their loss and every gradient
    contribution vanish identically, and no host-side loss correction
    is needed.

    Ref layout (after the 3 index streams): 3A HBM inputs (A = 2 + nd
    params in order [pu, qi, *dense], then their mu, then nu), 3A
    resident VMEM outputs in the same order, the per-step loss vector,
    A gradient scratch buffers, one DMA semaphore.
    """
    import jax.experimental.pallas as pl

    A = 2 + nd
    hbm = refs[:3 * A]
    res = refs[3 * A:6 * A]
    loss_ref = refs[6 * A]
    grads = refs[6 * A + 1:6 * A + 1 + A]
    sem = refs[-1]
    p_res, m_res, v_res = res[:A], res[A:2 * A], res[2 * A:]
    pu_ref, qi_ref = p_res[0], p_res[1]

    s = pl.program_id(0)
    u_pad = pu_ref.shape[0]
    i_pad = qi_ref.shape[0]
    n_rb = uz_ref.shape[1]             # idx blocks are [1, B//blk, blk]

    @pl.when(s == 0)
    def _load_state():
        _load_resident(tuple(zip(hbm, res)), sem)

    for g in grads:
        g[...] = jnp.zeros_like(g)
    ones_u = jnp.ones((u_pad, 1), jnp.float32)

    def block(kb, loss):
        row = pl.ds(kb, 1)             # dynamic sublane, static lanes
        uz = uz_ref[0, row, :]                          # [1, blk] signed
        y_t = (uz > 0).astype(jnp.float32)
        w_t = (jnp.abs(uz) != u_pad).astype(jnp.float32)
        oh_u = _onehot_t(jnp.abs(uz) - 1, u_pad, blk)
        oh_i = _onehot_t(i_ref[0, row, :], i_pad, blk)
        # Lane rows -> [blk, 1] columns: each one-hot column sums to 1.
        lane2col = lambda v_t: jax.lax.dot_general(  # noqa: E731
            oh_u * v_t, ones_u, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y_c, w_c = lane2col(y_t), lane2col(w_t)
        pe = _mxu_gather(oh_u, pu_ref)                  # [blk, tw_u]
        qe = _mxu_gather(oh_i, qi_ref)                  # [blk, tw_i]
        dense_vals = tuple(r[...] for r in p_res[2:])
        lval, (g_pe, g_qe, g_dv) = jax.value_and_grad(
            row_loss, argnums=(0, 1, 2))(pe, qe, dense_vals, y_c, w_c)
        grads[0][...] += jnp.dot(oh_u, g_pe,
                                 preferred_element_type=jnp.float32)
        grads[1][...] += jnp.dot(oh_i, g_qe,
                                 preferred_element_type=jnp.float32)
        for k in range(nd):
            grads[2 + k][...] += g_dv[k]
        return loss + lval

    loss_ref[s] = jax.lax.fori_loop(0, n_rb, block, 0.0)

    bc1, bc2 = _adam_step(t0_ref, s, b1, b2)
    for k in range(A):
        _adam_apply(p_res[k], m_res[k], v_res[k], grads[k][...], bc1, bc2,
                    lr=lr, b1=b1, b2=b2, eps=eps)


@functools.partial(jax.jit, static_argnames=(
    "row_loss", "lr", "b1", "b2", "eps", "blk", "interpret"))
def fused_mlp_epoch(pu, qi, dense, mpu, mqi, mdense, vpu, vqi, vdense,
                    uz_idx, i_idx, t0, *, row_loss, lr: float,
                    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                    blk: int = 256, interpret: bool = False):
    """One full pointwise NeuMF/MLP-family training epoch in a single
    Pallas program, with every parameter + its Adam moments
    VMEM-resident.

    pu/qi: [U, tw_u]/[I, tw_i] feature-axis-CONCATENATED user/item
    tables; dense: tuple of tower params (1-D entries are lifted to
    [1, n] for the kernel and returned in their original shape);
    m*/v*: matching Adam moments (dense moments as tuples in the same
    order).  uz_idx: [steps, B] sign-encoded user rows ((u+1) positive,
    -(u+1) negative, u_pad invalid); i_idx: [steps, B] item rows
    (sentinel i_pad-1 for invalid).  ``row_loss(pe, qe, dense, y, w)``
    must return the batch loss SUM with the validity column w applied
    to both the per-row loss and (by construction of the model's scan
    loss) its regularizers — models supply it via ``fused_mlp_spec``.

    Returns (pu, qi, dense, mpu, mqi, mdense, vpu, vqi, vdense,
    loss_total); loss_total needs NO sentinel correction (explicit
    masking)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps, b = uz_idx.shape
    u_real, tw_u = pu.shape
    i_real, tw_i = qi.shape
    u_pad, i_pad = sentinel_dims(u_real, i_real)
    nd = len(dense)
    d_shapes = tuple(x.shape for x in dense)
    lift = lambda x: x[None, :] if x.ndim == 1 else x  # noqa: E731
    dense, mdense, vdense = (tuple(lift(x) for x in t)
                             for t in (dense, mdense, vdense))
    pads = lambda a, n: jnp.pad(a, ((0, n - a.shape[0]), (0, 0)))  # noqa: E731
    pu, mpu, vpu = (pads(x, u_pad) for x in (pu, mpu, vpu))
    qi, mqi, vqi = (pads(x, i_pad) for x in (qi, mqi, vqi))
    padb = (_round_up(b, blk) - b) if b % blk else 0
    if padb:
        uz_idx = jnp.pad(uz_idx, ((0, 0), (0, padb)),
                         constant_values=u_pad)
        i_idx = jnp.pad(i_idx, ((0, 0), (0, padb)),
                        constant_values=i_pad - 1)
        b = b + padb
    uz_idx, i_idx = (a.reshape(steps, b // blk, blk)
                     for a in (uz_idx, i_idx))

    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda s: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    idx = pl.BlockSpec((1, b // blk, blk), lambda s: (s, 0, 0),
                       memory_space=pltpu.VMEM)

    arrs = ((pu, qi) + dense + (mpu, mqi) + mdense
            + (vpu, vqi) + vdense)
    shapes = tuple(a.shape for a in arrs)
    outs = pl.pallas_call(
        functools.partial(_mlp_kernel, steps=steps, blk=blk, nd=nd,
                          row_loss=row_loss, lr=lr, b1=b1, b2=b2, eps=eps),
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),    # t0
                  idx, idx] + [hbm] * len(arrs),
        out_specs=tuple(full(sh) for sh in shapes)
        + (pl.BlockSpec(memory_space=pltpu.SMEM),),         # loss
        out_shape=tuple(jax.ShapeDtypeStruct(sh, jnp.float32)
                        for sh in shapes)
        + (jax.ShapeDtypeStruct((steps,), jnp.float32),),
        scratch_shapes=[pltpu.VMEM(sh, jnp.float32)
                        for sh in shapes[:2 + nd]]
        + [pltpu.SemaphoreType.DMA((len(arrs),))],
        interpret=interpret,
    )(jnp.asarray([t0], jnp.int32), uz_idx, i_idx, *arrs)

    A = 2 + nd
    unlift = lambda t: tuple(  # noqa: E731
        x.reshape(sh) for x, sh in zip(t, d_shapes))
    group = lambda k: (outs[k * A][:u_real], outs[k * A + 1][:i_real],  # noqa: E731
                       unlift(outs[k * A + 2:(k + 1) * A]))
    (pu_o, qi_o, dense_o) = group(0)
    (mpu_o, mqi_o, mdense_o) = group(1)
    (vpu_o, vqi_o, vdense_o) = group(2)
    return (pu_o, qi_o, dense_o, mpu_o, mqi_o, mdense_o,
            vpu_o, vqi_o, vdense_o, jnp.sum(outs[-1]))


def plan_fused_mlp(u_real: int, i_real: int, tw_u: int, tw_i: int,
                   dense_elems: int, b: int, act_cols: int):
    """Block size for the generic pointwise (NeuMF/MLP) fused epoch, or
    None (scan fallback).  Charges 4 copies of every param (3 state +
    grad scratch), the two one-hot blocks, the double-buffered index
    streams, and ~3x the forward activation columns for the in-kernel
    AD's forward + transpose temporaries."""
    u_pad, i_pad = sentinel_dims(u_real, i_real)
    state = 4 * 4 * (u_pad * tw_u + i_pad * tw_i + dense_elems)
    for blk in (256, 128):
        lanes = max(blk, 128)
        onehots = 4 * lanes * (u_pad + i_pad)
        idx = 2 * 2 * 4 * (_round_up(b, blk) // blk) * lanes
        acts = 4 * lanes * act_cols * 3
        if state + onehots + idx + acts < FUSED_VMEM_BUDGET:
            return blk
    return None


def _rows_kernel(t0_ref, *refs, steps: int, blk: int, sides: tuple,
                 nf: int, nd: int, row_loss, lr: float,
                 b1: float, b2: float, eps: float):
    """Generic multi-plane epoch kernel body (social-triple family:
    SBPR / CUNE_BPR / TBPR, and any protocol whose batch is a set of
    user/item id planes plus float columns).

    Like _mlp_kernel, the objective is differentiated in-kernel by
    jax.value_and_grad over ``row_loss(rows, floats, dense, w)``.  Each
    id plane (``sides[p]`` = 'u' or 'i') gets its own one-hot gather
    from the corresponding concatenated resident table and its own
    scatter back; float planes (e.g. SBPR's suk coefficient) become
    [blk, 1] columns via the mat-vec against plane 0's one-hot.
    Validity is derived from plane 0 (always user-side): sentinel id
    u_pad-1 marks an invalid row, and row_loss masks with w — no
    host-side loss correction.

    Ref layout: P = len(sides) id-plane streams, nf float streams, then
    3A HBM inputs (A = 2 + nd params: pu, qi, *dense), 3A resident
    outputs, the per-step loss vector, A gradient scratch buffers, one
    DMA semaphore."""
    import jax.experimental.pallas as pl

    P = len(sides)
    A = 2 + nd
    plane_refs = refs[:P]
    float_refs = refs[P:P + nf]
    rest = refs[P + nf:]
    hbm = rest[:3 * A]
    res = rest[3 * A:6 * A]
    loss_ref = rest[6 * A]
    grads = rest[6 * A + 1:6 * A + 1 + A]
    sem = rest[6 * A + 1 + A]
    iotas = rest[6 * A + 2 + A:] or None
    p_res, m_res, v_res = res[:A], res[A:2 * A], res[2 * A:]
    pu_ref, qi_ref = p_res[0], p_res[1]
    tdt = pu_ref.dtype                 # table storage dtype (f32 / bf16)

    s = pl.program_id(0)
    u_pad = pu_ref.shape[0]
    i_pad = qi_ref.shape[0]
    n_rb = plane_refs[0].shape[1]      # idx blocks are [1, B//blk, blk]

    @pl.when(s == 0)
    def _load_state():
        _load_resident(tuple(zip(hbm, res)), sem)

    if iotas:
        # bf16 one-hot digit tables (see _onehot_t / _epoch_kernel).
        @pl.when(s == 0)
        def _fill_iota():
            lo_ref, hi_ref = iotas
            r = jax.lax.broadcasted_iota(jnp.int32, lo_ref.shape, 0)
            lo_ref[...] = (r % 128).astype(jnp.bfloat16)
            hi_ref[...] = (r // 128).astype(jnp.bfloat16)

    for g in grads:
        g[...] = jnp.zeros_like(g)
    ones_u = jnp.ones((u_pad, 1), tdt)

    def block(kb, loss):
        row = pl.ds(kb, 1)             # dynamic sublane, static lanes
        ohs = tuple(
            _onehot_t(plane_refs[p][0, row, :],
                      u_pad if sides[p] == "u" else i_pad, blk,
                      dtype=tdt, iotas=iotas)
            for p in range(P))
        w_t = (plane_refs[0][0, row, :] != u_pad - 1).astype(tdt)
        lane2col = lambda v_t: jax.lax.dot_general(  # noqa: E731
            ohs[0] * v_t.astype(tdt), ones_u, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        w_c = lane2col(w_t)
        floats = tuple(lane2col(float_refs[f][0, row, :])
                       for f in range(nf))
        rows = tuple(
            _mxu_gather(ohs[p], pu_ref if sides[p] == "u" else qi_ref)
            for p in range(P))
        dense_vals = tuple(r[...].astype(jnp.float32) for r in p_res[2:])
        lval, (g_rows, g_dv) = jax.value_and_grad(
            row_loss, argnums=(0, 2))(rows, floats, dense_vals, w_c)
        for p in range(P):
            grads[0 if sides[p] == "u" else 1][...] += jnp.dot(
                ohs[p], g_rows[p].astype(tdt),
                preferred_element_type=jnp.float32)
        for k in range(nd):
            grads[2 + k][...] += g_dv[k]
        return loss + lval

    loss_ref[s] = jax.lax.fori_loop(0, n_rb, block, 0.0)

    bc1, bc2 = _adam_step(t0_ref, s, b1, b2)
    for k in range(A):
        _adam_apply(p_res[k], m_res[k], v_res[k], grads[k][...], bc1, bc2,
                    lr=lr, b1=b1, b2=b2, eps=eps)


@functools.partial(jax.jit, static_argnames=(
    "sides", "row_loss", "lr", "b1", "b2", "eps", "blk", "interpret",
    "table_dtype"))
def fused_rows_epoch(pu, qi, dense, mpu, mqi, mdense, vpu, vqi, vdense,
                     planes, floats, t0, *, sides: tuple, row_loss,
                     lr: float, b1: float = 0.9, b2: float = 0.999,
                     eps: float = 1e-8, blk: int = 256,
                     interpret: bool = False, table_dtype=jnp.float32):
    """One full multi-plane (social-triple family) training epoch in a
    single Pallas program with all params + Adam moments VMEM-resident.

    pu/qi: [U, tw_u]/[I, tw_i] feature-axis-concatenated user/item
    tables (e.g. SBPR's [Q | bias-column]); dense: tuple of extra
    params (0-D/1-D entries are lifted to 2-D for the kernel and
    returned in their original shape); planes: tuple of [steps, B]
    int32 id streams, plane p drawing from the user table when
    sides[p] == 'u' (sentinel u_pad-1 for invalid rows) else the item
    table (sentinel i_pad-1); floats: tuple of [steps, B] f32 streams
    delivered to row_loss as [blk, 1] columns.  Plane 0 must be
    user-side — validity is derived from it.  ``row_loss(rows, floats,
    dense, w)`` returns the batch loss SUM with w applied (models
    supply it via ``fused_rows_spec``).

    Returns (pu, qi, dense, mpu, mqi, mdense, vpu, vqi, vdense,
    loss_total); loss_total needs NO sentinel correction."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps, b = planes[0].shape
    u_real, tw_u = pu.shape
    i_real, tw_i = qi.shape
    u_pad, i_pad = sentinel_dims(u_real, i_real)
    nd, nf = len(dense), len(floats)
    d_shapes = tuple(x.shape for x in dense)
    if table_dtype != jnp.float32:
        # bf16 STORAGE (see fused_bpr_epoch): state + one-hots bf16,
        # arithmetic f32, outputs returned upcast (lossless round-trip).
        assert max(u_pad, i_pad) < (1 << 15), (
            "bf16 rows plan requires digit-addressable tables")
        cast = lambda t: tuple(x.astype(table_dtype) for x in t)  # noqa: E731
        pu, qi = pu.astype(table_dtype), qi.astype(table_dtype)
        mpu, mqi = mpu.astype(table_dtype), mqi.astype(table_dtype)
        vpu, vqi = vpu.astype(table_dtype), vqi.astype(table_dtype)
        dense, mdense, vdense = cast(dense), cast(mdense), cast(vdense)
    lift = lambda x: x.reshape((1, -1)) if x.ndim < 2 else x  # noqa: E731
    dense, mdense, vdense = (tuple(lift(x) for x in t)
                             for t in (dense, mdense, vdense))
    pads = lambda a, n: jnp.pad(a, ((0, n - a.shape[0]), (0, 0)))  # noqa: E731
    pu, mpu, vpu = (pads(x, u_pad) for x in (pu, mpu, vpu))
    qi, mqi, vqi = (pads(x, i_pad) for x in (qi, mqi, vqi))
    padb = (_round_up(b, blk) - b) if b % blk else 0
    if padb:
        planes = tuple(
            jnp.pad(a, ((0, 0), (0, padb)),
                    constant_values=(u_pad - 1 if sd == "u"
                                     else i_pad - 1))
            for a, sd in zip(planes, sides))
        floats = tuple(jnp.pad(a, ((0, 0), (0, padb))) for a in floats)
        b = b + padb
    planes = tuple(a.reshape(steps, b // blk, blk) for a in planes)
    floats = tuple(a.reshape(steps, b // blk, blk) for a in floats)

    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda s: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    idx = pl.BlockSpec((1, b // blk, blk), lambda s: (s, 0, 0),
                       memory_space=pltpu.VMEM)

    arrs = ((pu, qi) + dense + (mpu, mqi) + mdense
            + (vpu, vqi) + vdense)
    shapes = tuple(a.shape for a in arrs)
    outs = pl.pallas_call(
        functools.partial(_rows_kernel, steps=steps, blk=blk,
                          sides=sides, nf=nf, nd=nd, row_loss=row_loss,
                          lr=lr, b1=b1, b2=b2, eps=eps),
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]    # t0
        + [idx] * (len(planes) + len(floats))
        + [hbm] * len(arrs),
        out_specs=tuple(full(sh) for sh in shapes)
        + (pl.BlockSpec(memory_space=pltpu.SMEM),),         # loss
        out_shape=tuple(jax.ShapeDtypeStruct(sh, table_dtype)
                        for sh in shapes)
        + (jax.ShapeDtypeStruct((steps,), jnp.float32),),
        scratch_shapes=[pltpu.VMEM(sh, jnp.float32)
                        for sh in shapes[:2 + nd]]
        + [pltpu.SemaphoreType.DMA((len(arrs),))]
        + ([pltpu.VMEM((max(u_pad, i_pad), 128), jnp.bfloat16),
            pltpu.VMEM((max(u_pad, i_pad), 128), jnp.bfloat16)]
           if table_dtype == jnp.bfloat16 else []),
        interpret=interpret,
    )(jnp.asarray([t0], jnp.int32), *planes, *floats, *arrs)

    A = 2 + nd
    f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
    unlift = lambda t: tuple(  # noqa: E731
        f32(x).reshape(sh) for x, sh in zip(t, d_shapes))
    group = lambda k: (f32(outs[k * A][:u_real]),  # noqa: E731
                       f32(outs[k * A + 1][:i_real]),
                       unlift(outs[k * A + 2:(k + 1) * A]))
    (pu_o, qi_o, dense_o) = group(0)
    (mpu_o, mqi_o, mdense_o) = group(1)
    (vpu_o, vqi_o, vdense_o) = group(2)
    return (pu_o, qi_o, dense_o, mpu_o, mqi_o, mdense_o,
            vpu_o, vqi_o, vdense_o, jnp.sum(outs[-1]))


def plan_fused_rows(u_real: int, i_real: int, tw_u: int, tw_i: int,
                    dense_elems: int, b: int, n_u_planes: int,
                    n_i_planes: int, nf: int, bf16: bool = False):
    """Block size for the generic multi-plane fused epoch, or None
    (scan fallback).  Charges every plane's one-hot as simultaneously
    live (they are, within a block).  ``bf16``: bf16 STORAGE sizing
    (p/m/v + one-hots bf16, grad scratch f32, + the digit-iota
    scratch) — see fused_rows_epoch(table_dtype=...)."""
    u_pad, i_pad = sentinel_dims(u_real, i_real)
    if bf16 and max(u_pad, i_pad) >= (1 << 15):
        return None
    elem = 2 if bf16 else 4
    # p/m/v copies in the table dtype + the f32 grad scratch.
    state = (3 * elem + 4) * (u_pad * tw_u + i_pad * tw_i + dense_elems)
    iota = 2 * 2 * max(u_pad, i_pad) * 128 if bf16 else 0
    # bf16 digit-construction temporaries (see vmem_footprint_bytes).
    oh_mult = 4 if bf16 else 1
    for blk in (256, 128):
        lanes = max(blk, 128)
        onehots = (oh_mult * elem * lanes
                   * (n_u_planes * u_pad + n_i_planes * i_pad))
        idx = 2 * (n_u_planes + n_i_planes + nf) * 4 * (
            _round_up(b, blk) // blk) * lanes
        acts = 4 * lanes * 4 * (tw_u + tw_i)
        if state + onehots + idx + acts + iota < FUSED_VMEM_BUDGET:
            return blk
    return None


def _rows_stream_kernel(t0_ref, *refs, blk: int, sides: tuple,
                        nf: int, nd: int, row_loss, lr: float,
                        b1: float, b2: float, eps: float,
                        slab_u: int, slab_i: int, u_sent: int,
                        tw_u: int, tw_i: int):
    """Q/P-STREAMED variant of _rows_kernel: NO table residency.

    Both concatenated tables and their Adam moments stay in HBM
    (aliased in/out buffers) and are walked in SLABS twice per step —
    a gather pass accumulating each plane's batch rows into VMEM row
    buffers, and a scatter+Adam pass applying that step's dense slab
    updates in place.  Only the dense params (+ moments) and the
    [B, tw] row/grad buffers are VMEM-resident, so the protocol keeps
    a fused path at catalogs whose state overflows VMEM outright
    (Epinions-scale social models — VERDICT round-2 task 6).

    Semantics are IDENTICAL to _rows_kernel (same per-step grads, same
    dense Adam on every table row every step) — pinned by the
    fused-vs-streamed oracle in tests/test_fused_train.py.

    Ref layout: P id-plane streams, nf float streams, 6 HBM state
    inputs (pu, qi, mpu, mqi, vpu, vqi — aliased to the first 6
    outputs), 3*nd dense HBM inputs; outputs: the 6 aliased ANY state
    buffers, 3*nd resident dense (VMEM), the per-step loss vector;
    scratch: P row/grad buffers, nd dense-grad buffers, 4 u-side +
    4 i-side slab buffers, one DMA semaphore array."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = len(sides)
    plane_refs = refs[:P]
    float_refs = refs[P:P + nf]
    rest = refs[P + nf:]
    dense_hbm = rest[6:6 + 3 * nd]            # the 6 state ins are unused
    outs = rest[6 + 3 * nd:]                  # (read through the aliases)
    state_o = outs[:6]                        # pu, qi, mpu, mqi, vpu, vqi
    dense_res = outs[6:6 + 3 * nd]
    loss_ref = outs[6 + 3 * nd]
    scratch = outs[6 + 3 * nd + 1:]
    rowbufs = scratch[:P]
    dgs = scratch[P:P + nd]
    u_slabs = scratch[P + nd:P + nd + 4]      # p/m/v/g slab buffers
    i_slabs = scratch[P + nd + 4:P + nd + 8]
    sem = scratch[-1]

    s = pl.program_id(0)
    n_rb = plane_refs[0].shape[1]
    nsu = state_o[0].shape[0] // slab_u
    nsi = state_o[1].shape[0] // slab_i
    u_planes = tuple(p for p in range(P) if sides[p] == "u")
    i_planes = tuple(p for p in range(P) if sides[p] == "i")

    @pl.when(s == 0)
    def _load_dense():
        if nd:
            _load_resident(tuple(zip(dense_hbm, dense_res)), sem)

    for rb in rowbufs:
        rb[...] = jnp.zeros_like(rb)
    for g in dgs:
        g[...] = jnp.zeros_like(g)

    def plane_ids(p, kb):
        return plane_refs[p][0, pl.ds(kb, 1), :]

    # -- gather pass: accumulate each plane's rows across slabs ----------
    # The streamed tables carry a 128-aligned physical width (Mosaic
    # DMA alignment); all MXU work is sliced to the LOGICAL width —
    # the padded columns would double the one-hot matmul FLOPs.
    def gather_side(n_slabs, slab, tw, state_ref, slab_buf, planes_list):
        if not planes_list:
            return

        def slab_body(si, _):
            cp = pltpu.make_async_copy(
                state_ref.at[pl.ds(si * slab, slab)], slab_buf, sem.at[0])
            cp.start()
            cp.wait()
            rows_v = slab_buf[...][:, :tw]

            def blk_body(kb, _):
                for p in planes_list:
                    oh = _onehot_t(plane_ids(p, kb) - si * slab, slab, blk)
                    rowbufs[p][pl.ds(kb * blk, blk), :] += jax.lax.dot_general(
                        oh, rows_v, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return 0

            jax.lax.fori_loop(0, n_rb, blk_body, 0)
            return 0

        jax.lax.fori_loop(0, n_slabs, slab_body, 0)

    gather_side(nsu, slab_u, tw_u, state_o[0], u_slabs[0], u_planes)
    gather_side(nsi, slab_i, tw_i, state_o[1], i_slabs[0], i_planes)

    # -- loss + in-kernel AD pass; row buffers become grad buffers -------
    eye = _onehot_t(jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1),
                    blk, blk)
    ones_b = jnp.ones((blk, 1), jnp.float32)
    lane2col = lambda v_t: jax.lax.dot_general(  # noqa: E731
        eye * v_t, ones_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    def loss_block(kb, loss):
        row = pl.ds(kb, 1)
        w_c = lane2col(
            (plane_refs[0][0, row, :] != u_sent).astype(jnp.float32))
        floats = tuple(lane2col(float_refs[f][0, row, :])
                       for f in range(nf))
        rows = tuple(rowbufs[p][pl.ds(kb * blk, blk), :] for p in range(P))
        dense_vals = tuple(r[...] for r in dense_res[:nd])
        lval, (g_rows, g_dv) = jax.value_and_grad(
            row_loss, argnums=(0, 2))(rows, floats, dense_vals, w_c)
        for p in range(P):
            rowbufs[p][pl.ds(kb * blk, blk), :] = g_rows[p]
        for k in range(nd):
            dgs[k][...] += g_dv[k]
        return loss + lval

    loss_ref[s] = jax.lax.fori_loop(0, n_rb, loss_block, 0.0)

    # -- scatter + dense slab Adam pass ----------------------------------
    bc1, bc2 = _adam_step(t0_ref, s, b1, b2)

    def scatter_side(n_slabs, slab, tw, p_o, m_o, v_o, bufs, planes_list):
        p_s, m_s, v_s, g_s = bufs
        padw = p_s.shape[1] - tw

        def slab_body(si, _):
            cps = tuple(
                pltpu.make_async_copy(ref.at[pl.ds(si * slab, slab)], sb,
                                      sem.at[k])
                for k, (ref, sb) in enumerate(
                    ((p_o, p_s), (m_o, m_s), (v_o, v_s))))
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

            def blk_body(kb, g):
                for p in planes_list:
                    oh = _onehot_t(plane_ids(p, kb) - si * slab, slab, blk)
                    g = g + jnp.dot(
                        oh, rowbufs[p][pl.ds(kb * blk, blk), :],
                        preferred_element_type=jnp.float32)
                return g

            g = jax.lax.fori_loop(0, n_rb, blk_body,
                                  jnp.zeros((slab, tw), jnp.float32))
            if padw:
                g = jnp.concatenate(
                    [g, jnp.zeros((slab, padw), jnp.float32)], axis=1)
            g_s[...] = g
            _adam_apply(p_s, m_s, v_s, g_s[...], bc1, bc2,
                        lr=lr, b1=b1, b2=b2, eps=eps)
            backs = tuple(
                pltpu.make_async_copy(sb, ref.at[pl.ds(si * slab, slab)],
                                      sem.at[k])
                for k, (ref, sb) in enumerate(
                    ((p_o, p_s), (m_o, m_s), (v_o, v_s))))
            for cp in backs:
                cp.start()
            for cp in backs:
                cp.wait()
            return 0

        jax.lax.fori_loop(0, n_slabs, slab_body, 0)

    scatter_side(nsu, slab_u, tw_u, state_o[0], state_o[2], state_o[4],
                 u_slabs, u_planes)
    scatter_side(nsi, slab_i, tw_i, state_o[1], state_o[3], state_o[5],
                 i_slabs, i_planes)
    for k in range(nd):
        _adam_apply(dense_res[k], dense_res[nd + k], dense_res[2 * nd + k],
                    dgs[k][...], bc1, bc2, lr=lr, b1=b1, b2=b2, eps=eps)


@functools.partial(jax.jit, static_argnames=(
    "sides", "row_loss", "lr", "b1", "b2", "eps", "blk", "slab_u",
    "slab_i", "interpret"))
def fused_rows_epoch_stream(pu, qi, dense, mpu, mqi, mdense, vpu, vqi,
                            vdense, planes, floats, t0, *, sides: tuple,
                            row_loss, lr: float, b1: float = 0.9,
                            b2: float = 0.999, eps: float = 1e-8,
                            blk: int = 256, slab_u: int = 1024,
                            slab_i: int = 1024, interpret: bool = False):
    """fused_rows_epoch with NO residency requirement: tables + moments
    stay in HBM (aliased in/out) and stream through VMEM in slabs twice
    per step.  Same signature/semantics as fused_rows_epoch; extra
    ``slab_u``/``slab_i`` pick the slab heights (plan_fused_rows_stream).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps, b = planes[0].shape
    u_real, tw_u = pu.shape
    i_real, tw_i = qi.shape
    u_pad, i_pad = sentinel_dims(u_real, i_real)
    u_sent, i_sent = u_pad - 1, i_pad - 1     # trainer's sentinel ids
    u_pad_s = _round_up(u_pad, slab_u)
    i_pad_s = _round_up(i_pad, slab_i)
    # Mosaic requires lane-aligned DMA slices: the streamed tables carry
    # a 128-multiple feature width (zero columns; their Adam state stays
    # exactly zero), sliced back on return.
    tw_u_p, tw_i_p = _round_up(tw_u, 128), _round_up(tw_i, 128)
    nd, nf = len(dense), len(floats)
    d_shapes = tuple(x.shape for x in dense)
    lift = lambda x: x.reshape((1, -1)) if x.ndim < 2 else x  # noqa: E731
    dense, mdense, vdense = (tuple(lift(x) for x in t)
                             for t in (dense, mdense, vdense))
    pads = lambda a, n, w: jnp.pad(  # noqa: E731
        a, ((0, n - a.shape[0]), (0, w - a.shape[1])))
    pu, mpu, vpu = (pads(x, u_pad_s, tw_u_p) for x in (pu, mpu, vpu))
    qi, mqi, vqi = (pads(x, i_pad_s, tw_i_p) for x in (qi, mqi, vqi))
    padb = (_round_up(b, blk) - b) if b % blk else 0
    if padb:
        planes = tuple(
            jnp.pad(a, ((0, 0), (0, padb)),
                    constant_values=(u_sent if sd == "u" else i_sent))
            for a, sd in zip(planes, sides))
        floats = tuple(jnp.pad(a, ((0, 0), (0, padb))) for a in floats)
        b = b + padb
    planes = tuple(a.reshape(steps, b // blk, blk) for a in planes)
    floats = tuple(a.reshape(steps, b // blk, blk) for a in floats)

    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda s: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    idx = pl.BlockSpec((1, b // blk, blk), lambda s: (s, 0, 0),
                       memory_space=pltpu.VMEM)

    state = (pu, qi, mpu, mqi, vpu, vqi)
    dense_arrs = dense + mdense + vdense
    d_shapes2 = tuple(a.shape for a in dense_arrs)
    n_lead = 1 + len(planes) + len(floats)
    # Row buffers keep the LOGICAL width (in-VMEM loads/stores need no
    # lane alignment; only the HBM DMA slices do).
    tw_of = lambda sd: tw_u if sd == "u" else tw_i  # noqa: E731

    outs = pl.pallas_call(
        functools.partial(_rows_stream_kernel, blk=blk, sides=sides,
                          nf=nf, nd=nd, row_loss=row_loss, lr=lr,
                          b1=b1, b2=b2, eps=eps, slab_u=slab_u,
                          slab_i=slab_i, u_sent=u_sent,
                          tw_u=tw_u, tw_i=tw_i),
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]    # t0
        + [idx] * (len(planes) + len(floats))
        + [hbm] * (6 + 3 * nd),
        out_specs=tuple([hbm] * 6)
        + tuple(full(sh) for sh in d_shapes2)
        + (pl.BlockSpec(memory_space=pltpu.SMEM),),         # loss
        out_shape=tuple(jax.ShapeDtypeStruct(a.shape, jnp.float32)
                        for a in state)
        + tuple(jax.ShapeDtypeStruct(sh, jnp.float32) for sh in d_shapes2)
        + (jax.ShapeDtypeStruct((steps,), jnp.float32),),
        scratch_shapes=[pltpu.VMEM((b, tw_of(sd)), jnp.float32)
                        for sd in sides]                    # row/grad bufs
        + [pltpu.VMEM(sh, jnp.float32) for sh in d_shapes2[:nd]]
        + [pltpu.VMEM((slab_u, tw_u_p), jnp.float32)] * 4
        + [pltpu.VMEM((slab_i, tw_i_p), jnp.float32)] * 4
        + [pltpu.SemaphoreType.DMA((max(3 * nd, 6),))],
        input_output_aliases={n_lead + k: k for k in range(6)},
        interpret=interpret,
    )(jnp.asarray([t0], jnp.int32), *planes, *floats, *state,
      *dense_arrs)

    unlift = lambda t: tuple(  # noqa: E731
        x.reshape(sh) for x, sh in zip(t, d_shapes))
    pu_o, qi_o, mpu_o, mqi_o, vpu_o, vqi_o = outs[:6]
    dense_o = unlift(outs[6:6 + nd])
    mdense_o = unlift(outs[6 + nd:6 + 2 * nd])
    vdense_o = unlift(outs[6 + 2 * nd:6 + 3 * nd])
    return (pu_o[:u_real, :tw_u], qi_o[:i_real, :tw_i], dense_o,
            mpu_o[:u_real, :tw_u], mqi_o[:i_real, :tw_i], mdense_o,
            vpu_o[:u_real, :tw_u], vqi_o[:i_real, :tw_i], vdense_o,
            jnp.sum(outs[-1]))


def plan_fused_rows_stream(u_real: int, i_real: int, tw_u: int,
                           tw_i: int, dense_elems: int, b: int,
                           n_u_planes: int, n_i_planes: int, nf: int):
    """Plan for the STREAMED multi-plane epoch (no residency): returns
    (blk, slab_u, slab_i) or None.  The budget is dominated by the
    [B, tw] row/grad buffers (physically >= 128 lanes each); slabs and
    one-hot temporaries scale with the chosen slab heights."""
    limit = int(15 * 2 ** 20)
    lanes_u = max(tw_u, 128)
    lanes_i = max(tw_i, 128)
    for blk in (256, 128):
        b_pad = _round_up(b, blk)
        rowbufs = 4 * b_pad * (n_u_planes * lanes_u + n_i_planes * lanes_i)
        idx = 2 * (n_u_planes + n_i_planes + nf) * 4 * (
            b_pad // blk) * max(blk, 128)
        dense = 3 * 4 * dense_elems
        for slab in (2048, 1024, 512, 256):
            slabs = 4 * 4 * slab * (lanes_u + lanes_i)
            oh = 2 * 4 * slab * max(blk, 128)
            if rowbufs + idx + dense + slabs + oh < limit:
                return blk, slab, slab
    return None


def plan_fused_mlp_grouped(u_real: int, i_real: int, tw_u: int,
                           tw_i: int, dense_elems: int, b: int,
                           act_cols: int, force_g: int | None = None):
    """Grouped plan for the generic pointwise (NeuMF/MLP) fused epoch:
    when plan_fused_mlp returns None, split users into G mass-balanced
    groups and run one fused_mlp_epoch launch per group with only that
    PU-slice (+ moments) resident; the item-side concat table and every
    dense tower param stay fully resident and get dense Adam every
    step.  Same user-axis block-coordinate semantics as
    plan_fused_grouped.  Returns (n_groups, group_rows, blk) or None."""
    limit = int(15.5 * 2 ** 20)
    for g in ((force_g,) if force_g
              else (2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)):
        rows = _round_up(cdiv(u_real, g), 128)
        u_pad, i_pad = sentinel_dims(rows, i_real)
        state = 4 * 4 * (u_pad * tw_u + i_pad * tw_i + dense_elems)
        # XLA pins the per-group slice temporaries next to the kernel
        # (see grouped_blk's calibration note).
        slices = 8 * 4 * tw_u * rows
        for blk in (256, 128):
            lanes = max(blk, 128)
            onehots = 4 * lanes * (u_pad + i_pad)
            idx = 2 * 2 * 4 * (_round_up(b, blk) // blk) * lanes
            acts = 4 * lanes * act_cols * 3
            if state + slices + onehots + idx + acts < limit:
                return g, rows, blk
    return None


def _cml_kernel(t0_ref, gstats_ref, u_ref, i_ref, n_ref, frozen_ref,
                hbm_p, hbm_q, hbm_mp, hbm_vp, hbm_mq, hbm_vq,
                p_ref, q_ref, mp_ref, vp_ref, mq_ref, vq_ref, loss_ref,
                dp_ref, dq_ref, sem,
                *, steps: int, blk: int, K: int, lr: float, reg: float,
                margin: float, item_nums: int, i_real: int,
                b1: float, b2: float, eps: float):
    """CML (metric-learning hinge) epoch kernel body.

    Distances to ALL K negatives come from ONE score matrix instead of
    K gather matmuls run twice: with S_t = Q @ peT ([i_pad, blk]) and
    the norm expansion ||pe - q_c||^2 = ||q_c||^2 - 2*S_t + ||pe||^2,
    the full distance matrix D_t costs a single MXU matmul.  The K
    negative ids per pair become a MULTIPLICITY mask M_t (sum of K
    transposed one-hots — VPU compares, no matmuls), and the WARP
    imposter count / min-negative-distance / argmin selection are all
    sublane reductions over D_t masked by M_t.  Everything lives in the
    TRANSPOSED orientation (items on sublanes, pairs on lanes), so the
    argmin one-hot is born scatter-ready and no cross-lane transpose is
    ever needed; the two [1, blk] <-> [blk, 1] moves (pair distance
    d_ui, WARP coefficient) are tiny MXU mat-vecs against ones.  Per
    block: 7 table-sized matmuls vs 3K+4 for the two-pass gather form
    (4.9x fewer MXU flops at the reference K=10).

    The WARP weight log(rank+1) is gradient-dead (the imposter mask is
    boolean, models/metric.py:66-70).  Argmin ties across DISTINCT
    equal-distance items resolve to the lowest item id (the two-pass
    form picked the first sample slot) — gradient-equivalent for the
    measure-one case of duplicate sampled ids.  The covariance
    regularizer (CML.py:63-70) is applied as its closed-form DENSE
    per-step gradient over the resident tables, masked to real rows so
    sentinel rows stay identically zero:

        grad[r, :] = reg * (2/n) * (rowsum(xc)[r] - xc[r, :])
        loss       = reg * (sum_r rowsum(xc)[r]^2 - ||xc||_F^2) / n

    (xc = concat(Q, P) column-centered over the n = U + I real rows;
    the column sums of xc vanish, which kills the mean-chain term.)
    Sentinel rows cost margin*log(item_nums/K + 1) each in the loss sum
    (all-zero embeddings -> slack = margin, all K imposters) and are
    subtracted statically by the caller.

    GROUPED launches (user-axis block-coordinate, fused_cml_epoch's
    ``frozen`` arg): the covariance population spans ALL real users,
    so frozen (out-of-group) P rows enter through closed-form partial
    sums — gstats = [u_real_in_slice, n_out, sum_a, sum_a2, sum_sq]
    (a = per-row sums of x, sq = ||x||^2) and frozen_ref row 0 = the
    frozen rows' column sums.  mu is then the exact global mean and the
    frozen rows' loss terms expand around it; their own gradients are
    NOT applied while frozen (block-coordinate semantics, pinned by the
    grouped oracle test).  The mean-chain term still vanishes: the
    all-rows sums it contracts against are zero whether or not every
    row is resident.  Ungrouped callers pass zero stats — all frozen
    terms vanish identically and gstats[0] == u_real."""
    import jax.experimental.pallas as pl

    s = pl.program_id(0)
    u_pad, d = p_ref.shape
    i_pad, _ = q_ref.shape
    n_rb = u_ref.shape[1]              # idx blocks are [1, B//blk, blk]
    ur_dyn = gstats_ref[0]             # real rows in the resident slice
    n_out = gstats_ref[1]
    n_rows = ur_dyn + float(i_real) + n_out

    @pl.when(s == 0)
    def _load_state():
        _load_resident(((hbm_p, p_ref), (hbm_q, q_ref), (hbm_mp, mp_ref),
                        (hbm_vp, vp_ref), (hbm_mq, mq_ref),
                        (hbm_vq, vq_ref)), sem)

    dp_ref[...] = jnp.zeros_like(dp_ref)
    dq_ref[...] = jnp.zeros_like(dq_ref)
    onehot_t = lambda ids_row, n_r: _onehot_t(ids_row, n_r, blk)  # noqa: E731
    gather = _mxu_gather
    ones_d = jnp.ones((1, d), jnp.float32)
    # The distance/mask phase walks the item axis in SLABS so its live
    # buffers are [slab, blk], not [i_pad, blk] — at a 3.5k-item catalog
    # the full-width working set (distance matrix, multiplicity mask,
    # compare temporaries, ~10 buffers as compiled) measured 22MB of
    # scoped VMEM and OOM'd.  slab = the largest 128-multiple divisor of
    # i_pad <= 1152 (single slab for small catalogs = the original
    # layout).  Two-level min keeps the argmin semantics: an earlier
    # slab wins exact ties, i.e. the lowest item id, as before.
    # Single-slab bound 1792 = the largest full-width catalog validated
    # on hardware (ml-100k); the extrapolated working set at 2048 is
    # over the scoped limit even though the planner model passes it.
    # Callers guarantee a slab divisor >= 512 exists (cml_table_pad
    # pads the table height otherwise — e.g. i_pad = 17*128 has no
    # usable divisor and would degenerate to 17 tiny slabs).
    if i_pad <= 1792:
        slab = i_pad
    else:
        m = i_pad // 128
        slab = 128 * max(kd for kd in range(1, m + 1)
                         if m % kd == 0 and kd * 128 <= 1152)
    n_slab = i_pad // slab
    iota_slab0 = jax.lax.broadcasted_iota(jnp.int32, (slab, blk), 0)
    ones_slab = jnp.ones((slab, 1), jnp.float32)

    def block(kb, loss):
        row = pl.ds(kb, 1)              # dynamic sublane, static lanes
        oh_u = onehot_t(u_ref[0, row, :], u_pad)
        oh_i = onehot_t(i_ref[0, row, :], i_pad)
        pe = gather(oh_u, p_ref)                        # [blk, d]
        qi = gather(oh_i, q_ref)
        diff_ui = pe - qi
        # Direct-form pair distance, lane-oriented: [1, blk].
        d_ui_t = jax.lax.dot_general(
            ones_d, diff_ui * diff_ui, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        pe2_t = jax.lax.dot_general(
            ones_d, pe * pe, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [1, blk]

        def slab_pass(si, carry):
            d_min_t, cnt_t, sel_row_t = carry
            s0 = si * slab
            # Score slab Q[s0:s0+slab] @ peT -> expanded distances.
            # (Slab norms recomputed from the ref slice: Mosaic has no
            # dynamic_slice on VALUES, and the VPU cost is negligible.)
            q_slab = q_ref[pl.ds(s0, slab), :]
            s_t = jax.lax.dot_general(
                q_slab, pe, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # [slab, blk]
            dist = (jnp.sum(q_slab * q_slab, axis=1, keepdims=True)
                    - 2.0 * s_t + pe2_t)
            iota_s = iota_slab0 + s0

            def accum_mask(k, m):
                # Negative plane k occupies sublane rows k*n_rb .. of
                # the [1, K*n_rb, blk] stream.
                ids = n_ref[0, pl.ds(k * n_rb + kb, 1), :]
                return m + (iota_s == jnp.broadcast_to(
                    ids, (slab, blk))).astype(jnp.float32)

            mult = jax.lax.fori_loop(
                0, K, accum_mask, jnp.zeros((slab, blk), jnp.float32))
            hit = mult > 0.0
            cond = (d_ui_t + margin - dist > 0).astype(jnp.float32)
            cnt_t = cnt_t + jnp.sum(mult * cond, axis=0, keepdims=True)
            slab_min = jnp.min(jnp.where(hit, dist, 3e38), axis=0,
                               keepdims=True)           # [1, blk]
            eq = hit & (dist == slab_min)
            slab_sel = jnp.min(jnp.where(eq, iota_s, i_pad), axis=0,
                               keepdims=True)
            better = slab_min < d_min_t     # strict: earlier slab (and
            sel_row_t = jnp.where(better, slab_sel, sel_row_t)  # lowest
            return (jnp.minimum(d_min_t, slab_min), cnt_t,      # id) wins
                    sel_row_t)

        d_min_t, cnt_t, sel_row_t = jax.lax.fori_loop(
            0, n_slab, slab_pass,
            (jnp.full((1, blk), 3e38, jnp.float32),
             jnp.zeros((1, blk), jnp.float32),
             jnp.full((1, blk), i_pad, jnp.int32)))
        # WARP weight, reference formula as written (CML.py:50-53).
        rank_t = cnt_t / K * item_nums / K
        wlog_t = jnp.log(rank_t + 1.0)
        slack_t = d_ui_t + margin - d_min_t
        coef_t = wlog_t * (slack_t > 0).astype(jnp.float32)  # [1, blk]
        loss = loss + jnp.sum(wlog_t * jnp.maximum(slack_t, 0.0))

        # Argmin gather + coefficient column, slab by slab (a full-width
        # [i_pad, blk] argmin one-hot was part of the 17MB VMEM OOM; a
        # slab one-hot is rebuilt per pass — VPU compares, no storage).
        def slab_sel(si, carry):
            q_sel, coef_c = carry
            s0 = si * slab
            oh_s = ((iota_slab0 + s0) == sel_row_t).astype(jnp.float32)
            q_sel = q_sel + gather(oh_s, q_ref[pl.ds(s0, slab), :])
            coef_c = coef_c + jax.lax.dot_general(
                oh_s * coef_t, ones_slab, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return q_sel, coef_c

        q_sel, coef_c = jax.lax.fori_loop(
            0, n_slab, slab_sel,
            (jnp.zeros((blk, d), jnp.float32),
             jnp.zeros((blk, 1), jnp.float32)))

        d_pe = 2.0 * coef_c * (q_sel - qi)
        d_qi = -2.0 * coef_c * diff_ui
        d_qsel = (2.0 * coef_c) * (pe - q_sel)

        def slab_scatter(si, _):
            s0 = si * slab
            oh_s = ((iota_slab0 + s0) == sel_row_t).astype(jnp.float32)
            dq_ref[pl.ds(s0, slab), :] += jnp.dot(
                oh_s, d_qsel, preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, n_slab, slab_scatter, 0)
        dp_ref[...] += jnp.dot(oh_u, d_pe,
                               preferred_element_type=jnp.float32)
        dq_ref[...] += jnp.dot(oh_i, d_qi,
                               preferred_element_type=jnp.float32)
        return loss

    loss = jax.lax.fori_loop(0, n_rb, block, 0.0)

    # -- dense covariance-regularizer gradient + loss, masked to real
    # rows.  The Q side walks the item axis in SLABS: doing the xc /
    # rowsum / gradient / Adam chain over the full [i_pad, d] table kept
    # ~5 full-width temporaries live and pushed the grouped ml-1m launch
    # past the 16MB scoped-VMEM limit.  P (the per-group slice) stays
    # whole — it is the small axis by construction.
    mask_p = (jax.lax.broadcasted_iota(jnp.int32, (u_pad, 1), 0)
              .astype(jnp.float32) < ur_dyn).astype(jnp.float32)
    frozen_sum = frozen_ref[0:1, :]                      # [1, d]
    # The elementwise chain reuses the hinge phase's slab width (one
    # pass for small catalogs).
    iota_cs = jax.lax.broadcasted_iota(jnp.int32, (slab, 1), 0)

    def qsum_pass(si, acc):
        mq_mask = ((iota_cs + si * slab) < i_real).astype(jnp.float32)
        return acc + jnp.sum(q_ref[pl.ds(si * slab, slab), :] * mq_mask,
                             axis=0, keepdims=True)

    q_colsum = jax.lax.fori_loop(0, n_slab, qsum_pass,
                                 jnp.zeros((1, d), jnp.float32))
    mu = (jnp.sum(p_ref[...] * mask_p, axis=0, keepdims=True)
          + q_colsum + frozen_sum) / n_rows
    xc_p = (p_ref[...] - mu) * mask_p
    s_p = jnp.sum(xc_p, axis=1, keepdims=True)
    # Frozen rows' terms around the global mean: sum_r (a_r - ms)^2 and
    # sum_r ||x_r - mu||^2 from the carried scalars (zero when ungrouped).
    ms = jnp.sum(mu)
    frozen_s2 = gstats_ref[3] - 2.0 * ms * gstats_ref[2] + n_out * ms * ms
    frozen_xc2 = (gstats_ref[4] - 2.0 * jnp.sum(frozen_sum * mu)
                  + n_out * jnp.sum(mu * mu))
    g_cov = 2.0 * reg / n_rows
    bc1, bc2 = _adam_step(t0_ref, s, b1, b2)

    def q_chain(si, acc):
        s2_acc, xc2_acc = acc
        sl = pl.ds(si * slab, slab)
        mq_mask = ((iota_cs + si * slab) < i_real).astype(jnp.float32)
        xc = (q_ref[sl, :] - mu) * mq_mask
        s_r = jnp.sum(xc, axis=1, keepdims=True)
        s2_acc = s2_acc + jnp.sum(s_r * s_r)
        xc2_acc = xc2_acc + jnp.sum(xc * xc)
        g = dq_ref[sl, :] + g_cov * (s_r - xc) * mq_mask
        m = b1 * mq_ref[sl, :] + (1.0 - b1) * g
        v = b2 * vq_ref[sl, :] + (1.0 - b2) * (g * g)
        mq_ref[sl, :] = m
        vq_ref[sl, :] = v
        q_ref[sl, :] = q_ref[sl, :] - lr * (m / bc1) / (
            jnp.sqrt(v / bc2) + eps)
        return s2_acc, xc2_acc

    q_s2, q_xc2 = jax.lax.fori_loop(0, n_slab, q_chain, (0.0, 0.0))
    loss = loss + reg * ((jnp.sum(s_p * s_p) + q_s2 + frozen_s2)
                         - (jnp.sum(xc_p * xc_p) + q_xc2
                            + frozen_xc2)) / n_rows
    loss_ref[s] = loss                  # per-step; wrapper tree-sums
    g_p = dp_ref[...] + g_cov * (s_p - xc_p) * mask_p
    _adam_apply(p_ref, mp_ref, vp_ref, g_p, bc1, bc2,
                lr=lr, b1=b1, b2=b2, eps=eps)


def cml_table_pad(i_pad: int) -> int:
    """Item-table height the CML kernel wants: i_pad itself when a slab
    divisor >= 512 exists (or the catalog is single-slab), else the
    next 1024-multiple — the extra zero rows are never referenced by
    ids (the sentinel stays at i_pad-1) and are masked out of the
    covariance population, they just make the slab walk regular."""
    if i_pad <= 1792:
        return i_pad
    m = i_pad // 128
    best = max((kd for kd in range(1, m + 1)
                if m % kd == 0 and kd * 128 <= 1152), default=1)
    if best * 128 >= 512:
        return i_pad
    return _round_up(i_pad, 1024)


def cml_sentinel_bias(margin: float, item_nums: int,
                      neg_ratio: int) -> float:
    """Loss-sum contribution of one sentinel (invalid) row: slack is
    exactly ``margin`` and all K negatives are imposters, so the WARP
    weight is log(item_nums/K + 1)."""
    return margin * math.log(item_nums / neg_ratio + 1.0)


@functools.partial(jax.jit, static_argnames=(
    "lr", "reg", "margin", "item_nums", "b1", "b2", "eps", "blk",
    "interpret"))
def fused_cml_epoch(p, q, mp, vp, mq, vq, u_idx, i_idx, n_idx, t0,
                    *, lr: float, reg: float, margin: float,
                    item_nums: int, b1: float = 0.9, b2: float = 0.999,
                    eps: float = 1e-8, blk: int = 256,
                    interpret: bool = False, frozen=None):
    """One full CML training epoch in a single Pallas program — the
    metric-learning sibling of ``fused_bpr_epoch``.

    p/q: [U, d]/[I, d] tables; m*/v*: matching Adam moments; u_idx/i_idx:
    [steps, B] pre-sampled pair rows; n_idx: [steps, B, K] negatives
    (K = neg_ratio).  Invalid slots must already point at the sentinel
    ids U_pad-1 / I_pad-1 in ALL THREE index arrays.  ``item_nums`` is
    the REAL catalog size (the WARP rank formula uses it, not the padded
    table height).

    ``frozen`` (GROUPED launches): a tuple (u_real_in_slice, n_out,
    sum_a, sum_a2, sum_sq, frozen_sum[d]) of traced values describing
    the OUT-OF-GROUP real user rows, which enter the covariance
    regularizer through closed-form partial sums (see _cml_kernel).
    None = ungrouped: the whole table is resident and the stats are
    zeros.

    Returns (p, q, mp, vp, mq, vq, loss_total); loss_total still includes
    ``cml_sentinel_bias(...)`` per EPOCH-padding sentinel row (the B-pad
    rows this wrapper adds are subtracted here; callers subtract their
    own epoch-padding count)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps, b, K = n_idx.shape
    u_real, d = p.shape
    i_real, _ = q.shape
    u_pad, i_pad = sentinel_dims(u_real, i_real)
    # Sentinel ids stay < i_pad; the kernel table may be taller (zero
    # rows) so the slab walk has a regular width (cml_table_pad).
    i_kpad = cml_table_pad(i_pad)
    if frozen is None:
        gstats = jnp.asarray([float(u_real)] + [0.0] * 7, jnp.float32)
        frozen_row = jnp.zeros((8, d), jnp.float32)
    else:
        ur_dyn, n_out, sum_a, sum_a2, sum_sq, fsum = frozen
        gstats = jnp.stack([
            jnp.asarray(ur_dyn, jnp.float32),
            jnp.asarray(n_out, jnp.float32),
            jnp.asarray(sum_a, jnp.float32),
            jnp.asarray(sum_a2, jnp.float32),
            jnp.asarray(sum_sq, jnp.float32),
            jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32)])
        frozen_row = jnp.zeros((8, d), jnp.float32).at[0].set(fsum)
    pads = lambda a, n: jnp.pad(a, ((0, n - a.shape[0]), (0, 0)))  # noqa: E731
    p, mp, vp = (pads(x, u_pad) for x in (p, mp, vp))
    q, mq, vq = (pads(x, i_kpad) for x in (q, mq, vq))
    padb = (_round_up(b, blk) - b) if b % blk else 0
    if padb:
        u_idx = jnp.pad(u_idx, ((0, 0), (0, padb)),
                        constant_values=u_pad - 1)
        i_idx = jnp.pad(i_idx, ((0, 0), (0, padb)),
                        constant_values=i_pad - 1)
        n_idx = jnp.pad(n_idx, ((0, 0), (0, padb), (0, 0)),
                        constant_values=i_pad - 1)
        b = b + padb
    u_idx, i_idx = (a.reshape(steps, b // blk, blk)
                    for a in (u_idx, i_idx))
    # Negative plane k occupies sublane rows k*(b//blk) .. of a
    # [K*(b//blk), blk] tile, so the kernel reads row k*n_rb + kb.
    n_idx = n_idx.transpose(0, 2, 1).reshape(steps, K * (b // blk), blk)

    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda s: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    idx = pl.BlockSpec((1, b // blk, blk), lambda s: (s, 0, 0),
                       memory_space=pltpu.VMEM)
    idx_n = pl.BlockSpec((1, K * (b // blk), blk), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_cml_kernel, steps=steps, blk=blk, K=K,
                          lr=lr, reg=reg, margin=margin,
                          item_nums=item_nums,
                          i_real=i_real, b1=b1, b2=b2, eps=eps),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # t0
            pl.BlockSpec(memory_space=pltpu.SMEM),      # gstats
            idx, idx, idx_n,                            # u, i, negs
            full((8, d)),                               # frozen col sums
            hbm, hbm, hbm, hbm, hbm, hbm,               # initial state
        ],
        out_specs=(
            full((u_pad, d)), full((i_kpad, d)),
            full((u_pad, d)), full((u_pad, d)),
            full((i_kpad, d)), full((i_kpad, d)),
            pl.BlockSpec(memory_space=pltpu.SMEM),      # loss
        ),
        out_shape=(
            jax.ShapeDtypeStruct((u_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((i_kpad, d), jnp.float32),
            jax.ShapeDtypeStruct((u_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((u_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((i_kpad, d), jnp.float32),
            jax.ShapeDtypeStruct((i_kpad, d), jnp.float32),
            jax.ShapeDtypeStruct((steps,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((u_pad, d), jnp.float32),        # dP
            pltpu.VMEM((i_kpad, d), jnp.float32),       # dQ
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
    )(jnp.asarray([t0], jnp.int32), gstats, u_idx, i_idx, n_idx,
      frozen_row, p, q, mp, vp, mq, vq)
    p_o, q_o, mp_o, vp_o, mq_o, vq_o, loss = outs
    bias = cml_sentinel_bias(margin, item_nums, K)
    return (p_o[:u_real], q_o[:i_real], mp_o[:u_real], vp_o[:u_real],
            mq_o[:i_real], vq_o[:i_real],
            jnp.sum(loss) - steps * padb * bias)


def sentinel_dims(u_real: int, i_real: int) -> tuple[int, int]:
    """Padded table dims; the LAST padded row of each is the sentinel the
    sampler points invalid batch slots at (always > real ids)."""
    return _round_up(u_real + 1, 128), _round_up(i_real + 1, 128)


def vmem_footprint_bytes(u_real: int, i_real: int, d: int, b: int,
                         blk: int = 256, idx_planes: int = 3,
                         oh_items: int = 2, bf16: bool = False) -> int:
    """Rough VMEM bytes the fused epoch needs: 6 resident state arrays +
    dP/dQ scratch + the live [*, blk] block temporaries + streamed index
    rows (x2 buffers; ``idx_planes`` [steps, b]-shaped index streams —
    3 for BPR (u, i, j), 2 for GMF (uz, i), 2 + neg_ratio for CML).
    ``oh_items`` counts the simultaneously-live [i_pad, blk] f32 blocks:
    2 for BPR/GMF (item one-hots); for CML, 5 on single-slab catalogs
    (item one-hot, distance matrix, multiplicity mask, compare temps)
    and 3 past the single-slab bound, where the kernel walks the item
    axis in slabs and only the item one-hot stays full-width (the
    trainer picks the value)."""
    u_pad, i_pad = sentinel_dims(u_real, i_real)
    # bf16 storage halves the six resident state arrays and the live
    # one-hot blocks; the dP/dQ grad scratch stays f32 (accumulation).
    elem = 2 if bf16 else 4
    state = elem * d * (3 * u_pad + 3 * i_pad)
    scratch = 4 * d * (u_pad + i_pad)
    # One-hot buffers physically occupy >= 128 lanes (f32 (8, 128)
    # tiling) no matter how narrow blk is — accounting with raw blk=64
    # once under-planned an 18MB layout past the 16MB VMEM limit.
    # bf16's arithmetic digit construction keeps ~3 extra table-height
    # temporaries live per one-hot (broadcast digits + indicators):
    # calibrated against measured scoped allocations — ml-1m@64 bf16
    # really is 20.6MB (fails), ml-100k@256 and 3000x2500@64 compile.
    oh_mult = 4 if bf16 else 1
    onehots = oh_mult * elem * max(blk, 128) * (u_pad + oh_items * i_pad)
    # Index tiles are [b/blk, blk] int32 per plane, double-buffered by
    # the pipeline; like the one-hots they physically occupy >= 128
    # lanes per row regardless of blk (b is padded to a blk multiple).
    idx = 2 * idx_planes * 4 * (_round_up(b, blk) // blk) * max(blk, 128)
    # bf16 one-hot digit scratch (lo + hi iota tables, _onehot_t).
    iota = 2 * 2 * max(u_pad, i_pad) * 128 if bf16 else 0
    return state + scratch + onehots + idx + iota


FUSED_VMEM_BUDGET = 13 * 2 ** 20


def plan_fused(u_real: int, i_real: int, d: int, b: int,
               idx_planes: int = 3, oh_items: int = 2,
               bf16: bool = False):
    """Pick a block size that fits the VMEM budget, or None (caller
    falls back to the scan path).

    ``bf16=True`` plans bf16 STORAGE (tables + moments + one-hots in
    bf16, arithmetic f32, ``fused_bpr_epoch(table_dtype=bf16)``) —
    roughly doubling the resident table capacity.  The round-2 bf16
    attempt was rejected because its one-hots were derived from 32-bit
    lane structures, paying an (8,128)->(16,128) retile per block (35x
    slower); the storage variant builds them from an int16 iota so
    everything stays (16,128)-tiled, which also caps bf16 plans at
    table heights < 32768 (i16 ids).  No blk < 128 rung: the one-hot
    and index buffers physically occupy >= 128 lanes regardless, so
    blk=64 has blk=128's footprint at half the MXU lane utilization."""
    if bf16 and max(sentinel_dims(u_real, i_real)) >= (1 << 15):
        return None
    for blk in (256, 128):
        if vmem_footprint_bytes(u_real, i_real, d, b, blk, idx_planes,
                                oh_items, bf16=bf16) < FUSED_VMEM_BUDGET:
            return blk
    return None


def grouped_blk(rows: int, i_real: int, d: int, b: int,
                idx_planes: int = 3, oh_items: int = 2):
    """Block size for ONE grouped launch, or None if no block fits.

    XLA's scoped-vmem allocator pins the [rows, d] per-group slice
    temporaries (dynamic-sliced inputs, kernel outputs, update copies)
    next to the kernel, so the real budget is kernel footprint +
    8*rows*d*4 against the 16MB scoped limit (15.5MB here for margin).
    The multiplier is calibrated to measured compiles of the
    scan-over-groups epoch: a rows=4096/blk=128 probe reported 16.86MB
    scoped (= kernel 8.46MB + 8.0x rows*d*4) and OOM'd; ml-1m
    (4, 1536, 128) and a 98k-user run compiled and ran.  The FULL
    padded [G*rows, d] arrays are never pinned — an earlier per-buffer
    charge wrongly blocked mid-size tables from the grouped path."""
    limit = int(15.5 * 2 ** 20)
    slices = 8 * 4 * d * rows
    for blk in (256, 128):
        if (vmem_footprint_bytes(rows, i_real, d, b, blk, idx_planes,
                                 oh_items)
                + slices < limit):
            return blk
    return None


def plan_fused_grouped(u_real: int, i_real: int, d: int, b: int,
                       idx_planes: int = 3, force_g: int | None = None,
                       oh_items: int = 2):
    """Plan for the GROUPED fused epoch (user-axis block-coordinate):
    when the full user table + moments overflow VMEM (plan_fused None),
    split users into G pair-mass-balanced groups of ``group_rows`` rows
    each and run one kernel launch per group with only that P-slice
    resident (items + their moments stay fully resident, so Q must
    still fit — see ``grouped_blk`` for the per-launch VMEM model).

    Returns (n_groups, group_rows, blk) or None.  Callers should try
    plan_fused first — G=1 belongs to the ungrouped path."""
    # Program size is G-independent (the trainer scans over groups), so
    # deep rungs only cost per-launch runtime overhead.  ``force_g``
    # (the train.fused_groups hook) plans that exact group count or
    # fails — keeping the rows formula in ONE place.
    for g in ((force_g,) if force_g
              else (2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)):
        rows = _round_up(cdiv(u_real, g), 128)
        blk = grouped_blk(rows, i_real, d, b, idx_planes, oh_items)
        if blk is not None:
            return g, rows, blk
    return None
