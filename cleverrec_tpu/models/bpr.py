"""BPR: Bayesian Personalized Ranking (UAI'09).

Math parity with the reference (model/ranking/BPR.py:33-51):
score(u, i) = <P[u], Q[i]>;   loss = get_loss(ui - uj) +
reg * (l2(u_emb) + l2(i_emb) + l2(j_emb)) over the batch gathers;
full-catalog prediction = U_batch @ Q^T.
"""

from __future__ import annotations

import jax.numpy as jnp

from cleverrec_tpu.common import l2_loss, pairwise_loss
from cleverrec_tpu.models.base import Aux, Params, RecModel


class BPR(RecModel):
    name = "BPR"
    sampler = "pairwise"
    # Exact {P, Q} dot-product pairwise form: eligible for the
    # VMEM-resident fused epoch kernel (ops/pallas_train.py).
    fused_protocol = "pairwise_bpr"

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "reg")
        self.embed_size = cfg.int("embed_size")
        self.reg = cfg.float("reg")
        self._fused_spec = None

    def init(self, key) -> Params:
        P, Q = self._embed_tables(
            key,
            (self.meta.user_nums, self.embed_size),
            (self.meta.item_nums, self.embed_size),
        )
        return {"P": P, "Q": Q}

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        ue = params["P"][batch["u"]] * w[:, None]
        ie = params["Q"][batch["i"]] * w[:, None]
        je = params["Q"][batch["j"]] * w[:, None]
        diff = jnp.sum(ue * ie, axis=1) - jnp.sum(ue * je, axis=1)
        main = pairwise_loss(self.loss_func, diff, weight=w)
        return main + self.reg * (l2_loss(ue) + l2_loss(ie) + l2_loss(je))

    def fused_rows_spec(self):
        """Spec for the sparse-rows (lazy row-Adam) scan tier: BPR.loss
        verbatim over gathered P[u]/Q rows, so only the touched rows'
        params/moments move per step.  OPT-IN for this protocol
        (train.sparse_rows_force) — the measured A/B at catalog scale
        (benchmarks/bpr_sparse_probe.py: 319k items, embed 64, batch
        6144) has the sparse tier LOSING to scan 4635 vs 4121 ms/epoch,
        unlike the rows protocols where it wins (EPINIONS_RUNS.jsonl);
        kept as the capability + numerics pin
        (tests/test_sparse_rows.py bpr oracle)."""
        if self._fused_spec is not None:
            return self._fused_spec
        reg, lf = self.reg, self.loss_func

        def pack(t):
            return (t["P"], t["Q"], ())

        def unpack(orig, pu, qi, dense):
            return {"P": pu, "Q": qi}

        def row_loss(rows, floats, dense, w):
            # Mirrors BPR.loss exactly, reference double-weighting quirk
            # included (rows scaled by w AND the loss weighted by w).
            ue, ie, je = (r * w for r in rows)
            diff = (jnp.sum(ue * ie, axis=1)
                    - jnp.sum(ue * je, axis=1))
            main = pairwise_loss(lf, diff, weight=w[:, 0])
            return main + reg * (l2_loss(ue) + l2_loss(ie) + l2_loss(je))

        self._fused_spec = {
            "planes": (("u", "u"), ("i", "i"), ("j", "i")),
            "floats": (), "dense": (),
            "pack": pack, "unpack": unpack, "row_loss": row_loss,
            "tw_u": self.embed_size, "tw_i": self.embed_size,
            "dense_elems": 0,
        }
        return self._fused_spec

    def score_pairs(self, params: Params, u, i, aux: Aux):
        return jnp.sum(params["P"][u] * params["Q"][i], axis=1)

    def score_all(self, params: Params, u, aux: Aux):
        return jnp.dot(params["P"][u], params["Q"].T,
                       preferred_element_type=jnp.float32)

    def dot_decomposition(self, params: Params, u, aux: Aux):
        """(user_vecs, item_table, item_bias|None) — enables the fused
        Pallas score+mask eval kernel (ops/pallas_scores.py)."""
        return params["P"][u], params["Q"], None
