"""Metric-learning models: CML, LRML, TransCF.

All three are ``cml_like``: score = squared distance, LOWER is better
(eval ranks ascending — RankingRecommender.py:222-225).

Math parity:
- CML (model/ranking/CML.py:40-78): per-pair K negatives, min-distance
  negative hinge, WARP weight log(rank+1) with
  rank = mean(imposters) * item_nums / neg_ratio (reproducing the
  reference's formula as written, :50-53), covariance regularizer over
  concat(Q, P) with zeroed diagonal (:63-70).  NOTE the reference's
  "unit clipping" never feeds back into training (it clips the *gathered*
  tensors after the optimizer op is built, :72-78) — its only observable
  effect is that full-catalog prediction uses row-clipped user embeddings
  (:85-87); we reproduce exactly that.
- LRML (model/ranking/LRML.py:42-75): memory attention
  r = softmax((p ⊙ q) K) M, d = ||p + r - q||^2, pairwise hinge with
  margin; its ``_unit_clipping`` is never invoked by build_model.
- TransCF (model/ranking/TransCF.py:41-88): neighborhood means via
  row-normalized incidence aggregation recomputed from the CURRENT
  tables every step, relation r = u_nbr ⊙ i_nbr, d = ||p + r - q||^2,
  hinge + neighborhood & distance regularizers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cleverrec_tpu.common import (clip_rows_by_norm, l2_loss,
                                  pairwise_loss)
from cleverrec_tpu.models.base import Aux, Params, RecModel
from cleverrec_tpu.models.modules import segment_mean_embeddings


class CML(RecModel):
    name = "CML"
    sampler = "cml"
    cml_like = True
    # VMEM-resident whole-epoch Pallas kernel (ops/pallas_train.py
    # fused_cml_epoch) when the tables fit and loss_func is hinge.
    fused_protocol = "cml_hinge"

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "reg", "margin")
        self.embed_size = cfg.int("embed_size")
        self.reg = cfg.float("reg")
        self.margin = cfg.float("margin")
        self.neg_ratio = cfg.neg_ratio

    def init(self, key) -> Params:
        P, Q = self._embed_tables(
            key,
            (self.meta.user_nums, self.embed_size),
            (self.meta.item_nums, self.embed_size))
        return {"P": P, "Q": Q}

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        ue = params["P"][batch["u"]]
        ie = params["Q"][batch["i"]]
        ne = params["Q"][batch["negs"]]                    # [B, K, d]
        d_ui = jnp.sum(jnp.square(ue - ie), axis=1)        # [B]
        d_un = jnp.sum(jnp.square(ue[:, None, :] - ne), axis=2)  # [B, K]
        d_min = jnp.min(d_un, axis=1)
        per_pair = jnp.maximum(d_ui + self.margin - d_min, 0.0)
        # WARP weight: rank estimated from the imposter fraction
        # (reference formula as written, CML.py:50-53).
        imposters = (d_ui[:, None] + self.margin - d_un) > 0
        rank = (jnp.mean(imposters.astype(jnp.float32), axis=1)
                * self.meta.item_nums / self.neg_ratio)
        per_pair = per_pair * jnp.log(rank + 1.0) * w
        # Covariance regularizer over the full concatenated tables.
        x = jnp.concatenate([params["Q"], params["P"]], axis=0)
        n_rows = x.shape[0]
        xc = x - jnp.mean(x, axis=0)
        cov = (xc.T @ xc) / n_rows
        cov_loss = self.reg * (jnp.sum(cov) - jnp.trace(cov))
        return jnp.sum(per_pair) + cov_loss

    def score_pairs(self, params: Params, u, i, aux: Aux):
        d = params["P"][u] - params["Q"][i]
        return jnp.sum(jnp.square(d), axis=1)

    def score_all(self, params: Params, u, aux: Aux):
        # Reference full-catalog path scores row-clipped user embeddings
        # against the raw item table (CML.py:72-87).
        ue = clip_rows_by_norm(params["P"][u])
        q = params["Q"]
        # ||u - q||^2 = |u|^2 - 2 u.q + |q|^2 — MXU for the cross term.
        cross = jnp.dot(ue, q.T, preferred_element_type=jnp.float32)
        return (jnp.sum(jnp.square(ue), axis=1, keepdims=True)
                - 2.0 * cross + jnp.sum(jnp.square(q), axis=1)[None, :])

    def dot_decomposition(self, params: Params, u, aux: Aux):
        """Distance as dot+bias (up to the ranking-irrelevant per-user
        ||u||^2 term): ||u - q||^2 - ||u||^2 = (-2u).q + ||q||^2 — enables
        the fused Pallas eval kernel for the metric-learning family."""
        ue = clip_rows_by_norm(params["P"][u])
        q = params["Q"]
        return -2.0 * ue, q, jnp.sum(jnp.square(q), axis=1)


class LRML(RecModel):
    name = "LRML"
    sampler = "pairwise"
    cml_like = True
    # Multi-plane fused epoch (ops/pallas_train.py fused_rows_epoch /
    # _stream): planes (u, i, j), memory network K/M as dense in-kernel
    # Adam params, hinge differentiated in-kernel.
    fused_protocol = "rows"

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "reg", "margin", "mem_size")
        self.embed_size = cfg.int("embed_size")
        self.mem_size = cfg.int("mem_size")
        self.reg = cfg.float("reg")
        self.margin = cfg.float("margin")
        self._fused_spec = None

    def init(self, key) -> Params:
        P, Q, K, M = self._embed_tables(
            key,
            (self.meta.user_nums, self.embed_size),
            (self.meta.item_nums, self.embed_size),
            (self.embed_size, self.mem_size),
            (self.mem_size, self.embed_size))
        return {"P": P, "Q": Q, "K": K, "M": M}

    def _relation(self, params, ue, ie):
        joint = ue * ie
        atten = jax.nn.softmax(joint @ params["K"], axis=-1)
        return atten @ params["M"]

    def _dist(self, params, ue, ie):
        r = self._relation(params, ue, ie)
        return jnp.sum(jnp.square(ue + r - ie), axis=-1)

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        ue = params["P"][batch["u"]]
        ie = params["Q"][batch["i"]]
        je = params["Q"][batch["j"]]
        diff = self._dist(params, ue, ie) - self._dist(params, ue, je)
        # Reference dispatches get_loss(self.loss_func, ...) (LRML.py:61).
        main = pairwise_loss(self.loss_func, diff, margin=self.margin,
                             weight=w)
        wc = w[:, None]
        return main + self.reg * (l2_loss(ue * wc) + l2_loss(ie * wc)
                                  + l2_loss(je * wc))

    def score_pairs(self, params: Params, u, i, aux: Aux):
        return self._dist(params, params["P"][u], params["Q"][i])

    def fused_rows_spec(self):
        """Spec for the multi-plane fused epoch: LRML.loss verbatim over
        gathered P[u]/Q[i]/Q[j] rows; the memory key/value matrices ride
        as dense in-kernel-Adam params (LRML.py:42-66 math)."""
        if self._fused_spec is not None:
            return self._fused_spec
        reg, margin, loss_func = self.reg, self.margin, self.loss_func

        def pack(t):
            return (t["P"], t["Q"], (t["K"], t["M"]))

        def unpack(orig, pu, qi, dense):
            return {"P": pu, "Q": qi, "K": dense[0], "M": dense[1]}

        def row_loss(rows, floats, dense, w):
            ue, ie, je = rows
            K, M = dense

            def dist(xe):
                atten = jax.nn.softmax((ue * xe) @ K, axis=-1)
                r = atten @ M
                return jnp.sum(jnp.square(ue + r - xe), axis=1,
                               keepdims=True)

            diff = dist(ie) - dist(je)
            main = pairwise_loss(loss_func, diff, margin=margin, weight=w)
            return main + reg * (l2_loss(ue * w) + l2_loss(ie * w)
                                 + l2_loss(je * w))

        self._fused_spec = {
            "planes": (("u", "u"), ("i", "i"), ("j", "i")),
            "floats": (), "dense": ("K", "M"),
            "pack": pack, "unpack": unpack, "row_loss": row_loss,
            "tw_u": self.embed_size, "tw_i": self.embed_size,
            "dense_elems": 2 * self.embed_size * self.mem_size,
        }
        return self._fused_spec


class TransCF(RecModel):
    name = "TransCF"
    sampler = "pairwise"
    cml_like = True

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "reg1", "reg2", "margin")
        self.embed_size = cfg.int("embed_size")
        self.reg1 = cfg.float("reg1")
        self.reg2 = cfg.float("reg2")
        self.margin = cfg.float("margin")

    def build_aux(self, device_data, data) -> dict[str, np.ndarray]:
        # Flat incidence lists + inverse degree vectors for the
        # neighborhood means (replaces utils/tools.py:100-113 matrices).
        u_cnt = np.zeros(self.meta.user_nums, np.float32)
        i_cnt = np.zeros(self.meta.item_nums, np.float32)
        np.add.at(u_cnt, device_data.pos_u, 1.0)
        np.add.at(i_cnt, device_data.pos_i, 1.0)
        return {
            "inv_deg_u": 1.0 / np.maximum(u_cnt, 1.0),
            "inv_deg_i": 1.0 / np.maximum(i_cnt, 1.0),
        }

    def init(self, key) -> Params:
        P, Q = self._embed_tables(
            key,
            (self.meta.user_nums, self.embed_size),
            (self.meta.item_nums, self.embed_size))
        return {"P": P, "Q": Q}

    def _nbr_tables(self, params, aux):
        u_nbr = segment_mean_embeddings(aux["pos_u"], aux["pos_i"],
                                        params["Q"], self.meta.user_nums,
                                        aux["inv_deg_u"])
        i_nbr = segment_mean_embeddings(aux["pos_i"], aux["pos_u"],
                                        params["P"], self.meta.item_nums,
                                        aux["inv_deg_i"])
        return u_nbr, i_nbr

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        u, i, j = batch["u"], batch["i"], batch["j"]
        ue = params["P"][u]
        ie = params["Q"][i]
        je = params["Q"][j]
        u_nbr_all, i_nbr_all = self._nbr_tables(params, aux)
        un = u_nbr_all[u]
        in_ = i_nbr_all[i]
        jn = i_nbr_all[j]
        d_ui = jnp.sum(jnp.square(ue + un * in_ - ie), axis=1)
        d_uj = jnp.sum(jnp.square(ue + un * jn - je), axis=1)
        # Reference dispatches get_loss(self.loss_func, ...)
        # (TransCF.py:56).
        main = pairwise_loss(self.loss_func, d_ui - d_uj,
                             margin=self.margin, weight=w)
        # Neighborhood + distance regularizers (TransCF.py:65-71).
        wc = w[:, None]
        reg_nbr = (jnp.sum(jnp.square((ue - un) * wc))
                   + jnp.sum(jnp.square((ie - in_) * wc)))
        reg_dist = jnp.sum(jnp.square((d_ui + self.margin - d_uj) * w))
        return main + self.reg1 * reg_nbr + self.reg2 * reg_dist

    def score_pairs(self, params: Params, u, i, aux: Aux):
        u_nbr_all, i_nbr_all = self._nbr_tables(params, aux)
        ue = params["P"][u]
        ie = params["Q"][i]
        r = u_nbr_all[u] * i_nbr_all[i]
        return jnp.sum(jnp.square(ue + r - ie), axis=1)

    def score_all(self, params: Params, u, aux: Aux):
        """Full-catalog branch parity quirk (TransCF.py:79-85): the
        reference's _unit_clipping reassigns u_embed BEFORE _predict
        builds this branch, so full-catalog ranking uses
        ||clip(u) + u_nbr * i_nbr - Q||^2 while the loo/candidate
        branch keeps the pre-clipping ui_dist (our score_pairs) — the
        same ordering quirk CML reproduces above."""
        u_nbr_all, i_nbr_all = self._nbr_tables(params, aux)
        ue = clip_rows_by_norm(params["P"][u])
        un = u_nbr_all[u]
        item_nums = self.meta.item_nums
        chunk = min(self.SCORE_ALL_CHUNK, item_nums)
        n_chunks = -(-item_nums // chunk)
        items = (jnp.arange(n_chunks * chunk, dtype=jnp.int32)
                 % item_nums).reshape(n_chunks, chunk)

        def one(chunk_items):
            r = un[:, None, :] * i_nbr_all[chunk_items][None, :, :]
            diff = ue[:, None, :] + r - params["Q"][chunk_items][None, :, :]
            return jnp.sum(jnp.square(diff), axis=-1)

        scores = jax.lax.map(one, items)
        scores = jnp.moveaxis(scores, 0, 1).reshape(u.shape[0], -1)
        return scores[:, :item_nums]
