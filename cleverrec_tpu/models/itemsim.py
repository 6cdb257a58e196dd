"""Item-similarity models: FISM and NAIS.

Math parity:
- FISM (model/ranking/FISM.py:38-72): user representation =
  (1/|I_u|) * sum_{j in I_u} P[j], scaled again by |I_u|^(-alpha)
  (the reference composes BOTH factors: the 1/|I_u| lives in the sparse
  matrix values, utils/tools.py:90-97, and the coeff multiplies
  |I_u|^(-alpha), FISM.py:51); score = <Q[i], coeff * u_agg> + b[i].
  The history sum does NOT exclude the target item (reference behavior).
  Loss: pairwise bpr (or pointwise xent) + reg*(l2(P)+l2(Q))/batch_size
  + reg_bias*l2(b) over the FULL tables (FISM.py:57-63).  Tables are
  sized item_nums+1 with a sentinel pad row; b ~ U(-0.1, 0.1) regardless
  of init_method (FISM.py:38).
- NAIS (model/ranking/NAIS_single.py:40-101): attention over the user's
  history, weight = h^T ReLU(W . joint + b), smoothed softmax denominator
  (sum exp)^beta, joint = q_i (x) p_h ('prod') or concat.  The reference
  batches one user at a time (train_model_nais,
  RankingRecommender.py:64-87); we batch across users with padded,
  masked histories — identical math, TPU-shaped.  ``NAIS`` and
  ``NAIS_single`` are the same model here (the reference's NAIS.py is
  broken — SURVEY.md section 2.5 item 2 — and NAIS_single is its working
  form).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cleverrec_tpu.common import (init_param, l2_loss, pairwise_loss,
                                  sigmoid_xent_loss)
from cleverrec_tpu.models.base import Aux, Params, RecModel
from cleverrec_tpu.models.modules import (masked_history_attention,
                                          relu_mlp_logits)


class FISM(RecModel):
    name = "FISM"

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "reg", "reg_bias", "alpha")
        self.embed_size = cfg.int("embed_size")
        self.reg = cfg.float("reg")
        self.reg_bias = cfg.float("reg_bias")
        self.alpha = cfg.float("alpha")
        self.pairwise = cfg.is_pairwise
        self.sampler = "pairwise" if self.pairwise else "pointwise"
        self.batch_size = cfg.batch_size

    def build_aux(self, device_data, data) -> dict[str, np.ndarray]:
        cnt = np.zeros(self.meta.user_nums, np.float32)
        np.add.at(cnt, device_data.pos_u, 1.0)
        return {"u_deg": cnt}

    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        n_items = self.meta.item_nums + 1  # sentinel pad row
        return {
            "P": init_param(k1, self.initializer, (n_items, self.embed_size)),
            "Q": init_param(k2, self.initializer, (n_items, self.embed_size)),
            "b": jax.random.uniform(k3, (n_items,), minval=-0.1, maxval=0.1),
        }

    def _user_repr(self, params, aux, u):
        """coeff[u] * mean_{j in I_u} P[j] for the given users, computed
        from the CURRENT P (per-step, like the reference's in-graph sparse
        matmul) via a segment-sum over the flat pair list."""
        deg = aux["u_deg"]
        agg = jax.ops.segment_sum(params["P"][aux["pos_i"]], aux["pos_u"],
                                  num_segments=self.meta.user_nums)
        mean = agg / jnp.maximum(deg, 1.0)[:, None]
        coeff = jnp.power(jnp.maximum(deg, 1.0), -self.alpha)
        return (mean * coeff[:, None])[u]

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        ur = self._user_repr(params, aux, batch["u"])
        ie = params["Q"][batch["i"]]
        ib = params["b"][batch["i"]]
        s_i = jnp.sum(ie * ur, axis=1) + ib
        reg_emb = (self.reg * (l2_loss(params["P"]) + l2_loss(params["Q"]))
                   / self.batch_size + self.reg_bias * l2_loss(params["b"]))
        if self.pairwise:
            je = params["Q"][batch["j"]]
            jb = params["b"][batch["j"]]
            s_j = jnp.sum(je * ur, axis=1) + jb
            return pairwise_loss(self.loss_func, s_i - s_j, weight=w) + reg_emb
        return sigmoid_xent_loss(batch["y"], s_i, weight=w) + reg_emb

    def score_pairs(self, params: Params, u, i, aux: Aux):
        ur = self._user_repr(params, aux, u)
        return jnp.sum(params["Q"][i] * ur, axis=1) + params["b"][i]

    def score_all(self, params: Params, u, aux: Aux):
        ur = self._user_repr(params, aux, u)
        scores = jnp.dot(ur, params["Q"][: self.meta.item_nums].T,
                         preferred_element_type=jnp.float32)
        return scores + params["b"][None, : self.meta.item_nums]


class NAIS(RecModel):
    name = "NAIS"
    sampler = "pointwise"
    # Attention cost scales with history width: train with per-width
    # bucketed epochs (Trainer._build_bucketed_epochs).
    history_bucketing = True

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "atten_size", "reg", "beta")
        self.embed_size = cfg.int("embed_size")
        self.atten_size = cfg.int("atten_size")
        self.reg = cfg.float("reg")
        self.beta = cfg.float("beta")
        self.atten_type = cfg.str("atten_type", "prod")

    def init(self, key) -> Params:
        n_items = self.meta.item_nums + 1  # sentinel pad row
        keys = jax.random.split(key, 5)
        w_in = (2 * self.embed_size if self.atten_type == "concat"
                else self.embed_size)
        return {
            "P": init_param(keys[0], self.initializer,
                            (n_items, self.embed_size)),
            "Q": init_param(keys[1], self.initializer,
                            (n_items, self.embed_size)),
            "bias": jax.random.uniform(keys[2], (n_items,),
                                       minval=-0.1, maxval=0.1),
            "W": init_param(keys[3], self.initializer,
                            (w_in, self.atten_size)),
            "b": jax.random.uniform(keys[4], (self.atten_size,),
                                    minval=-0.1, maxval=0.1),
            "h": jax.random.uniform(jax.random.fold_in(key, 9),
                                    (self.atten_size,),
                                    minval=-0.1, maxval=0.1),
        }

    def _attend(self, params, hist, mask, qi):
        """User vector attending over history items w.r.t. target qi.

        hist: [B, H] history ids (pad = item_nums sentinel); mask [B, H];
        qi: [B, d] target item embedding (Q table).
        """
        pe = params["P"][hist]                               # [B, H, d]
        if self.atten_type == "concat":
            joint = jnp.concatenate(
                [pe, jnp.broadcast_to(qi[:, None, :], pe.shape)], axis=-1)
        else:
            joint = pe * qi[:, None, :]
        logits = relu_mlp_logits(joint, params["W"], params["b"],
                                 params["h"])                              # [B, H]
        return masked_history_attention(pe, mask, logits, self.beta)

    def _scores(self, params, aux, u, i):
        seen = aux["seen"]
        hist = seen.rows[u]                                   # [B, H]
        mask = hist < self.meta.item_nums
        qi = params["Q"][i]
        ue = self._attend(params, hist, mask, qi)
        return jnp.sum(ue * qi, axis=1) + params["bias"][i], ue, qi

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        s, ue, qi = self._scores(params, aux, batch["u"], batch["i"])
        wc = w[:, None]
        ib = params["bias"][batch["i"]]
        return (sigmoid_xent_loss(batch["y"], s, weight=w)
                + self.reg * (l2_loss(ue * wc) + l2_loss(qi * wc)
                              + l2_loss(ib * w)))

    def score_pairs(self, params: Params, u, i, aux: Aux):
        s, _, _ = self._scores(params, aux, u, i)
        return s

    # Targets per (user, chunk) group in the grouped training layout.
    TARGET_CHUNK = 32

    def loss_grouped(self, params: Params, batch, aux: Aux):
        """User-grouped pointwise loss: batch rows are (user, target-chunk)
        GROUPS — ``gu`` [G] users, ``gt``/``gy``/``gw`` [G, T] targets/
        labels/weights.  Each (group, target) cell is exactly one
        pointwise row of the flat protocol (same math as ``loss``), but
        the history embedding is gathered ONCE PER GROUP instead of once
        per row — the flat layout's P[hist] gather (~8ns/index on this
        chip) dominated NAIS training.  Mirrors the reference's
        one-user-per-step batching (RankingRecommender.py:64-87)."""
        u = batch["gu"]
        seen = aux["seen"]
        hist = seen.rows[u]                                  # [G, H]
        mask = hist < self.meta.item_nums
        pe = params["P"][hist]                               # [G, H, d]
        tgt = batch["gt"]
        qi = params["Q"][tgt]                                # [G, T, d]
        if self.atten_type == "concat":
            g, t = tgt.shape
            h = hist.shape[1]
            joint = jnp.concatenate(
                [jnp.broadcast_to(pe[:, None], (g, t, h, pe.shape[-1])),
                 jnp.broadcast_to(qi[:, :, None, :],
                                  (g, t, h, qi.shape[-1]))], axis=-1)
        else:
            joint = pe[:, None, :, :] * qi[:, :, None, :]    # [G, T, H, d]
        logits = relu_mlp_logits(joint, params["W"], params["b"],
                                 params["h"])                             # [G, T, H]
        att = jax.vmap(masked_history_attention,
                       in_axes=(None, None, 1, None),
                       out_axes=1)(pe, mask, logits, self.beta)  # [G, T, d]
        s = jnp.sum(att * qi, axis=-1) + params["bias"][tgt]
        w = batch["gw"]
        wc = w[..., None]
        ib = params["bias"][tgt]
        return (sigmoid_xent_loss(batch["gy"], s, weight=w)
                + self.reg * (l2_loss(att * wc) + l2_loss(qi * wc)
                              + l2_loss(ib * w)))

    SCORE_ALL_CHUNK = 16  # [B, chunk, H, d] peak — keep chunk small

    def score_candidates(self, params: Params, u, cand, aux: Aux):
        """Candidate scoring that computes the history gather ONCE per user
        batch and streams candidates in small chunks (the [B, C, H, d]
        joint tensor is the memory hazard)."""
        seen = aux["seen"]
        hist = seen.rows[u]                                  # [B, H]
        mask = hist < self.meta.item_nums
        pe = params["P"][hist]                               # [B, H, d]
        b, c = cand.shape
        cc = min(8, c)
        n_chunks = -(-c // cc)
        pad = n_chunks * cc - c
        cand_p = jnp.pad(cand, ((0, 0), (0, pad)))
        chunks = jnp.moveaxis(cand_p.reshape(b, n_chunks, cc), 1, 0)

        def one(c_chunk):                                    # [B, cc]
            qi = params["Q"][c_chunk]                        # [B, cc, d]
            if self.atten_type == "concat":
                joint = jnp.concatenate(
                    [jnp.broadcast_to(pe[:, None], (b, cc) + pe.shape[1:]),
                     jnp.broadcast_to(qi[:, :, None, :],
                                      (b, cc, pe.shape[1], qi.shape[-1]))],
                    axis=-1)
            else:
                joint = pe[:, None, :, :] * qi[:, :, None, :]  # [B,cc,H,d]
            logits = relu_mlp_logits(joint, params["W"], params["b"],
                                 params["h"])                           # [B, cc, H]
            att = jax.vmap(masked_history_attention,
                           in_axes=(None, None, 1, None),
                           out_axes=1)(pe, mask, logits, self.beta)
            s = jnp.sum(att * qi, axis=-1) + params["bias"][c_chunk]
            return s                                           # [B, cc]

        out = jax.lax.map(one, chunks)                         # [n, B, cc]
        out = jnp.moveaxis(out, 0, 1).reshape(b, n_chunks * cc)
        return out[:, :c]


class NAISSingle(NAIS):
    """Alias: the reference's working per-user NAIS variant."""

    name = "NAIS_single"
