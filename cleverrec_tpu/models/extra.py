"""Models the reference ADVERTISES but ships empty (README.md:13-35;
SURVEY.md section 2.2 "Empty placeholders"): WMF, DMF, SML, EATNN.

These are full implementations of the published algorithms (adapted to
the framework's sampled-batch protocols where the paper trains on the
whole matrix; adaptations are noted per class).

- WMF (Hu et al., ICDM'08 — weighted/implicit MF): squared loss with
  confidence weights c = 1 + alpha for observed, 1 for sampled
  unobserved entries.  (The paper's ALS sweep over ALL unobserved cells
  is replaced by weighted SGD over the sampled pointwise protocol.)
- DMF (Xue et al., IJCAI'17 — deep matrix factorization): two MLP
  towers projecting user/item representations, cosine similarity score
  with a floor, normalized cross-entropy.
- SML (symmetric metric learning with adaptive margins): CML-style
  hinge in both user->item and item->item directions with LEARNED
  per-user / per-item margins (regularized toward larger margins).
- EATNN (Chen et al., SIGIR'19 — efficient adaptive transfer): shared +
  domain-specific user embeddings fused by a per-user attention gate
  between the item domain and the social domain.  (The paper's
  whole-data non-sampling loss is replaced by the framework's sampled
  pairwise loss; the transfer architecture is preserved.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cleverrec_tpu.common import init_param, l2_loss, pairwise_loss
from cleverrec_tpu.models.base import Aux, Params, RecModel


class WMF(RecModel):
    name = "WMF"
    sampler = "pointwise"

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "reg")
        self.embed_size = cfg.int("embed_size")
        self.reg = cfg.float("reg")
        self.alpha = cfg.float("alpha", 10.0)   # confidence boost

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
        pred = jnp.sum(ue * ie, axis=1)
        conf = 1.0 + self.alpha * batch["y"]
        main = jnp.sum(conf * jnp.square(batch["y"] - pred) * w)
        wc = w[:, None]
        return main + self.reg * (l2_loss(ue * wc) + l2_loss(ie * wc))

    def score_pairs(self, params: Params, u, i, aux: Aux):
        return jnp.sum(params["P"][u] * params["Q"][i], axis=1)

    def score_all(self, params: Params, u, aux: Aux):
        return jnp.dot(params["P"][u], params["Q"].T,
                       preferred_element_type=jnp.float32)

    def dot_decomposition(self, params: Params, u, aux: Aux):
        return params["P"][u], params["Q"], None


class DMF(RecModel):
    name = "DMF"
    sampler = "pointwise"

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "reg")
        self.embed_size = cfg.int("embed_size")
        self.layers = cfg.int_list("layers", [self.embed_size,
                                              self.embed_size])
        self.reg = cfg.float("reg")
        self.mu = cfg.float("cosine_floor", 1e-6)

    def init(self, key) -> Params:
        keys = jax.random.split(key, 2 + 4 * len(self.layers))
        params: Params = {
            "P": init_param(keys[0], self.initializer,
                            (self.meta.user_nums, self.layers[0])),
            "Q": init_param(keys[1], self.initializer,
                            (self.meta.item_nums, self.layers[0])),
        }
        for lid in range(1, len(self.layers)):
            for side in ("u", "i"):
                params[f"W{side}_{lid}"] = init_param(
                    keys[4 * lid - 2 + (0 if side == "u" else 2)],
                    self.initializer, (self.layers[lid - 1],
                                       self.layers[lid]))
                params[f"b{side}_{lid}"] = init_param(
                    keys[4 * lid - 1 + (0 if side == "u" else 2)],
                    self.initializer, (self.layers[lid],))
        return params

    def _towers(self, params, ue, ie):
        for lid in range(1, len(self.layers)):
            ue = jax.nn.relu(ue @ params[f"Wu_{lid}"] + params[f"bu_{lid}"])
            ie = jax.nn.relu(ie @ params[f"Wi_{lid}"] + params[f"bi_{lid}"])
        return ue, ie

    def _cosine(self, ue, ie):
        num = jnp.sum(ue * ie, axis=-1)
        # sqrt(sum + eps) instead of linalg.norm: the norm's gradient is
        # NaN at an exactly-zero row (a dead-ReLU tower output), and the
        # downstream maximum() floors do NOT stop it (0 * NaN = NaN in
        # the backward pass) — one such row would NaN the whole pytree.
        den = (jnp.sqrt(jnp.sum(ue * ue, axis=-1) + 1e-12)
               * jnp.sqrt(jnp.sum(ie * ie, axis=-1) + 1e-12))
        return jnp.maximum(num / jnp.maximum(den, 1e-8), self.mu)

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        ue, ie = self._towers(params, params["P"][batch["u"]],
                              params["Q"][batch["i"]])
        score = self._cosine(ue, ie)
        # Normalized cross-entropy on the cosine score in (0, 1].
        y = batch["y"]
        per = -(y * jnp.log(score) + (1 - y) * jnp.log1p(-jnp.minimum(
            score, 1 - 1e-7)))
        wc = w[:, None]
        return (jnp.sum(per * w)
                + self.reg * (l2_loss(params["P"][batch["u"]] * wc)
                              + l2_loss(params["Q"][batch["i"]] * wc)))

    def score_pairs(self, params: Params, u, i, aux: Aux):
        ue, ie = self._towers(params, params["P"][u], params["Q"][i])
        return self._cosine(ue, ie)


class SML(RecModel):
    name = "SML"
    sampler = "pairwise"
    cml_like = True

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "reg")
        self.embed_size = cfg.int("embed_size")
        self.reg = cfg.float("reg")
        self.gamma = cfg.float("gamma", 1.0)     # item-side loss weight
        self.margin_cap = cfg.float("margin_cap", 1.0)
        self.lam = cfg.float("margin_reg", 0.01)

    def init(self, key) -> Params:
        P, Q = self._embed_tables(
            key,
            (self.meta.user_nums, self.embed_size),
            (self.meta.item_nums, self.embed_size))
        return {"P": P, "Q": Q,
                "m_u": 0.5 * jnp.ones(self.meta.user_nums),
                "m_i": 0.5 * jnp.ones(self.meta.item_nums)}

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        ue = params["P"][batch["u"]]
        ie = params["Q"][batch["i"]]
        je = params["Q"][batch["j"]]
        d_ui = jnp.sum(jnp.square(ue - ie), axis=1)
        d_uj = jnp.sum(jnp.square(ue - je), axis=1)
        d_ij = jnp.sum(jnp.square(ie - je), axis=1)
        m_u = jnp.clip(params["m_u"][batch["u"]], 0.0, self.margin_cap)
        m_i = jnp.clip(params["m_i"][batch["i"]], 0.0, self.margin_cap)
        user_side = jnp.sum(jnp.maximum(d_ui + m_u - d_uj, 0.0) * w)
        item_side = jnp.sum(jnp.maximum(d_ui + m_i - d_ij, 0.0) * w)
        # Encourage large margins (negative reg, per the SML objective).
        margin_bonus = -self.lam * (jnp.sum(m_u * w) + jnp.sum(m_i * w))
        wc = w[:, None]
        reg = l2_loss(ue * wc) + l2_loss(ie * wc) + l2_loss(je * wc)
        return (user_side + self.gamma * item_side + margin_bonus
                + self.reg * reg)

    def postprocess(self, params: Params) -> Params:
        params = dict(params)
        params["m_u"] = jnp.clip(params["m_u"], 0.0, self.margin_cap)
        params["m_i"] = jnp.clip(params["m_i"], 0.0, self.margin_cap)
        return params

    def score_pairs(self, params: Params, u, i, aux: Aux):
        d = params["P"][u] - params["Q"][i]
        return jnp.sum(jnp.square(d), axis=1)

    def score_all(self, params: Params, u, aux: Aux):
        ue = params["P"][u]
        q = params["Q"]
        cross = jnp.dot(ue, q.T, preferred_element_type=jnp.float32)
        return (jnp.sum(jnp.square(ue), axis=1, keepdims=True)
                - 2.0 * cross + jnp.sum(jnp.square(q), axis=1)[None, :])

    def dot_decomposition(self, params: Params, u, aux: Aux):
        """||u - q||^2 minus the per-user constant, as (-2u).q + ||q||^2
        (see CML.dot_decomposition)."""
        ue = params["P"][u]
        q = params["Q"]
        return -2.0 * ue, q, jnp.sum(jnp.square(q), axis=1)


class EATNN(RecModel):
    name = "EATNN"
    sampler = "pairwise"

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "reg")
        self.embed_size = cfg.int("embed_size")
        self.reg = cfg.float("reg")
        self.social_weight = cfg.float("social_weight", 0.5)

    def build_aux(self, device_data, data) -> dict:
        if data.user_friends is None:
            raise ValueError("EATNN requires social_file")
        from cleverrec_tpu.data.social import flatten_friend_edges
        sf_u, sf_v = flatten_friend_edges(data.user_friends)
        if sf_u.size == 0:
            raise ValueError("EATNN: social_file has no friend edges")
        return {"sf_u_e": sf_u, "sf_v_e": sf_v}

    def init(self, key) -> Params:
        d = self.embed_size
        keys = jax.random.split(key, 6)
        return {
            "P_shared": init_param(keys[0], self.initializer,
                                   (self.meta.user_nums, d)),
            "P_item": init_param(keys[1], self.initializer,
                                 (self.meta.user_nums, d)),
            "P_social": init_param(keys[2], self.initializer,
                                   (self.meta.user_nums, d)),
            "Q": init_param(keys[3], self.initializer,
                            (self.meta.item_nums, d)),
            "att_w": init_param(keys[4], self.initializer, (d, d)),
            "att_h": init_param(keys[5], self.initializer, (d,)),
        }

    def _user_vec(self, params, u, domain: str):
        shared = params["P_shared"][u]
        spec = params[f"P_{domain}"][u]
        # Adaptive transfer gate: how much of the shared embedding flows
        # into this domain (per-user sigmoid attention).
        gate = jax.nn.sigmoid(
            jax.nn.tanh(shared @ params["att_w"]) @ params["att_h"])
        return shared * gate[:, None] + spec

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        uv = self._user_vec(params, batch["u"], "item")
        s_i = jnp.sum(uv * params["Q"][batch["i"]], axis=1)
        s_j = jnp.sum(uv * params["Q"][batch["j"]], axis=1)
        main = pairwise_loss(self.loss_func, s_i - s_j, weight=w)
        # Social-domain auxiliary task: friend pairs should be close in
        # the social-domain user space — a fresh uniform batch of edges
        # per STEP (the trainer threads dropout_key).  A deterministic
        # hash of the user id here once froze each user to the same
        # single edge forever, leaving most edges without gradient.
        n_f = aux["sf_u_e"].shape[0]
        key = batch.get("dropout_key")
        if key is not None:
            idx = jax.random.randint(key, batch["u"].shape, 0, n_f)
        else:   # keyless call (tests/serving): any fixed spread works
            idx = (batch["u"].astype(jnp.uint32)
                   * jnp.uint32(2654435761)) % jnp.uint32(max(n_f, 1))
            idx = idx.astype(jnp.int32)
        fu = aux["sf_u_e"][idx]
        fv = aux["sf_v_e"][idx]
        su = self._user_vec(params, fu, "social")
        sv = self._user_vec(params, fv, "social")
        social = jnp.sum(jnp.square(su - sv) * w[:, None])
        wc = w[:, None]
        reg = (l2_loss(uv * wc) + l2_loss(params["Q"][batch["i"]] * wc)
               + l2_loss(params["Q"][batch["j"]] * wc))
        return main + self.social_weight * social + self.reg * reg

    def score_pairs(self, params: Params, u, i, aux: Aux):
        uv = self._user_vec(params, u, "item")
        return jnp.sum(uv * params["Q"][i], axis=1)

    def score_candidates(self, params: Params, u, cand, aux: Aux):
        uv = self._user_vec(params, u, "item")
        return jnp.einsum("bd,bcd->bc", uv, params["Q"][cand])

    def score_all(self, params: Params, u, aux: Aux):
        uv = self._user_vec(params, u, "item")
        return jnp.dot(uv, params["Q"].T, preferred_element_type=jnp.float32)

    def dot_decomposition(self, params: Params, u, aux: Aux):
        return self._user_vec(params, u, "item"), params["Q"], None
