"""Social-diffusion models: DiffNet, DiffNet++, LR-GCCF.

All three are advertised in the reference README with empty files
(SURVEY.md section 2.2); these implement the published algorithms on the
framework's edge-list segment-sum machinery:

- DiffNet (Wu et al., SIGIR'19): layer-wise social diffusion of user
  embeddings h^(l+1)_u = s(W_l [mean_{v in S(u)} h^l_v ; h^l_u]); final
  user representation = h^L + mean of consumed item embeddings; inner
  product scoring, BPR loss.
- DiffNet++ (Wu et al., TKDE'20): dual diffusion — social graph over
  users AND interest graph over user-item edges — fused per layer by a
  learned two-way softmax gate; items aggregate from their consumers.
- LR-GCCF (Chen et al., AAAI'20): linear residual graph convolution —
  LightGCN-style normalized propagation WITHOUT nonlinearities, final
  embedding = concatenation of all layers (the residual formulation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cleverrec_tpu.common import init_param, l2_loss, pairwise_loss
from cleverrec_tpu.data.social import flatten_friend_edges
from cleverrec_tpu.models.base import Aux, Params, RecModel
from cleverrec_tpu.models.gcn import LightGCN


def _mean_edges(pairs_a, pairs_b, n_a):
    """Row-normalized aggregation edges a <- b: weights 1/deg(a)."""
    deg = np.zeros(n_a)
    np.add.at(deg, pairs_a, 1.0)
    w = 1.0 / np.maximum(deg[pairs_a], 1.0)
    return (pairs_a.astype(np.int32), pairs_b.astype(np.int32),
            w.astype(np.float32))


class DiffNet(RecModel):
    name = "DiffNet"
    sampler = "pairwise"

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "reg")
        self.embed_size = cfg.int("embed_size")
        self.reg = cfg.float("reg")
        self.n_layers = cfg.int("n_layers", 2)

    def build_aux(self, device_data, data) -> dict:
        if data.user_friends is None:
            raise ValueError("DiffNet requires social_file")
        sf_u, sf_v = flatten_friend_edges(data.user_friends)
        s_row, s_col, s_w = _mean_edges(sf_u.astype(np.int64),
                                        sf_v.astype(np.int64),
                                        self.meta.user_nums)
        # Consumed-item mean edges (u <- i).
        r_row, r_col, r_w = _mean_edges(device_data.pos_u.astype(np.int64),
                                        device_data.pos_i.astype(np.int64),
                                        self.meta.user_nums)
        return {"s_row": s_row, "s_col": s_col, "s_w": s_w,
                "r_row": r_row, "r_col": r_col, "r_w": r_w}

    def init(self, key) -> Params:
        d = self.embed_size
        keys = jax.random.split(key, 2 + 2 * self.n_layers)
        params: Params = {
            "P": init_param(keys[0], self.initializer,
                            (self.meta.user_nums, d)),
            "Q": init_param(keys[1], self.initializer,
                            (self.meta.item_nums, d)),
        }
        for lid in range(self.n_layers):
            params[f"W_{lid}"] = init_param(keys[2 + 2 * lid],
                                            self.initializer, (2 * d, d))
            params[f"b_{lid}"] = init_param(keys[3 + 2 * lid],
                                            self.initializer, (d,))
        return params

    def _user_final(self, params, aux):
        h = params["P"]
        for lid in range(self.n_layers):
            social = jax.ops.segment_sum(
                aux["s_w"][:, None] * h[aux["s_col"]], aux["s_row"],
                num_segments=self.meta.user_nums)
            h = jax.nn.sigmoid(
                jnp.concatenate([social, h], axis=1) @ params[f"W_{lid}"]
                + params[f"b_{lid}"])
        item_pref = jax.ops.segment_sum(
            aux["r_w"][:, None] * params["Q"][aux["r_col"]], aux["r_row"],
            num_segments=self.meta.user_nums)
        return h + item_pref

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        u_f = self._user_final(params, aux)
        ue = u_f[batch["u"]]
        s_i = jnp.sum(ue * params["Q"][batch["i"]], axis=1)
        s_j = jnp.sum(ue * params["Q"][batch["j"]], axis=1)
        main = pairwise_loss(self.loss_func, s_i - s_j, weight=w)
        wc = w[:, None]
        reg = (l2_loss(params["P"][batch["u"]] * wc)
               + l2_loss(params["Q"][batch["i"]] * wc)
               + l2_loss(params["Q"][batch["j"]] * wc))
        return main + self.reg * reg

    def score_pairs(self, params: Params, u, i, aux: Aux):
        u_f = self._user_final(params, aux)
        return jnp.sum(u_f[u] * params["Q"][i], axis=1)

    def score_candidates(self, params: Params, u, cand, aux: Aux):
        u_f = self._user_final(params, aux)
        return jnp.einsum("bd,bcd->bc", u_f[u], params["Q"][cand])

    def score_all(self, params: Params, u, aux: Aux):
        u_f = self._user_final(params, aux)
        return jnp.dot(u_f[u], params["Q"].T,
                       preferred_element_type=jnp.float32)


class DiffNetPlusPlus(DiffNet):
    name = "DiffNetPlusPlus"

    def build_aux(self, device_data, data) -> dict:
        aux = super().build_aux(device_data, data)
        # Item <- consumer-user mean edges for the interest diffusion.
        i_row, i_col, i_w = _mean_edges(device_data.pos_i.astype(np.int64),
                                        device_data.pos_u.astype(np.int64),
                                        self.meta.item_nums)
        aux.update({"i_row": i_row, "i_col": i_col, "i_w": i_w})
        return aux

    def init(self, key) -> Params:
        params = super().init(key)
        # Two-way fusion gate per layer (social vs interest diffusion).
        for lid in range(self.n_layers):
            params[f"gate_{lid}"] = jnp.zeros(2)
        return params

    def _propagate(self, params, aux):
        hu = params["P"]
        hi = params["Q"]
        for lid in range(self.n_layers):
            social = jax.ops.segment_sum(
                aux["s_w"][:, None] * hu[aux["s_col"]], aux["s_row"],
                num_segments=self.meta.user_nums)
            interest = jax.ops.segment_sum(
                aux["r_w"][:, None] * hi[aux["r_col"]], aux["r_row"],
                num_segments=self.meta.user_nums)
            g = jax.nn.softmax(params[f"gate_{lid}"])
            # Both layer-(k+1) updates consume layer-k embeddings (the
            # published DiffNet++ recurrence): the item aggregation reads
            # the PRE-update hu, not the same-layer fused one.
            hi = hi + jax.ops.segment_sum(
                aux["i_w"][:, None] * hu[aux["i_col"]], aux["i_row"],
                num_segments=self.meta.item_nums)
            hu = hu + g[0] * social + g[1] * interest
        return hu, hi

    def _user_final(self, params, aux):  # pragma: no cover - via score paths
        hu, _ = self._propagate(params, aux)
        return hu

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        hu, hi = self._propagate(params, aux)
        ue = hu[batch["u"]]
        s_i = jnp.sum(ue * hi[batch["i"]], axis=1)
        s_j = jnp.sum(ue * hi[batch["j"]], axis=1)
        main = pairwise_loss(self.loss_func, s_i - s_j, weight=w)
        wc = w[:, None]
        reg = (l2_loss(params["P"][batch["u"]] * wc)
               + l2_loss(params["Q"][batch["i"]] * wc)
               + l2_loss(params["Q"][batch["j"]] * wc))
        return main + self.reg * reg

    def score_pairs(self, params: Params, u, i, aux: Aux):
        hu, hi = self._propagate(params, aux)
        return jnp.sum(hu[u] * hi[i], axis=1)

    def score_candidates(self, params: Params, u, cand, aux: Aux):
        hu, hi = self._propagate(params, aux)
        return jnp.einsum("bd,bcd->bc", hu[u], hi[cand])

    def score_all(self, params: Params, u, aux: Aux):
        hu, hi = self._propagate(params, aux)
        return jnp.dot(hu[u], hi.T, preferred_element_type=jnp.float32)


class LR_GCCF(LightGCN):
    """Linear residual GCN: LightGCN propagation, CONCAT of layer outputs
    instead of their mean (the residual preserves every depth)."""

    name = "LR_GCCF"

    def _propagate(self, params, aux):
        from cleverrec_tpu.models.gcn import _adj_apply
        n = self.meta.user_nums + self.meta.item_nums
        ego = jnp.concatenate([params["P"], params["Q"]], axis=0)
        outs = [ego]
        for _ in range(self.n_layers):
            ego = _adj_apply(aux, ego, n)
            outs.append(ego)
        final = jnp.concatenate(outs, axis=1)
        return final[: self.meta.user_nums], final[self.meta.user_nums:]
