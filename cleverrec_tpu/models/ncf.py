"""NCF family: GMF, MLP, NeuMF (WWW'17).

Math parity with the reference:
- GMF  (model/ranking/GMF.py:29-58):  logits = <h_gmf, P[u] * Q[i]>;
  pointwise sigmoid cross-entropy; test scores pass through sigmoid.
  (The reference file has a missing-import NameError at GMF.py:48; the
  intended math is reproduced here, SURVEY.md section 2.5 item 1.)
- MLP  (model/ranking/MLP.py:29-75):  towers ``layers=[l0, l0/2, ...]``,
  P/Q width l0/2, per-layer W:[l, l/2] + b with ReLU, output h_mlp.
- NeuMF (model/ranking/NeuMF.py:27-110): dual embeddings, fused output
  h_neumf over concat(gmf, mlp); optional warm-start from pretrained
  GMF/MLP with h_neumf = 0.5*concat(h_gmf, h_mlp) (NeuMF.py:53-56) —
  implemented in train/checkpoint.py as a params graft.

TPU notes: GMF/NeuMF full-catalog scoring contracts the output weight into
the user factors first ((P[u] ⊙ h) @ Q^T) so the catalog axis is a single
MXU matmul rather than the reference's [B, I, d] einsum blow-up.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cleverrec_tpu.common import init_param, l2_loss, sigmoid_xent_loss
from cleverrec_tpu.models.base import Aux, Params, RecModel


def mlp_tower(params: Params, x, n_layers: int):
    for lid in range(n_layers):
        x = jax.nn.relu(x @ params[f"W_{lid}"] + params[f"b_{lid}"])
    return x


class GMF(RecModel):
    name = "GMF"
    sampler = "pointwise"
    # {P, Q, h_gmf} elementwise-product form with sigmoid cross-entropy:
    # eligible for the VMEM-resident fused pointwise epoch kernel
    # (ops/pallas_train.py fused_gmf_epoch).
    fused_protocol = "pointwise_bce"

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "reg")
        self.embed_size = cfg.int("embed_size")
        self.reg = cfg.float("reg")

    def init(self, key) -> Params:
        P, Q, h = self._embed_tables(
            key,
            (self.meta.user_nums, self.embed_size),
            (self.meta.item_nums, self.embed_size),
            (self.embed_size,),
        )
        return {"P": P, "Q": Q, "h_gmf": h}

    def _logits(self, params, u, i):
        return jnp.sum(params["P"][u] * params["Q"][i] * params["h_gmf"],
                       axis=1)

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        ue = params["P"][batch["u"]] * w[:, None]
        ie = params["Q"][batch["i"]] * w[:, None]
        logits = jnp.sum(ue * ie * params["h_gmf"], axis=1)
        main = sigmoid_xent_loss(batch["y"], logits, weight=w)
        return main + self.reg * (l2_loss(ue) + l2_loss(ie))

    def score_pairs(self, params: Params, u, i, aux: Aux):
        return jax.nn.sigmoid(self._logits(params, u, i))

    def score_all(self, params: Params, u, aux: Aux):
        uh = params["P"][u] * params["h_gmf"]
        return jax.nn.sigmoid(jnp.dot(uh, params["Q"].T,
                                      preferred_element_type=jnp.float32))

    def dot_decomposition(self, params: Params, u, aux: Aux):
        """Fused-eval form: sigmoid is monotonic, so ranking the raw
        logits (P[u] (.) h) . Q equals ranking the reference's sigmoid
        scores."""
        return params["P"][u] * params["h_gmf"], params["Q"], None


def _stable_bce(logits, y):
    """Per-row sigmoid cross-entropy, the exact common.sigmoid_xent_loss
    form (max(x,0) - x*z + log1p(exp(-|x|)))."""
    return (jnp.maximum(logits, 0.0) - logits * y
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def _dotg(x, w):
    return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


class MLP(RecModel):
    name = "MLP"
    sampler = "pointwise"
    # Tower objective: eligible for the generic VMEM-resident fused
    # pointwise epoch (ops/pallas_train.py fused_mlp_epoch) — the
    # per-row loss below is differentiated inside the kernel.
    fused_protocol = "pointwise_mlp"

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("layers", "reg")
        self.layers = cfg.int_list("layers")
        self.reg = cfg.float("reg")
        self._fused_spec = None

    def fused_mlp_spec(self):
        """Static spec for the fused pointwise epoch: table grouping,
        dense param order, the per-row loss (MLP.loss verbatim over
        kernel-shaped values: dense 1-D params arrive as [1, n]), and
        VMEM-planning widths.  Cached so the jit key (the row_loss
        closure identity) is stable across epochs."""
        if self._fused_spec is not None:
            return self._fused_spec
        L = len(self.layers)
        reg = self.reg
        dense = (tuple(f"W_{lid}" for lid in range(L))
                 + tuple(f"b_{lid}" for lid in range(L)) + ("h_mlp",))

        def row_loss(pe, qe, dv, y, w):
            pe = pe * w
            qe = qe * w
            x = jnp.concatenate([pe, qe], axis=1)
            for lid in range(L):
                x = jax.nn.relu(_dotg(x, dv[lid]) + dv[L + lid])
            logits = jax.lax.dot_general(
                x, dv[2 * L], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # [blk, 1]
            main = jnp.sum(_stable_bce(logits, y) * w)
            return main + reg * (l2_loss(pe) + l2_loss(qe))

        half = self.layers[0] // 2
        self._fused_spec = {
            "u": ("P",), "i": ("Q",), "dense": dense,
            "row_loss": row_loss, "tw_u": half, "tw_i": half,
            "dense_elems": sum(w * (w // 2) + w // 2 for w in self.layers)
            + self.layers[-1] // 2,
            "act_cols": self.layers[0] + sum(w // 2 for w in self.layers),
        }
        return self._fused_spec

    def init(self, key) -> Params:
        half = self.layers[0] // 2
        keys = jax.random.split(key, 3 + 2 * len(self.layers))
        params: Params = {
            "P": init_param(keys[0], self.initializer,
                            (self.meta.user_nums, half)),
            "Q": init_param(keys[1], self.initializer,
                            (self.meta.item_nums, half)),
            "h_mlp": init_param(keys[2], self.initializer,
                                (self.layers[-1] // 2,)),
        }
        for lid, width in enumerate(self.layers):
            params[f"W_{lid}"] = init_param(keys[3 + 2 * lid],
                                            self.initializer,
                                            (width, width // 2))
            params[f"b_{lid}"] = init_param(keys[4 + 2 * lid],
                                            self.initializer, (width // 2,))
        return params

    def _logits(self, params, ue, ie):
        x = jnp.concatenate([ue, ie], axis=-1)
        x = mlp_tower(params, x, len(self.layers))
        return x @ params["h_mlp"]

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        ue = params["P"][batch["u"]] * w[:, None]
        ie = params["Q"][batch["i"]] * w[:, None]
        logits = self._logits(params, ue, ie)
        main = sigmoid_xent_loss(batch["y"], logits, weight=w)
        return main + self.reg * (l2_loss(ue) + l2_loss(ie))

    def score_pairs(self, params: Params, u, i, aux: Aux):
        return jax.nn.sigmoid(self._logits(params, params["P"][u],
                                           params["Q"][i]))


class NeuMF(RecModel):
    name = "NeuMF"
    sampler = "pointwise"
    fused_protocol = "pointwise_mlp"

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "layers", "reg1", "reg2")
        self.embed_size = cfg.int("embed_size")
        self.layers = cfg.int_list("layers")
        self.reg1 = cfg.float("reg1")
        self.reg2 = cfg.float("reg2")
        self._fused_spec = None

    def fused_mlp_spec(self):
        """Fused-epoch spec (see MLP.fused_mlp_spec): the GMF and MLP
        user tables ride ONE concatenated [U, d + l0/2] gather (same on
        the item side), and NeuMF.loss is reproduced verbatim over the
        split slices."""
        if self._fused_spec is not None:
            return self._fused_spec
        L = len(self.layers)
        d, reg1, reg2 = self.embed_size, self.reg1, self.reg2
        dense = (tuple(f"W_{lid}" for lid in range(L))
                 + tuple(f"b_{lid}" for lid in range(L)) + ("h_neumf",))

        def row_loss(pe, qe, dv, y, w):
            pe = pe * w
            qe = qe * w
            ug, um = pe[:, :d], pe[:, d:]
            ig, im = qe[:, :d], qe[:, d:]
            x = jnp.concatenate([um, im], axis=1)
            for lid in range(L):
                x = jax.nn.relu(_dotg(x, dv[lid]) + dv[L + lid])
            z = jnp.concatenate([ug * ig, x], axis=1)
            logits = jax.lax.dot_general(
                z, dv[2 * L], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # [blk, 1]
            main = jnp.sum(_stable_bce(logits, y) * w)
            return (main + reg1 * (l2_loss(ug) + l2_loss(ig))
                    + reg2 * (l2_loss(um) + l2_loss(im)))

        half = self.layers[0] // 2
        self._fused_spec = {
            "u": ("P_gmf", "P_mlp"), "i": ("Q_gmf", "Q_mlp"),
            "dense": dense, "row_loss": row_loss,
            "tw_u": d + half, "tw_i": d + half,
            "dense_elems": sum(w * (w // 2) + w // 2 for w in self.layers)
            + d + self.layers[-1] // 2,
            "act_cols": 2 * d + self.layers[0]
            + sum(w // 2 for w in self.layers) + self.layers[-1] // 2,
        }
        return self._fused_spec

    def init(self, key) -> Params:
        half = self.layers[0] // 2
        keys = jax.random.split(key, 6 + 2 * len(self.layers))
        params: Params = {
            "P_gmf": init_param(keys[0], self.initializer,
                                (self.meta.user_nums, self.embed_size)),
            "Q_gmf": init_param(keys[1], self.initializer,
                                (self.meta.item_nums, self.embed_size)),
            "h_gmf": init_param(keys[2], self.initializer, (self.embed_size,)),
            "P_mlp": init_param(keys[3], self.initializer,
                                (self.meta.user_nums, half)),
            "Q_mlp": init_param(keys[4], self.initializer,
                                (self.meta.item_nums, half)),
            "h_mlp": init_param(keys[5], self.initializer,
                                (self.layers[-1] // 2,)),
        }
        for lid, width in enumerate(self.layers):
            params[f"W_{lid}"] = init_param(keys[6 + 2 * lid],
                                            self.initializer,
                                            (width, width // 2))
            params[f"b_{lid}"] = init_param(keys[7 + 2 * lid],
                                            self.initializer, (width // 2,))
        # h_neumf over concat(gmf, mlp); overwritten by the warm-start graft
        # when pretrained GMF/MLP checkpoints are configured.
        params["h_neumf"] = init_param(
            jax.random.fold_in(key, 99), self.initializer,
            (self.embed_size + self.layers[-1] // 2,))
        return params

    def _logits(self, params, ug, ig, um, im):
        y_gmf = ug * ig
        y_mlp = mlp_tower(params, jnp.concatenate([um, im], axis=-1),
                          len(self.layers))
        return jnp.concatenate([y_gmf, y_mlp], axis=-1) @ params["h_neumf"]

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        wcol = w[:, None]
        ug = params["P_gmf"][batch["u"]] * wcol
        ig = params["Q_gmf"][batch["i"]] * wcol
        um = params["P_mlp"][batch["u"]] * wcol
        im = params["Q_mlp"][batch["i"]] * wcol
        logits = self._logits(params, ug, ig, um, im)
        main = sigmoid_xent_loss(batch["y"], logits, weight=w)
        return (main + self.reg1 * (l2_loss(ug) + l2_loss(ig))
                + self.reg2 * (l2_loss(um) + l2_loss(im)))

    def score_pairs(self, params: Params, u, i, aux: Aux):
        return jax.nn.sigmoid(self._logits(
            params, params["P_gmf"][u], params["Q_gmf"][i],
            params["P_mlp"][u], params["Q_mlp"][i]))
