"""Checkpointing and warm-start grafts.

The reference's persistence is half-wired: per-model ``tf.train.Saver``
maps exist but the save call is commented out
(RankingRecommender.py:432-433); the restore path IS used for NeuMF's
GMF/MLP warm start (NeuMF.py:127-139) and NAIS's FISM warm start
(NAIS_single.py:35-38).  Here both sides are first-class:

- full train-state checkpoints (params + optimizer state + epoch + RNG
  key) via Orbax, enabling the mid-training resume the reference lacks
  (SURVEY.md section 5.4),
- warm-start grafts that map a pretrained model's params into a target
  model's params, reproducing the reference's variable-name mappings:
  NeuMF <- GMF + MLP with h_neumf = 0.5 * concat(h_gmf, h_mlp)
  (NeuMF.py:53-56), NAIS <- FISM (P, Q, bias).
"""

from __future__ import annotations

import os
from typing import Any

import jax.numpy as jnp


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    epoch: int = 0, key=None) -> str:
    """Write a train-state checkpoint; returns the directory written.

    Crash-safe: the state is written to a fresh sibling directory and
    only swapped into ``path`` after the write finalizes (Orbax's
    force=True deletes the existing checkpoint FIRST — a preemption
    mid-save would otherwise destroy the only copy exactly when long
    runs die)."""
    import shutil

    path = os.path.abspath(path)
    state = {"params": params, "epoch": jnp.asarray(epoch)}
    if opt_state is not None:
        state["opt_state"] = opt_state
    if key is not None:
        state["key"] = key
    ckptr = _checkpointer()
    tmp = path + ".inprogress"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ckptr.save(tmp, state, force=True)
    ckptr.wait_until_finished()
    old = path + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)            # keep the previous copy until
    os.rename(tmp, path)                # the new one is in place
    if os.path.exists(old):
        shutil.rmtree(old)
    return path


def load_checkpoint(path: str, template: Any | None = None) -> dict:
    """Read a checkpoint saved by ``save_checkpoint``.  With ``template``
    (a matching pytree of arrays) restoration is shape/dtype-checked."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    if template is not None:
        return ckptr.restore(path, target=template)
    return ckptr.restore(path)


def load_params(path: str) -> Any:
    return load_checkpoint(path)["params"]


# -- warm-start grafts ----------------------------------------------------

def graft_neumf(neumf_params: dict, gmf_params: dict,
                mlp_params: dict) -> dict:
    """NeuMF warm start from pretrained GMF and MLP towers
    (NeuMF.py:53-56, :127-139)."""
    out = dict(neumf_params)
    out["P_gmf"] = gmf_params["P"]
    out["Q_gmf"] = gmf_params["Q"]
    out["h_gmf"] = gmf_params["h_gmf"]
    out["P_mlp"] = mlp_params["P"]
    out["Q_mlp"] = mlp_params["Q"]
    out["h_mlp"] = mlp_params["h_mlp"]
    # Only layers the TARGET actually has: a deeper pretrained MLP would
    # otherwise graft phantom W_k/b_k params that the tower never reads
    # but the optimizer and every checkpoint would carry.
    for k, v in mlp_params.items():
        if k.startswith(("W_", "b_")):
            if k not in neumf_params:
                raise ValueError(
                    f"mlp_pretrain layer {k!r} has no slot in the target "
                    "NeuMF (layers config mismatch)")
            if v.shape != neumf_params[k].shape:
                raise ValueError(
                    f"mlp_pretrain layer {k!r} shape {v.shape} != target "
                    f"{neumf_params[k].shape} (layers config mismatch)")
            out[k] = v
    out["h_neumf"] = 0.5 * jnp.concatenate(
        [gmf_params["h_gmf"], mlp_params["h_mlp"]], axis=0)
    return out


def graft_nais(nais_params: dict, fism_params: dict) -> dict:
    """NAIS warm start from pretrained FISM (NAIS_single.py:35-38)."""
    out = dict(nais_params)
    out["P"] = fism_params["P"]
    out["Q"] = fism_params["Q"]
    out["bias"] = fism_params["b"]
    return out


def apply_warm_start(model_name: str, params: dict, cfg) -> dict:
    """Config-driven warm start (same keys the reference uses:
    gmf_pretrain/mlp_pretrain for NeuMF, fism_pretrain for NAIS)."""
    if (model_name == "NeuMF" and "gmf_pretrain" in cfg
            and "mlp_pretrain" in cfg):
        return graft_neumf(params,
                           load_params(cfg.str("gmf_pretrain")),
                           load_params(cfg.str("mlp_pretrain")))
    if model_name in ("NAIS", "NAIS_single") and "fism_pretrain" in cfg:
        return graft_nais(params, load_params(cfg.str("fism_pretrain")))
    return params
