"""Model registry.

The reference dynamically imports ``model.<type>.<Name>`` (main.py:47-52);
here models register by name in one table.  ``make_model`` replaces that
importlib dispatch.
"""

from __future__ import annotations

from cleverrec_tpu.config import Config
from cleverrec_tpu.models.base import DataMeta, RecModel
from cleverrec_tpu.models.bpr import BPR
from cleverrec_tpu.models.diffnet import DiffNet, DiffNetPlusPlus, LR_GCCF
from cleverrec_tpu.models.extra import DMF, EATNN, SML, WMF
from cleverrec_tpu.models.gcn import LightGCN, NGCF
from cleverrec_tpu.models.graph import RML_DGATs, SoHRML
from cleverrec_tpu.models.itemsim import FISM, NAIS, NAISSingle
from cleverrec_tpu.models.metric import CML, LRML, TransCF
from cleverrec_tpu.models.ncf import GMF, MLP, NeuMF
from cleverrec_tpu.models.social import (CUNE_BPR, SAMN, SAMNSingle, SBPR,
                                         TBPR)

_REGISTRY: dict[str, type] = {}


def register(cls):
    _REGISTRY[cls.name] = cls
    return cls


for _cls in (BPR, GMF, MLP, NeuMF, CML, LRML, TransCF, FISM, NAIS,
             NAISSingle, SBPR, TBPR, CUNE_BPR, SAMN, SAMNSingle, RML_DGATs,
             SoHRML, LightGCN, NGCF, DiffNet, DiffNetPlusPlus,
             LR_GCCF, WMF, DMF, SML, EATNN):
    register(_cls)


def available_models() -> list[str]:
    return sorted(_REGISTRY)


def make_model(cfg: Config, meta: DataMeta) -> RecModel:
    name = cfg.recommender
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {available_models()}")
    return _REGISTRY[name](cfg, meta)
