"""Config-surface parity: the REFERENCE's own unmodified .properties files
construct valid configs and models here.

A CleverRec user should be able to point cleverrec-tpu at their existing
config tree; this drives every shipped per-model conf through
Config.from_properties + model construction (including the drifted keys
the alias table repairs and the quoted atten_type value)."""

import os

import pytest

from cleverrec_tpu.config import Config
from cleverrec_tpu.models import _REGISTRY, make_model
from cleverrec_tpu.models.base import DataMeta

REF = "/root/reference"
REF_GLOBAL = os.path.join(REF, "CleverRec.properties")
REF_CONF = os.path.join(REF, "conf")

# Reference confs for models our registry implements (NAIS.properties
# pairs with our unified NAIS; FM is the rating pipeline).
RANKING_CONFS = ["BPR", "GMF", "MLP", "NeuMF", "CML", "LRML", "TransCF",
                 "FISM", "NAIS", "NAIS_single", "SBPR", "CUNE_BPR", "SAMN",
                 "SAMN_single", "RML_DGATs", "SoHRML"]


class _NoPretrain(Config):
    pass


@pytest.mark.parametrize("name", RANKING_CONFS)
def test_reference_conf_builds_model(name):
    cfg = Config.from_properties(REF_GLOBAL, REF_CONF,
                                 {"recommender": name})
    # Drop pretrain pointers (they reference TF checkpoints on the
    # original author's disk, consumed only when present).
    d = {k: v for k, v in cfg.to_dict().items()
         if not k.endswith("_pretrain")}
    cfg = Config(d)
    meta = DataMeta(user_nums=50, item_nums=80)

    class FakeDD:
        pos_u = __import__("numpy").arange(10, dtype="int32") % 50
        pos_i = __import__("numpy").arange(10, dtype="int32") % 80

    model = make_model(cfg, meta)
    assert model.name == name
    # Common hyperparameters parse to the right types.
    assert cfg.epoches > 0
    assert cfg.batch_size > 0
    assert cfg.lr > 0
    assert isinstance(cfg.topk, list) and cfg.topk == [10, 20]


def test_reference_fm_conf():
    cfg = Config.from_properties(REF_GLOBAL, REF_CONF,
                                 {"recommender": "FM",
                                  "model_type": "rating"})
    assert cfg.bool("is_real_valued")
    assert cfg.str("train") == ".train.libfm"
    assert cfg.float("reg") == pytest.approx(1e-3)


def test_reference_global_defaults():
    cfg = Config.from_properties(REF_GLOBAL, REF_CONF, {})
    assert cfg.str("data.dataset") == "Ciao"
    assert cfg.split_way == "rs"
    assert cfg.neg_samples == 0         # full-catalog eval
    assert not cfg.candidate_eval
    assert cfg.test_batch_size == 1024


def test_quoted_and_aliased_values():
    cfg = Config.from_properties(REF_GLOBAL, REF_CONF,
                                 {"recommender": "NAIS"})
    assert cfg.str("atten_type") == "prod"          # quotes stripped
    assert cfg.init_method == "xavier"              # xavier_uniform alias
