"""CLI: properties-file flow end to end (the reference's main.py analog)."""

import numpy as np

from cleverrec_tpu.cli import main
from tests.conftest import make_toy_interactions


def _write_props(tmp_path, ds_root):
    p = tmp_path / "Global.properties"
    p.write_text(f"""[default]
recommender=BPR
model_type=ranking
config_dir={tmp_path}/conf
data.root_dir={ds_root}
data.dataset=toycli
data.file_name=ratings.csv
data.sep=,
data.format=UIRT
data.split_way=loo
data.split_ratio=[0.7,0.2,0.1]
data.split_by_time=False
data.user_min=0
data.item_min=0
test.neg_samples=10
test.batch_size=32
test.interval=1
topk=[5,10]
seed=1
""")
    conf = tmp_path / "conf"
    conf.mkdir()
    (conf / "BPR.properties").write_text("""[parameters]
epoches=2
batch_size=64
embed_size=8
reg=0.01
lr=0.05
neg_ratio=2
optimizer=Adam
is_pairwise=True
loss_func=bpr
init_method=normal
stddev=0.01
""")
    return str(p)


def test_cli_runs_bpr(tmp_path, capsys):
    ds = tmp_path / "data" / "toycli"
    ds.mkdir(parents=True)
    make_toy_interactions(ds / "ratings.csv")
    props = _write_props(tmp_path, str(tmp_path / "data"))
    rc = main(["--config", props, "--set", "epoches=1"])
    assert rc == 0


def test_cli_list_models(capsys):
    assert main(["--list-models"]) == 0
    out = capsys.readouterr().out
    for name in ("BPR", "NeuMF", "CML", "SAMN", "SBPR", "NAIS"):
        assert name in out


def test_cli_model_override(tmp_path):
    ds = tmp_path / "data" / "toycli"
    ds.mkdir(parents=True)
    make_toy_interactions(ds / "ratings.csv")
    props = _write_props(tmp_path, str(tmp_path / "data"))
    (tmp_path / "conf" / "GMF.properties").write_text("""[parameters]
epoches=1
batch_size=64
embed_size=8
reg_gmf=0.01
lr=0.05
neg_ratio=1
optimizer=Adam
is_pairwise=False
loss_func=cross_entropy
init_method=normal
stddev=0.01
""")
    # --model swaps the recommender; the drifted reg_gmf key aliases to reg.
    assert main(["--config", props, "--model", "GMF"]) == 0


def test_cli_tune(tmp_path):
    ds = tmp_path / "data" / "toycli"
    ds.mkdir(parents=True)
    make_toy_interactions(ds / "ratings.csv")
    props = _write_props(tmp_path, str(tmp_path / "data"))
    # List-valued embed_size becomes a grid axis under --tune.
    rc = main(["--config", props, "--tune", "--set", "embed_size=[4,8]",
               "--set", "epoches=1"])
    assert rc == 0


def test_cli_export_serving(tmp_path):
    import json
    ds = tmp_path / "data" / "toycli"
    ds.mkdir(parents=True)
    make_toy_interactions(ds / "ratings.csv")
    props = _write_props(tmp_path, str(tmp_path / "data"))
    out = tmp_path / "bundle"
    rc = main(["--config", props, "--set", "epoches=1",
               "--set", "serve.batch=4", "--set", "serve.n_cand=6",
               "--export-serving", str(out)])
    assert rc == 0
    manifest = json.loads((out / "meta.json").read_text())
    assert manifest["model"] == "BPR" and manifest["batch"] == 4
    assert (out / manifest["artifacts"]["retrieval"]).stat().st_size > 0
    assert (out / manifest["artifacts"]["rerank"]).stat().st_size > 0
