"""FM rating pipeline: libFM loading + training convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleverrec_tpu.config import Config
from cleverrec_tpu.data.libfm import load_rating_data
from cleverrec_tpu.rating import FM, FMTrainer


@pytest.fixture
def libfm_dataset(tmp_path):
    """Synthetic one-hot (user, item) FM data with planted biases."""
    r = np.random.default_rng(0)
    ds = tmp_path / "toyfm"
    ds.mkdir()
    n_users, n_items = 20, 30
    u_bias = r.normal(0, 1, n_users)
    i_bias = r.normal(0, 1, n_items)

    def gen(n_rows):
        lines = []
        for _ in range(n_rows):
            u = r.integers(n_users)
            i = r.integers(n_items)
            y = 3.0 + u_bias[u] + i_bias[i] + r.normal(0, 0.1)
            lines.append(f"{y:.3f},{u}:1,{n_users + i}:1")
        return "\n".join(lines) + "\n"

    (ds / "toyfm.train.libfm").write_text(gen(2000))
    (ds / "toyfm.test.libfm").write_text(gen(300))
    return str(tmp_path)


def _cfg(root):
    return Config({
        "recommender": "FM", "model_type": "rating",
        "data.root_dir": root, "data.dataset": "toyfm",
        "train": ".train.libfm", "test": ".test.libfm",
        "is_real_valued": "True",
        "epoches": "12", "batch_size": "256", "test.batch_size": "512",
        "embed_size": "4", "reg": "0.001", "lr": "0.05",
        "optimizer": "Adam", "loss_func": "square",
        "init_method": "normal", "stddev": "0.01", "seed": "3",
    })


def test_libfm_loader(libfm_dataset):
    data = load_rating_data(_cfg(libfm_dataset))
    assert data.feature_nums == 50  # 20 users + 30 items
    assert data.x_idx_tr.shape == (2000, 2)
    assert (data.x_val_tr == 1.0).all()
    assert len(data.y_t) == 300


def test_fm_learns_biases(libfm_dataset):
    cfg = _cfg(libfm_dataset)
    data = load_rating_data(cfg)
    model = FM(cfg, data.feature_nums)
    best = FMTrainer(model, data, cfg).run()
    # Bias-only structure with sigma=0.1 noise: FM should reach RMSE < 0.5.
    assert best["rmse"] < 0.5, best


def test_ffm_learns(libfm_dataset):
    cfg = _cfg(libfm_dataset).with_overrides(recommender="FFM")
    from cleverrec_tpu.rating import run_rating
    best = run_rating(cfg)
    assert best["rmse"] < 0.6, best


def test_ffm_predict_matches_pair_loop(libfm_dataset):
    """FFM's field-grouped einsum == the O(F^2) pair-loop definition
    (sum_{a<b} <v[x_a, field_b], v[x_b, field_a]> x_a x_b) on a toy
    batch with real-valued features and more positions than fields."""
    from cleverrec_tpu.rating import FFM
    cfg = _cfg(libfm_dataset).with_overrides(recommender="FFM")
    rng = np.random.default_rng(7)
    n_feat, n_fields, n_pos, bsz, d = 12, 3, 5, 6, 4
    model = FFM(cfg, n_feat, n_fields)
    model.embed_size = d
    params = model.init(jax.random.PRNGKey(0))
    params["vif"] = jnp.asarray(
        rng.normal(size=params["vif"].shape).astype(np.float32))
    params["wi"] = jnp.asarray(
        rng.normal(size=params["wi"].shape).astype(np.float32))
    x_idx = jnp.asarray(rng.integers(0, n_feat, (bsz, n_pos)), jnp.int32)
    x_val = jnp.asarray(rng.normal(size=(bsz, n_pos)).astype(np.float32))

    # Reference: the literal pair loop the vectorized form replaced.
    wi = params["wi"][x_idx] * x_val
    v = params["vif"][x_idx]
    want = params["w0"] + jnp.sum(wi, axis=1)
    for a in range(n_pos):
        for b in range(a + 1, n_pos):
            fa = min(a, n_fields - 1)
            fb = min(b, n_fields - 1)
            inter = jnp.sum(v[:, a, fb, :] * v[:, b, fa, :], axis=1)
            want = want + inter * x_val[:, a] * x_val[:, b]

    got = model.predict(params, x_idx, x_val)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fm_convert_roundtrip(tmp_path):
    """fm_to_libfm analog: UIRT csv -> libFM files -> FM trains."""
    import pandas as pd
    from cleverrec_tpu.data.fm_convert import interactions_to_libfm
    from cleverrec_tpu.data.libfm import load_rating_data
    rng = np.random.default_rng(0)
    rows = []
    for u in range(25):
        for i in rng.choice(40, 10, replace=False):
            rows.append((u, i, float(rng.integers(1, 6))))
    df = pd.DataFrame(rows, columns=["u_id", "i_id", "rating"])
    ds = tmp_path / "conv"
    ds.mkdir()
    n_tr, n_t = interactions_to_libfm(df, str(ds / "conv.train.libfm"),
                                      str(ds / "conv.test.libfm"),
                                      test_size=0.2, seed=1)
    assert n_tr + n_t == len(df)
    cfg = _cfg(str(tmp_path)).with_overrides(**{"data.dataset": "conv"})
    data = load_rating_data(cfg)
    assert data.feature_nums == 25 + 40
    assert data.x_idx_tr.shape == (n_tr, 2)
    # Item feature ids are offset past the user block.
    assert data.x_idx_tr.max() < 65


def test_fm_mesh_matches_single_device(libfm_dataset):
    """FM under a ('data','model') mesh == unsharded numerics (VERDICT
    round-1 item 9: the rating pipeline gets the same mesh tier)."""
    import jax
    import numpy as np
    from cleverrec_tpu.parallel.mesh import make_mesh
    from cleverrec_tpu.rating import FM, FMTrainer

    cfg = _cfg(libfm_dataset).with_overrides(epoches="2")
    data = load_rating_data(cfg)
    mesh = make_mesh(4, 2)
    m = FM(cfg, data.feature_nums)
    t0 = FMTrainer(m, data, cfg)
    t1 = FMTrainer(m, data, cfg, mesh=mesh)
    b0 = t0.run()
    b1 = t1.run()
    assert b1["rmse"] == pytest.approx(b0["rmse"], rel=1e-4)
    assert b1["epoch"] == b0["epoch"]
    for l0, l1 in zip(jax.tree_util.tree_leaves(t0.params),
                      jax.tree_util.tree_leaves(t1.params)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   rtol=2e-4, atol=2e-5)
    # The feature tables are actually sharded on the mesh run.
    assert "model" in t1.params["vif"].sharding.spec


def test_convert_dataset_keeps_headerless_first_row(tmp_path):
    """A blanket header=0 silently dropped the first rating of headerless
    files like ml-100k's u.data."""
    from cleverrec_tpu.data.fm_convert import convert_dataset
    ds = tmp_path / "hx"
    ds.mkdir()
    rows = [f"{u}\t{i}\t{3 + (u + i) % 3}\t{1000 + u}"
            for u in range(30) for i in range(4)]
    (ds / "r.tsv").write_text("\n".join(rows) + "\n")
    train, test = convert_dataset(str(tmp_path), "hx", "r.tsv", "\t",
                                  test_size=0.25, seed=0)
    n = sum(1 for _ in open(train)) + sum(1 for _ in open(test))
    assert n == len(rows)
    # And WITH a header the header line must not become a data row.
    (ds / "h.csv").write_text("user_id,item_id,rating,time\n"
                              + "\n".join(r.replace("\t", ",")
                                          for r in rows) + "\n")
    train2, test2 = convert_dataset(str(tmp_path), "hx", "h.csv", ",",
                                    test_size=0.25, seed=0)
    n2 = sum(1 for _ in open(train2)) + sum(1 for _ in open(test2))
    assert n2 == len(rows)
