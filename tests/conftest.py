"""Test environment: force an 8-device virtual CPU mesh.

Must run before jax initializes its backend: tests emulate multi-chip
sharding on CPU (the driver validates the real multi-chip path separately
via __graft_entry__.dryrun_multichip)."""

import os

# Force CPU: the container's sitecustomize imports jax and registers the
# axon TPU backend at interpreter startup, so flipping the env var is not
# enough — update jax.config before the first backend use.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_toy_interactions(path, n_users=30, n_items=40, n_rows=400, seed=0,
                          with_time=False):
    """Write a toy UI(R|T) csv and return its path."""
    r = np.random.default_rng(seed)
    u = r.integers(0, n_users, n_rows)
    i = r.integers(0, n_items, n_rows)
    lines = ["u_id,i_id,rating,time"]
    seen = set()
    t = 0
    for uu, ii in zip(u, i):
        if (uu, ii) in seen:
            continue
        seen.add((uu, ii))
        t += 1
        lines.append(f"{uu},{ii},{r.integers(1, 6)},{t}")
    path.write_text("\n".join(lines) + "\n")
    return len(seen)


@pytest.fixture
def toy_dataset(tmp_path):
    """A toy dataset directory layout matching the loader's expectations."""
    ds_dir = tmp_path / "toy"
    ds_dir.mkdir()
    n = make_toy_interactions(ds_dir / "ratings.csv")
    return {"root": str(tmp_path), "name": "toy", "rows": n}


@pytest.fixture
def toy_social_dataset(tmp_path):
    """Toy interactions + a trust graph (for SBPR/SAMN-family models)."""
    ds_dir = tmp_path / "toysoc"
    ds_dir.mkdir()
    n = make_toy_interactions(ds_dir / "ratings.csv", n_users=30, n_rows=500)
    r = np.random.default_rng(5)
    lines = ["u_id,v_id"]
    for u in range(30):
        for v in r.choice(30, size=r.integers(1, 5), replace=False):
            if v != u:
                lines.append(f"{u},{v}")
    (ds_dir / "trusts.csv").write_text("\n".join(lines) + "\n")
    return {"root": str(tmp_path), "name": "toysoc", "rows": n}


def base_config(toy, **overrides):
    from cleverrec_tpu.config import Config
    values = {
        "recommender": "BPR",
        "model_type": "ranking",
        "data.root_dir": toy["root"],
        "data.dataset": toy["name"],
        "data.file_name": "ratings.csv",
        "data.sep": ",",
        "data.format": "UIRT",
        "data.split_way": "loo",
        "data.split_ratio": "[0.7,0.2,0.1]",
        "data.split_by_time": "False",
        "data.user_min": "0",
        "data.item_min": "0",
        "test.neg_samples": "10",
        "test.batch_size": "16",
        "test.interval": "1",
        "topk": "[5,10]",
        "epoches": "2",
        "batch_size": "64",
        "embed_size": "16",
        "reg": "0.01",
        "lr": "0.01",
        "neg_ratio": "2",
        "optimizer": "Adam",
        "is_pairwise": "True",
        "loss_func": "bpr",
        "init_method": "normal",
        "stddev": "0.01",
        "seed": "7",
    }
    values.update(overrides)
    return Config(values)
