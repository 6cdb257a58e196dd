"""Interaction-file -> libFM featurizer (the utils/fm_to_libfm.py analog).

The reference ships an offline ml-1m converter that one-hot encodes
(user, item) per rating into ``label,uidx:1,iidx:1`` lines with a 32-way
multiprocessing pool (utils/fm_to_libfm.py:82-85; its optional time /
last-movie features are commented out there, :57-73).  This version is a
single vectorized pass: dense-reindexed user ids first, item ids offset
by user_nums — the same feature-space layout the bundled
ml-1m.test.libfm uses.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def interactions_to_libfm(df: pd.DataFrame, out_train: str, out_test: str,
                          test_size: float = 0.2, seed: int = 0,
                          label_col: str = "rating") -> tuple[int, int]:
    """Write train/test libFM files from a (u_id, i_id, rating[, time])
    frame.  Returns (train_rows, test_rows)."""
    rng = np.random.default_rng(seed)
    u_map = {v: k for k, v in enumerate(np.sort(df["u_id"].unique()))}
    i_map = {v: k for k, v in enumerate(np.sort(df["i_id"].unique()))}
    n_users = len(u_map)
    u = df["u_id"].map(u_map).to_numpy()
    i = df["i_id"].map(i_map).to_numpy() + n_users
    y = df[label_col].to_numpy()

    perm = rng.permutation(len(df))
    n_test = int(round(test_size * len(df)))
    test_idx, train_idx = perm[:n_test], perm[n_test:]

    def write(path, sel):
        rows = np.char.add(
            np.char.add(y[sel].astype(str), ","),
            np.char.add(np.char.add(u[sel].astype(str), ":1,"),
                        np.char.add(i[sel].astype(str), ":1")))
        with open(path, "w") as f:
            f.write("\n".join(rows.tolist()))
            f.write("\n")

    os.makedirs(os.path.dirname(os.path.abspath(out_train)), exist_ok=True)
    write(out_train, train_idx)
    write(out_test, test_idx)
    return len(train_idx), len(test_idx)


def convert_dataset(root_dir: str, dataset: str, file_name: str, sep: str,
                    out_dir: str | None = None, test_size: float = 0.2,
                    seed: int = 0) -> tuple[str, str]:
    """CLI-friendly wrapper: reads a UIR(T) file and writes
    <dataset>.train.libfm / <dataset>.test.libfm next to it."""
    path = os.path.join(root_dir, dataset, file_name)
    with open(path) as f:
        first = f.readline().rstrip("\r\n")
        n_fields = len(f.readline().rstrip("\r\n").split(sep))

    def _numeric(line: str) -> bool:
        try:
            [float(x) for x in line.split(sep)[:2]]
            return True
        except ValueError:
            return False

    # Headerless files (e.g. ml-100k u.data) must keep their first row —
    # a blanket header=0 silently dropped one rating.
    header = None if _numeric(first) else 0
    names = ["u_id", "i_id", "rating", "time"][: max(min(n_fields, 4), 3)]
    df = pd.read_csv(path, sep=sep, header=header, names=names,
                     usecols=list(range(len(names))), engine="python")
    out_dir = out_dir or os.path.join(root_dir, dataset)
    out_train = os.path.join(out_dir, f"{dataset}.train.libfm")
    out_test = os.path.join(out_dir, f"{dataset}.test.libfm")
    interactions_to_libfm(df, out_train, out_test, test_size, seed)
    return out_train, out_test
