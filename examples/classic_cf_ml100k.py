"""Classic-CF comparison on ml-100k (the Basic/ scripts' metric family)."""

import os

import numpy as np
import pandas as pd

from cleverrec_tpu.classic import (InteractionData, ItemCF, LFM, MostPopular,
                                   PersonalRank, RandomModel, UserCF,
                                   evaluate_topn)

DATA_ROOT = os.environ.get("DATA_ROOT", "/root/reference/dataset")


def main():
    df = pd.read_csv(os.path.join(DATA_ROOT, "ml-100k/u.data"), sep="\t",
                     header=None, names=["u", "i", "r", "t"])
    u_map = {v: k for k, v in enumerate(sorted(df.u.unique()))}
    i_map = {v: k for k, v in enumerate(sorted(df.i.unique()))}
    pairs = np.column_stack([df.u.map(u_map), df.i.map(i_map)])
    data = InteractionData.random_split(pairs, len(u_map), len(i_map),
                                        test_size=0.125)
    models = [
        ("Random", RandomModel()),
        ("MostPopular", MostPopular()),
        ("UserCF(K=80)", UserCF(k=80)),
        ("ItemCF(K=10)", ItemCF(k=10)),
        ("LFM", LFM(factors=32, iters=30)),
        ("PersonalRank", PersonalRank(alpha=0.8)),
    ]
    print(f"{'model':>14} {'prec%':>7} {'recall%':>8} {'cover%':>7} {'pop':>6}")
    for name, m in models:
        met = evaluate_topn(m.fit(data), data, n=10)
        print(f"{name:>14} {met['precision']*100:7.2f} "
              f"{met['recall']*100:8.2f} {met['coverage']*100:7.1f} "
              f"{met['popularity']:6.3f}")


if __name__ == "__main__":
    main()
