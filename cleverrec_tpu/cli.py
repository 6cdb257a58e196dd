"""CLI entry point — the ``python main.py`` equivalent.

The reference reads ./CleverRec.properties + conf/<Model>.properties with
no CLI arguments (main.py:16-25).  We keep that flow but add standard
flags: --config/--conf-dir/--model/--set key=value overrides.

Usage:
    cleverrec-tpu --config CleverRec.properties [--model BPR]
                  [--set lr=0.01 --set epoches=5]
"""

from __future__ import annotations

import argparse
import sys

from cleverrec_tpu.config import Config
from cleverrec_tpu.utils.logging import get_logger


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cleverrec-tpu",
        description="TPU-native recommender framework (CleverRec rebuild)")
    p.add_argument("--config", default="./CleverRec.properties",
                   help="global properties file ([default] section)")
    p.add_argument("--conf-dir", default=None,
                   help="per-model properties dir (default: config_dir key)")
    p.add_argument("--model", default=None,
                   help="override the recommender name")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   help="config override, repeatable")
    p.add_argument("--list-models", action="store_true")
    p.add_argument("--mesh", default=None, metavar="DxM",
                   help="device mesh shape, e.g. 4x2 = 4-way data x "
                        "2-way model parallel (default: single device)")
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() for multi-host "
                        "runs (env-configured coordinator)")
    p.add_argument("--export-serving", default=None, metavar="DIR",
                   help="after training, write a serving bundle "
                        "(retrieval + rerank jax.export artifacts + "
                        "meta.json) to DIR; serve.batch / serve.n_cand / "
                        "serve.backend config keys tune it")
    p.add_argument("--resume", default=None, metavar="CKPT",
                   help="resume from a train-state checkpoint directory")
    p.add_argument("--tune", action="store_true",
                   help="grid-search list-valued keys (embed_size/reg/"
                        "neg_ratio, the main_tuning.py axes) instead of a "
                        "single run")
    return p


def run_experiment(cfg: Config, logger=None, mesh_shape=None,
                   resume_from=None, export_serving=None):
    """Load data, build model + trainer, run the full loop."""
    import numpy as np

    from cleverrec_tpu.utils.logging import enable_compilation_cache
    enable_compilation_cache()

    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta

    logger = logger or get_logger(cfg.get("log.dir"), cfg.recommender)
    logger.info("=" * 80)
    logger.info("Current model: %s", cfg.recommender)

    mesh = None
    if mesh_shape:
        from cleverrec_tpu.parallel.mesh import make_mesh
        n_data, n_model = (int(x) for x in mesh_shape.lower().split("x"))
        mesh = make_mesh(n_data, n_model)
        logger.info("mesh: data=%d x model=%d", n_data, n_model)

    if cfg.model_type == "rating":
        from cleverrec_tpu.rating import run_rating
        return run_rating(cfg, logger, mesh=mesh)

    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.train import Trainer

    rng = np.random.default_rng(cfg.seed)
    data = load_ranking_data(cfg, rng=rng, logger=logger)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    trainer = Trainer(model, data, cfg, logger=logger, mesh=mesh)
    best = trainer.run(resume_from=resume_from)
    if export_serving:
        from cleverrec_tpu.serving import export_bundle
        manifest = export_bundle(
            model, trainer.params, trainer.arrays, trainer.dd,
            export_serving, batch=cfg.int("serve.batch", 256),
            n_cand=cfg.int("serve.n_cand", 128), k=cfg.topk[0],
            backend=cfg.str("serve.backend", "auto"))
        logger.info("serving bundle (%s backend) written to %s",
                    manifest["backend"], export_serving)
    return best


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.list_models:
        from cleverrec_tpu.models import available_models
        print("\n".join(available_models()))
        return 0
    overrides = {}
    if args.model:
        overrides["recommender"] = args.model
    for kv in args.set:
        if "=" not in kv:
            print(f"bad --set {kv!r} (want key=value)", file=sys.stderr)
            return 2
        k, v = kv.split("=", 1)
        overrides[k] = v
    if args.distributed:
        import jax
        jax.distributed.initialize()
    cfg = Config.from_properties(args.config, args.conf_dir, overrides)
    if args.tune:
        from cleverrec_tpu.tuning import run_grid
        logger = get_logger(cfg.get("log.dir"), cfg.recommender + "_tune")
        mesh = None
        if args.mesh:
            from cleverrec_tpu.parallel.mesh import make_mesh
            n_data, n_model = (int(x) for x in args.mesh.lower().split("x"))
            mesh = make_mesh(n_data, n_model)
        if args.resume or args.export_serving:
            logger.info("--resume/--export-serving are ignored with --tune")
        run_grid(cfg, logger=logger, mesh=mesh)
        return 0
    run_experiment(cfg, mesh_shape=args.mesh, resume_from=args.resume,
                   export_serving=args.export_serving)
    return 0


if __name__ == "__main__":
    sys.exit(main())
