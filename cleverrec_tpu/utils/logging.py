"""Logging + timing utilities (reference: utils/tools.py:18-48)."""

from __future__ import annotations

import contextlib
import logging
import os
import sys
import time


def get_logger(log_dir: str | None, model: str) -> logging.Logger:
    """File + stdout logger, one per model name."""
    logger = logging.getLogger(f"cleverrec_tpu.{model}")
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if logger.handlers:
        return logger
    fmt = logging.Formatter("%(asctime)s  %(message)s",
                            datefmt="%Y-%m-%d %H:%M:%S")
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_dir, f"{model}.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    ch = logging.StreamHandler(sys.stdout)
    ch.setFormatter(fmt)
    logger.addHandler(ch)
    return logger


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache — first compile of the scanned
    epoch programs is minutes over the remote-compile tunnel; cached
    reloads are seconds."""
    import jax

    path = path or os.path.join(os.path.expanduser("~"), ".cache",
                                "cleverrec_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass  # older jax without these flags


@contextlib.contextmanager
def timer(text: str, logger=None):
    emit = logger.info if logger else print
    t0 = time.time()
    emit(f"Start {text}...")
    yield
    emit(f"{text} done, time: {time.time() - t0:.2f}s")
