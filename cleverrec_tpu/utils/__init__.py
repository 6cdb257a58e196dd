from cleverrec_tpu.utils.logging import get_logger, timer  # noqa: F401
