from pivp_tpu.utils import checkpoint, logging_utils  # noqa: F401
