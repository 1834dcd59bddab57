from pivp_tpu.models import heads, predictor  # noqa: F401
