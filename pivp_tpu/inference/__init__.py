from pivp_tpu.inference import predict  # noqa: F401
