from pivp_tpu.training import loop  # noqa: F401
