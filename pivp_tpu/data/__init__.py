from pivp_tpu.data import dataset, synthetic  # noqa: F401
