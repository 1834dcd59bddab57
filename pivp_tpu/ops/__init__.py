from pivp_tpu.ops import convlstm, layers, metrics, sampling, transforms  # noqa: F401
