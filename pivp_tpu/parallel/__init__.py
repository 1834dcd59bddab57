from pivp_tpu.parallel import mesh, train_step  # noqa: F401
