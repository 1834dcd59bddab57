from pivp_tpu.visualization import visualize  # noqa: F401
