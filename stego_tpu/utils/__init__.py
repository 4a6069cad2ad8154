from stego_tpu.utils.metrics import UnsupervisedMetrics, update_conf_matrix  # noqa: F401
