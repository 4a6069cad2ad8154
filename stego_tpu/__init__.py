"""stego_tpu: a TPU-native (JAX / XLA / Pallas) unsupervised semantic segmentation
framework with the capabilities of STEGO (ICLR 2022, arXiv:2203.08414).

Not a port: the compute path is pure JAX designed for XLA:TPU — NHWC layouts,
jit-compiled train/eval steps over a named device mesh, a fused Pallas kernel for
the feature-correspondence contrastive loss, and XLA collectives (psum/all_gather)
instead of NCCL.

Reference behavior parity is documented per-module with `file:line` citations into
the reference repo (see SURVEY.md).
"""

__version__ = "0.1.0"

from stego_tpu import config as config  # noqa: F401
