from stego_tpu.ops.interp import interpolate, resize_nchw  # noqa: F401
from stego_tpu.ops.sampling import grid_sample, sample_from_coords  # noqa: F401
from stego_tpu.ops.math import (  # noqa: F401
    l2_normalize,
    one_hot_feats,
    super_perm,
    tensor_correlation,
)
