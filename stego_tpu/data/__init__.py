from stego_tpu.data.colormaps import (  # noqa: F401
    create_cityscapes_colormap,
    create_pascal_label_colormap,
)
from stego_tpu.data.transforms import get_transform  # noqa: F401
from stego_tpu.data.contrastive import ContrastiveSegDataset  # noqa: F401
from stego_tpu.data.loader import DataLoader  # noqa: F401
