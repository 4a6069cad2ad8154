#!/usr/bin/env python
"""Download pretrained models (parity with reference src/download_models.py).

Fetches the released STEGO checkpoints + baselines into
``{output_root}/saved_models`` and the DINO backbone weights the featurizer
needs. Requires network access; in air-gapped environments place the files
manually and pass their paths (``pretrained_weights=...`` / ``model_path=...``).
"""

import os
import sys
import urllib.request
from os.path import join

# reference src/download_models.py:7-18
SAVED_MODELS_BASE = "https://marhamilresearch4.blob.core.windows.net/stego-public/saved_models/"
SAVED_MODELS = [
    "moco_v2_800ep_pretrain.pth.tar",
    "picie_and_probes.pth",
    "cityscapes_vit_base_1.ckpt",
    "cocostuff27_vit_base_5.ckpt",
    "potsdam_test.ckpt",
]

# reference src/modules.py:35-44
DINO_BASE = "https://dl.fbaipublicfiles.com/dino/"
DINO_MODELS = [
    "dino_deitsmall16_pretrain/dino_deitsmall16_pretrain.pth",
    "dino_deitsmall8_300ep_pretrain/dino_deitsmall8_300ep_pretrain.pth",
    "dino_vitbase16_pretrain/dino_vitbase16_pretrain.pth",
    "dino_vitbase8_pretrain/dino_vitbase8_pretrain.pth",
]


def fetch(url: str, dest: str):
    if os.path.exists(dest):
        print("exists:", dest)
        return
    print("downloading", url, "->", dest)
    urllib.request.urlretrieve(url, dest)


def main():
    output_root = sys.argv[1] if len(sys.argv) > 1 else "."
    model_dir = join(output_root, "saved_models")
    os.makedirs(model_dir, exist_ok=True)
    for name in SAVED_MODELS:
        fetch(SAVED_MODELS_BASE + name, join(model_dir, name))
    for path in DINO_MODELS:
        fetch(DINO_BASE + path, join(model_dir, os.path.basename(path)))


if __name__ == "__main__":
    main()
