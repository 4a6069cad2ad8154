#!/usr/bin/env python
"""Download + unzip datasets (parity with reference src/download_datasets.py)."""

import os
import sys
import urllib.request
import zipfile
from os.path import join

# reference src/download_datasets.py:11-16
DATASET_BASE = "https://marhamilresearch4.blob.core.windows.net/stego-public/pytorch_data/"
DATASET_NAMES = ["potsdam", "cityscapes", "cocostuff", "potsdamraw"]


def main():
    pytorch_data_dir = sys.argv[1] if len(sys.argv) > 1 else "./data"
    os.makedirs(pytorch_data_dir, exist_ok=True)
    for name in DATASET_NAMES:
        zip_path = join(pytorch_data_dir, name + ".zip")
        if not os.path.exists(zip_path):
            url = DATASET_BASE + name + ".zip"
            print("downloading", url)
            urllib.request.urlretrieve(url, zip_path)
        print("unzipping", zip_path)
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(pytorch_data_dir)


if __name__ == "__main__":
    main()
