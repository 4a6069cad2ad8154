from stego_tpu.train.segmenter import (  # noqa: F401
    UnsupervisedSegmenter,
    make_train_step,
    make_val_step,
)
