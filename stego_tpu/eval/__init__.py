from stego_tpu.eval.evaluate import (  # noqa: F401
    evaluate,
    load_model_for_eval,
    make_eval_step,
)
