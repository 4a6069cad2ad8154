from stego_tpu.models.vit import (  # noqa: F401
    VIT_CONFIGS,
    ViTConfig,
    init_vit_params,
    vit_get_intermediate_feat,
)
from stego_tpu.models.featurizer import (  # noqa: F401
    DinoFeaturizer,
    init_featurizer_head,
)
from stego_tpu.models.probes import (  # noqa: F401
    cluster_lookup,
    init_cluster_probe,
    init_linear_probe,
    linear_probe_logits,
)
