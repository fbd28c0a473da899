from hashnerf_tpu.models.nerf import (
    NeRFSmallConfig,
    NeRFConfig,
    init_nerf_small,
    apply_nerf_small,
    init_nerf,
    apply_nerf,
    init_nerf_gradient,
    apply_nerf_gradient,
)
from hashnerf_tpu.models.factory import (
    ModelConfig,
    NGPState,
    create_model,
    make_encoders,
)
