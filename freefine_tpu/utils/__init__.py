from freefine_tpu.utils.vis import (  # noqa: F401
    SD15_LATENT_RGB_FACTORS,
    latent_to_preview,
    save_intermediate_gif,
)
from freefine_tpu.utils.profiling import StageTimer, trace  # noqa: F401
