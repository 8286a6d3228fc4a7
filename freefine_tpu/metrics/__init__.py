from freefine_tpu.metrics.common import (  # noqa: F401
    frechet_distance,
    gaussian_stats,
    polynomial_mmd,
)
from freefine_tpu.metrics.wrap_error import wrap_error  # noqa: F401
