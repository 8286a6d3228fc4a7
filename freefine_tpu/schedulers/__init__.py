from freefine_tpu.schedulers.ddim import (  # noqa: F401
    DDIMSchedule,
    ctrl_step,
    inv_step,
    linear_context_guidance,
)
