from fatezero_tpu.ops.schedule import (  # noqa: F401
    DiffusionSchedule,
    make_schedule,
    ddim_timesteps,
    ddim_denoise_step,
    ddim_invert_step,
    add_noise,
    get_velocity,
    pred_original_sample,
)
