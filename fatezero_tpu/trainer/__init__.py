from fatezero_tpu.trainer.ddpm_trainer import DDPMTrainer, make_lr_schedule, trainable_mask  # noqa: F401
