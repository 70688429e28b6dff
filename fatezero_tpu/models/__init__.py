from fatezero_tpu.models.unet3d import UNetPseudo3DConditionModel, UNet3DConfig  # noqa: F401
