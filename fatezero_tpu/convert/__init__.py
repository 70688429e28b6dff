from fatezero_tpu.convert.torch_to_flax import (  # noqa: F401
    convert_unet_state,
    convert_vae_state,
    convert_clip_text_state,
    load_torch_state,
    merge_into_params,
)
