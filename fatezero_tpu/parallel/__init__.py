from fatezero_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    unet_param_specs,
    video_spec,
    shard_params,
)
