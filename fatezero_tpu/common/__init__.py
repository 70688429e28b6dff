from fatezero_tpu.common.config import (  # noqa: F401
    Config,
    load_config,
    instantiate_from_config,
    get_obj_from_str,
)
