from fatezero_tpu.ptp.context import (  # noqa: F401
    AttnContext,
    NoopContext,
    StoreContext,
    EditContext,
    EditParams,
    STORE_KEYS,
    CROSS_KEYS,
    MAX_CONTROLLED_TOKENS,
)
