"""Device-error classification helpers."""
from __future__ import annotations

import jax


def is_device_oom(exc: BaseException) -> bool:
    """True when `exc` is an XLA out-of-memory failure.

    XLA surfaces HBM exhaustion as a runtime error whose status code is
    RESOURCE_EXHAUSTED; the code is only exposed through the message text, so
    the check is type-gated (jax.errors.JaxRuntimeError, the XlaRuntimeError
    alias) plus the status-code token — never a bare substring match on
    arbitrary exceptions.
    """
    return isinstance(exc, jax.errors.JaxRuntimeError) and (
        "RESOURCE_EXHAUSTED" in str(exc)
    )
