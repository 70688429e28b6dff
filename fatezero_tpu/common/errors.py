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

    COMPILE-time HBM exhaustion is a second shape: the TPU compiler rejects a
    program whose buffer assignment cannot fit ("Ran out of memory in memory
    space hbm"), surfaced as an INTERNAL JaxRuntimeError (through the axon
    remote-compile relay the message is only the HTTP 500 wrapper, so the
    phrase check is a best effort — callers' proactive size gates remain the
    primary defense).
    """
    if not isinstance(exc, jax.errors.JaxRuntimeError):
        return False
    msg = str(exc)
    return (
        "RESOURCE_EXHAUSTED" in msg
        or "Ran out of memory in memory space" in msg
    )
