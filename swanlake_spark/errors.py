"""Engine exception taxonomy.

Mirrors the reference's gRPC status-code mapping
(``/root/reference/swanlake-core/src/service/mod.rs:84-121``):

- internal           → :class:`EngineError`
- invalid_argument   → :class:`InvalidArgument` (unknown handle/tx,
                        unsupported parameter, NULL bytes in SQL)
- failed_precondition→ :class:`FailedPrecondition` (transaction aborted)
- resource_exhausted → :class:`ResourceExhausted` (max sessions)
- not_found          → :class:`NotFound` (missing table/catalog)
"""


class EngineError(Exception):
    """Base error; maps to gRPC ``internal``."""

    code = "internal"


class InvalidArgument(EngineError):
    code = "invalid_argument"


class FailedPrecondition(EngineError):
    code = "failed_precondition"


class ResourceExhausted(EngineError):
    code = "resource_exhausted"


class NotFound(EngineError):
    code = "not_found"
