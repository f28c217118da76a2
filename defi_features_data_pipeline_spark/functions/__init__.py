from .scalars import (
    address_bucket,
    clamp_health_factor,
    epoch_seconds,
    normalize_address,
    scale_by_decimals,
)

__all__ = [
    "address_bucket",
    "clamp_health_factor",
    "epoch_seconds",
    "normalize_address",
    "scale_by_decimals",
]
