from .scalars import (
    address_bucket,
    epoch_seconds,
    normalize_address,
    scale_by_decimals,
)

__all__ = [
    "address_bucket",
    "epoch_seconds",
    "normalize_address",
    "scale_by_decimals",
]
