from .dsconv import fused_dsconv

__all__ = ["fused_dsconv"]
