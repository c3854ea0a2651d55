from .prng import KeySeq, DEFAULT_SEED
from .precision import Precision, resolve_dtype

__all__ = ["KeySeq", "DEFAULT_SEED", "Precision", "resolve_dtype"]
