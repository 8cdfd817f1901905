from .config import SolverConfig, default_chunk_size
from ._symcore_build import ensure_symcore

# Opportunistic build of the C++ symbolic core; call sites fall back to
# Python implementations when this fails (no compiler etc.).
ensure_symcore()

__all__ = ["SolverConfig", "default_chunk_size", "ensure_symcore"]
