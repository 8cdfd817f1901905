from .config import SolverConfig, default_chunk_size

__all__ = ["SolverConfig", "default_chunk_size"]
