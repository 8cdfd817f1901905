from .mesh import allocate_shared, make_mesh

__all__ = ["allocate_shared", "make_mesh"]
