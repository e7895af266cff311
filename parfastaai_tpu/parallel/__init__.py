from .mesh import make_mesh, sharded_fused_aji

__all__ = ["make_mesh", "sharded_fused_aji"]
