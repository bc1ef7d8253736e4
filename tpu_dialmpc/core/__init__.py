from tpu_dialmpc.core import rotations, spline

__all__ = ["rotations", "spline"]
