from tpu_dialmpc.dynamics.model import PhysicsModel, compile_model

__all__ = ["PhysicsModel", "compile_model"]
