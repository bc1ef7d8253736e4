from tpu_dialmpc.envs.base import EnvState, StateInfo
from tpu_dialmpc.envs.go2 import UnitreeGo2Env, UnitreeGo2EnvConfig
from tpu_dialmpc.envs.h1 import UnitreeH1Env, UnitreeH1EnvConfig
from tpu_dialmpc.envs.registry import get_env, register_env

__all__ = [
    "EnvState",
    "StateInfo",
    "UnitreeGo2Env",
    "UnitreeGo2EnvConfig",
    "UnitreeH1Env",
    "UnitreeH1EnvConfig",
    "get_env",
    "register_env",
]
