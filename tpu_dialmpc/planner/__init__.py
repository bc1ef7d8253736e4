from tpu_dialmpc.planner.dial import DialConfig, MBDPI, ReverseInfo

__all__ = ["DialConfig", "MBDPI", "ReverseInfo"]
