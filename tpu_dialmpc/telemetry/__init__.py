from tpu_dialmpc.telemetry.stream import TelemetryStream

__all__ = ["TelemetryStream"]
