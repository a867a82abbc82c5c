from tpugan_tpu.utils.logging import MetricWriter, StepTimer

__all__ = ["MetricWriter", "StepTimer"]
