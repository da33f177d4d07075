from esvo_tpu.runtime.config import SystemConfig, MappingConfig
from esvo_tpu.runtime.system import EsvoSystem, SystemStatus

__all__ = ["SystemConfig", "MappingConfig", "EsvoSystem", "SystemStatus"]
