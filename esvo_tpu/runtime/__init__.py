from esvo_tpu.runtime.config import SystemConfig, MappingConfig
from esvo_tpu.runtime.system import EsvoSystem, SystemStatus
from esvo_tpu.runtime.mvstereo import MVStereoSystem, MVStereoMode
from esvo_tpu.runtime.backend_loop import BackendLoop
from esvo_tpu.runtime.pose_graph_loop import PoseGraphLoop
from esvo_tpu.runtime.checkpoint import save_checkpoint, load_checkpoint

__all__ = ["SystemConfig", "MappingConfig", "EsvoSystem", "SystemStatus",
           "MVStereoSystem", "MVStereoMode", "BackendLoop", "PoseGraphLoop",
           "save_checkpoint", "load_checkpoint"]
