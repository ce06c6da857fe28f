from graphphysics_tpu.models.processors import (
    EncodeProcessDecode,
    EncodeTransformDecode,
)
from graphphysics_tpu.models.simulator import Simulator, SimulatorConfig

__all__ = [
    "EncodeProcessDecode",
    "EncodeTransformDecode",
    "Simulator",
    "SimulatorConfig",
]
