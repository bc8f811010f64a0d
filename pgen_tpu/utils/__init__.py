from pgen_tpu.utils.log import get_logger
from pgen_tpu.utils.timer import StageTimer

__all__ = ["get_logger", "StageTimer"]
