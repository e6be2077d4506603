from visual_sgraphs_tpu.utils.events import EventLog
from visual_sgraphs_tpu.utils.timing import StageTimers

__all__ = ["EventLog", "StageTimers"]
