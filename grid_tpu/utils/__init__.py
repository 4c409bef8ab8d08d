from grid_tpu.utils.logging import log, progress_bar, make_console
from grid_tpu.utils.timing import StepTimer, step_timer

__all__ = ["log", "progress_bar", "make_console", "StepTimer", "step_timer"]
