from .checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
from .config import RenderSettings  # noqa: F401
from .profiling import FrameStats, frame_timer, sync, xla_trace  # noqa: F401
