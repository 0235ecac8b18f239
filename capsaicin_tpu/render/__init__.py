from .pipeline import FrameState, init_state, render_frame  # noqa: F401
from .session import RenderSession  # noqa: F401
from .settings import (  # noqa: F401
    OUTPUT_COMBINED,
    OUTPUT_DIRECT,
    OUTPUT_INDIRECT,
    OUTPUT_VARIANCE,
    RenderOptions,
    Settings,
    default_settings,
)
