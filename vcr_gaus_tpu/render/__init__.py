from .renderer import RenderConfig, render  # noqa: F401
