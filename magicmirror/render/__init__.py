from .renderer import DiffRender
