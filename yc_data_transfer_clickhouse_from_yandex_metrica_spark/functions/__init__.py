from . import ch

__all__ = ["ch"]
