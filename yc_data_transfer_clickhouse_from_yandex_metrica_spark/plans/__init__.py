from .alias import inline_aliases
from .totals import with_totals

__all__ = ["inline_aliases", "with_totals"]
