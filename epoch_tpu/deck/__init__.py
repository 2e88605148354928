from .deck import DeckConfig, DeckParser, load_deck
from .expr import Expression, DeckExprError

__all__ = ["DeckConfig", "DeckParser", "load_deck", "Expression", "DeckExprError"]
