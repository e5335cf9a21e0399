"""Utilities: scaled products, decomposition re-indexing."""
from .safeprod import safeprod, safeprod_signed
from .circshift import circshift_psd, rev_alias

__all__ = ["safeprod", "safeprod_signed", "circshift_psd", "rev_alias"]
