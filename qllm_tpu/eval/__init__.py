from .perplexity import Perplexity, perplexity_from_ids

__all__ = ["Perplexity", "perplexity_from_ids"]
